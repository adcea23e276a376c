import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--quant",
        action="store_true",
        default=False,
        help="run qualitative rendering tests (writes wav + spectrogram"
        " grids to outputs/); mirrors the reference's --quant tier",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quant: qualitative (human-inspected) rendering tests"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--quant"):
        return
    skip = pytest.mark.skip(reason="needs --quant option")
    for item in items:
        if "quant" in item.keywords:
            item.add_marker(skip)

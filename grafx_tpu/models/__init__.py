"""Prebuilt graph models and the parameter-estimation training loop.

The reference ships no model zoo; its canonical usage (SURVEY.md §3.5,
reference: tests/graph/test_render.py:13-37 and the paper's music-mixing
experiments) is "build a console graph, then gradient-match a target
mix".  This package packages that workflow: graph factories for common
console topologies and :class:`GraphParameterOptimizer`, a jitted
optax-based fit loop.
"""

from grafx_tpu.models.console import (
    mastering_chain,
    mixing_console,
    simple_chain,
)
from grafx_tpu.models.optimize import GraphParameterOptimizer
from grafx_tpu.models.predictor import ParameterPredictor, audio_features

__all__ = [
    "GraphParameterOptimizer",
    "ParameterPredictor",
    "audio_features",
    "mastering_chain",
    "mixing_console",
    "simple_chain",
]

"""Drawing smoke test (reference: tests/graph/test_draw.py:7-12)."""

import matplotlib

matplotlib.use("Agg")

from grafx_tpu.data import GRAFX, NodeConfigs
from grafx_tpu.draw import draw_grafx


def _mix_graph():
    config = NodeConfigs(["eq", "comp", "reverb"])
    G = GRAFX(config=config)
    ends = []
    for chain in (["in", "eq", "comp"], ["in", "eq"], ["in", "reverb"]):
        _, last = G.add_serial_chain(chain)
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)
    return G


def test_draw_smoke(tmp_path):
    G = _mix_graph()
    fig, ax = draw_grafx(G)
    fig.savefig(tmp_path / "graph.pdf")


def test_draw_vertical_and_labels(tmp_path):
    G = _mix_graph()
    fig, ax = draw_grafx(G, vertical=True, node_inside="node_id")
    fig.savefig(tmp_path / "graph_v.pdf")

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


def test_positions_assigned_and_causal():
    """Layout: every node gets coordinates; x increases along edges."""
    from grafx_tpu.draw.position import compute_node_position

    G = _mix_graph()
    compute_node_position(G)
    for _, d in G.nodes(data=True):
        assert "x0" in d and "y0" in d
    for s, t in G.edges():
        assert G.nodes[s]["x0"] < G.nodes[t]["x0"]


def test_color_handler():
    from grafx_tpu.draw.style import NodeColorHandler

    h = NodeColorHandler(node_types=["in", "out", "mix", "eq", "comp"])
    assert h.get_facecolor("in") == "w"
    assert h.get_edgecolor("in") == "b"
    assert h.get_edgecolor("out") == "r"
    assert h.get_facecolor("eq") != h.get_facecolor("comp")
    custom = NodeColorHandler(facecolor_map={"eq": "#123456"})
    assert custom.get_colors("eq")["facecolor"] == "#123456"

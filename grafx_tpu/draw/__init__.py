"""Graph visualization (matplotlib, host-side)."""

from grafx_tpu.draw.edge import add_edge_curve, cubic_bezier, draw_edge
from grafx_tpu.draw.graph import draw_grafx, postprocess_figure
from grafx_tpu.draw.node import draw_node
from grafx_tpu.draw.position import (
    compute_node_position,
    compute_rank,
    estimate_chain,
)
from grafx_tpu.draw.style import NodeColorHandler

__all__ = [
    "NodeColorHandler",
    "add_edge_curve",
    "compute_node_position",
    "compute_rank",
    "cubic_bezier",
    "draw_edge",
    "draw_grafx",
    "draw_node",
    "estimate_chain",
    "postprocess_figure",
]

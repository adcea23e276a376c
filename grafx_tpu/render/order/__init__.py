"""Type-scheduling searches for the render order."""

from grafx_tpu.render.order.graph import (
    compute_render_order,
    reorder_for_fast_render,
)
from grafx_tpu.render.order.tensor import (
    beam_search,
    fixed_order_search,
    greedy_search,
    node_id_from_render_order,
    one_by_one_search,
)

__all__ = [
    "beam_search",
    "compute_render_order",
    "fixed_order_search",
    "greedy_search",
    "node_id_from_render_order",
    "one_by_one_search",
    "reorder_for_fast_render",
]

"""Render engine: scheduling, plan compilation, and the jitted executor."""

from grafx_tpu.render.fuse import FusedFIRChain, fuse_serial_fir
from grafx_tpu.render.graph import make_render_fn, render_grafx
from grafx_tpu.render.order import compute_render_order, reorder_for_fast_render
from grafx_tpu.render.prepare import RenderData, prepare_render
from grafx_tpu.render.streaming import StreamRenderer

__all__ = [
    "FusedFIRChain",
    "RenderData",
    "StreamRenderer",
    "compute_render_order",
    "fuse_serial_fir",
    "make_render_fn",
    "prepare_render",
    "render_grafx",
    "reorder_for_fast_render",
]

"""Graph visualization (matplotlib, host-side)."""

from grafx_tpu.draw.graph import draw_grafx

__all__ = ["draw_grafx"]

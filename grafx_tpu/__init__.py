"""GRAFX-TPU: a TPU-native differentiable audio-processing-graph framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GRAFX
(sh-lee97/grafx): audio processing graphs whose nodes are differentiable
audio processors and whose edges carry audio signals.  The three pillars:

1. a host-side **graph data layer** (``grafx_tpu.data``) — mutable typed
   DAGs that convert to an immutable numpy tensor form,
2. a **render engine** (``grafx_tpu.render``) — a type-batching scheduler
   whose output is a *static* render plan that unrolls into a single jitted
   XLA program, and
3. a **differentiable processor library** (``grafx_tpu.processors``) built
   on TPU-first DSP cores (``grafx_tpu.ops``): XLA FFT convolution, exact
   blocked-scan IIR (MXU), and ballistics smoothing (Pallas).

Everything is differentiable end-to-end with ``jax.grad``; graph parameters
are plain pytrees optimized with optax.
"""

from grafx_tpu import (
    checkpoint,
    data,
    draw,
    models,
    ops,
    parallel,
    processors,
    render,
    serving,
    utils,
)

__version__ = "0.2.0"

__all__ = [
    "checkpoint",
    "data",
    "draw",
    "models",
    "ops",
    "parallel",
    "processors",
    "render",
    "serving",
    "utils",
]

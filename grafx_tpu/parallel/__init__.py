"""Multi-chip parallelism helpers.

The reference is single-device (SURVEY.md §5: no distributed backend);
its "parallelism strategies" are intra-device batching levels.  On TPU
the natural scale-out is SPMD over a device mesh:

* **data axis**: graph-level / source-level batches shard over devices
  (each device renders whole graphs — no cross-device signal traffic),
* parameters are replicated; gradient reduction rides the ICI via the
  ``psum`` XLA inserts for the mean-loss.

Utilities here build meshes and shardings for the batched render.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="batch", devices=None):
    """A 1-D device mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name="batch"):
    """Sharding for a ``(B, |V_0|, C, L)`` batched input: shard ``B``."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    """Fully replicated sharding (parameters)."""
    return NamedSharding(mesh, P())


def node_sharding(mesh, axis_name="batch"):
    """Sharding for ``(|V_0|, C, L)`` inputs / the signal buffer: shard
    the node axis.  The analog of tensor parallelism for audio graphs —
    each stage's node batch splits across devices and XLA inserts
    collectives where edges cross shards (e.g. at ``mix`` fan-ins).
    Useful for very large graphs; for batched workloads prefer
    :func:`batch_sharding` (no signal traffic at all)."""
    return NamedSharding(mesh, P(axis_name))


def shard_render_step(render_fn, mesh, axis_name="batch"):
    """Wrap a batched render/loss step so inputs shard over the mesh data
    axis and parameters replicate.

    Args:
        render_fn: ``f(input_signals, params) -> scalar-or-pytree``; the
            input's dim 0 is the graph/source batch.
        mesh: a :class:`jax.sharding.Mesh`.

    Returns:
        A jitted function with sharding constraints applied.
    """
    in_shard = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
    return jax.jit(render_fn, in_shardings=(in_shard, rep), out_shardings=rep)


__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "batch_sharding",
    "make_mesh",
    "node_sharding",
    "replicated",
    "shard_render_step",
]

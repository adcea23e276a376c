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


def make_mesh_2d(n_data, n_node, devices=None):
    """A 2-D ``(data, node)`` mesh: graph batches shard over ``data``
    while each stage's node batch additionally splits over ``node`` —
    combined data + tensor(graph) parallelism."""
    if devices is None:
        devices = jax.devices()[: n_data * n_node]
    return Mesh(np.array(devices).reshape(n_data, n_node), ("data", "node"))


def batch_node_sharding(mesh):
    """Sharding for ``(B, |V_0|, C, L)`` on a 2-D mesh: ``B`` over the
    ``data`` axis and the node axis over ``node``."""
    return NamedSharding(mesh, P("data", "node"))


def time_sharding(mesh, axis_name="batch", ndim=3):
    """Shard the trailing time axis (sequence parallelism).

    Elementwise/nonlinear paths stay fully local; FFT convolutions and
    sequential recursions need the whole sequence, so XLA inserts
    all-gathers around them (and Pallas kernels are opaque to GSPMD and
    get gathered inputs).  Only worth it for extremely long signals on
    graphs dominated by elementwise work — prefer
    :func:`batch_sharding` / :func:`node_sharding` otherwise
    (SURVEY.md §5: shard over the node-batch axis, not time).
    """
    spec = [None] * (ndim - 1) + [axis_name]
    return NamedSharding(mesh, P(*spec))


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
    "batch_node_sharding",
    "batch_sharding",
    "make_mesh",
    "make_mesh_2d",
    "node_sharding",
    "replicated",
    "shard_render_step",
    "time_sharding",
]

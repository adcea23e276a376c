"""Functional signal-buffer operations for the render executor.

TPU-first re-design of the reference's in-place buffer ops
(reference: src/grafx/render/core.py:6-140).  The buffer is a functional
``jnp`` array: writes are ``.at[...].set`` updates whose static indices
let XLA lower them to in-place dynamic-update-slices inside one fused
program — no O(stages) copies, no autograd bookkeeping (``jax.grad``
re-traverses the traced graph).
"""

import jax.numpy as jnp


def create_signal_buffer(method, num_buffers, input_signals):
    """Allocate the signal buffer with input rows filled
    (reference: core.py:6-33).

    For ``"one-by-one"`` the buffer is a ragged Python list instead.
    """
    if method == "one-by-one":
        nones = [None] * (num_buffers - input_signals.shape[0])
        return [x[None] for x in input_signals] + nones

    if input_signals.ndim == 3:
        num_sources, channels, audio_len = input_signals.shape
        buf = jnp.zeros(
            (num_buffers, channels, audio_len), dtype=input_signals.dtype
        )
        return buf.at[:num_sources].set(input_signals)
    if input_signals.ndim == 4:
        batch, num_sources, channels, audio_len = input_signals.shape
        buf = jnp.zeros(
            (batch, num_buffers, channels, audio_len), dtype=input_signals.dtype
        )
        return buf.at[:, :num_sources].set(input_signals)
    raise ValueError(f"input_signals must be 3- or 4-dim, got {input_signals.ndim}")


def read_tensor(x, access, dim=0):
    """Read rows of a tensor along ``dim`` per a static access pattern."""
    if access.method == "slice":
        lo, hi = access.idx
        index = (slice(None),) * dim + (slice(lo, hi),)
        return x[index]
    if access.method == "index":
        return jnp.take(x, jnp.array(access.idx), axis=dim)
    raise ValueError(f"Unavailable read method: {access.method}")


def read_tensor_or_tensor_dict(x, access, dim=0, postprocess=None):
    """Recursively read a tensor or nested dict of tensors
    (reference: core.py:53-77)."""
    if isinstance(x, dict):
        return {
            k: read_tensor_or_tensor_dict(v, access, dim=dim, postprocess=postprocess)
            for k, v in x.items()
        }
    if isinstance(x, list):  # one-by-one ragged buffer
        if access.method == "slice":
            rows = x[access.idx[0] : access.idx[1]]
        else:
            rows = [x[i] for i in access.idx]
        return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    y = read_tensor(x, access, dim=dim)
    return postprocess(y) if postprocess is not None else y


def write_tensor(method, buf, y, access, dim=0):
    """Functionally write rows into the buffer; returns the new buffer."""
    if access.method == "none":
        return buf  # e.g. MIMO "out" nodes own no buffer rows
    if method == "one-by-one":
        buf[access.idx[0]] = y
        return buf
    if access.method == "slice":
        lo, hi = access.idx
        index = (slice(None),) * dim + (slice(lo, hi),)
    elif access.method == "index":
        index = (slice(None),) * dim + (jnp.array(access.idx),)
    else:
        raise ValueError(f"Unavailable write method: {access.method}")
    return buf.at[index].set(y)


def aggregate_tensor(x, aggregation, dim=0):
    """Fan-in aggregation (reference: core.py:101-112): ``sum`` collapses
    all rows into one, ``scatter`` segment-sums rows into stage-node
    positions.

    TPU note: scatters serialize on TPU, and after
    ``reorder_for_fast_render`` the scatter indices are almost always
    sorted — each destination node's fan-in is a contiguous run of
    rows.  Sorted scatters therefore lower to a handful of static
    slice-sums (fully fusable); only genuinely unsorted fan-ins fall
    back to ``.at[].add``."""
    if aggregation.method == "none":
        return x
    if aggregation.method == "sum":
        return jnp.sum(x, axis=dim, keepdims=True)
    if aggregation.method == "scatter":
        idx = list(aggregation.idx)
        if all(b >= a for a, b in zip(idx, idx[1:])):
            # sorted: segment s occupies rows [lo, hi) of x
            parts = []
            pos = 0
            shape = list(x.shape)
            for seg in range(aggregation.num_segments):
                lo = pos
                while pos < len(idx) and idx[pos] == seg:
                    pos += 1
                if pos == lo:  # empty segment
                    shape[dim] = 1
                    parts.append(jnp.zeros(shape, dtype=x.dtype))
                else:
                    sl = (slice(None),) * dim + (slice(lo, pos),)
                    parts.append(jnp.sum(x[sl], axis=dim, keepdims=True))
            return jnp.concatenate(parts, axis=dim)
        shape = list(x.shape)
        shape[dim] = aggregation.num_segments
        index = (slice(None),) * dim + (jnp.array(aggregation.idx),)
        return jnp.zeros(shape, dtype=x.dtype).at[index].add(x)
    raise ValueError(f"Unavailable aggregation method: {aggregation.method}")


def expand_tensor_or_tensor_dict(x, expand, dim=0):
    """Broadcast a new batch axis of size ``expand`` at ``dim``
    (reference: core.py:115-134)."""
    if isinstance(x, dict):
        return {k: expand_tensor_or_tensor_dict(v, expand, dim) for k, v in x.items()}
    x = jnp.expand_dims(x, dim)
    sizes = list(x.shape)
    sizes[dim] = expand
    return jnp.broadcast_to(x, sizes)


def flatten_batch_and_node(x):
    """Merge leading (batch, node) dims (reference: core.py:138-140)."""
    return x.reshape((-1,) + x.shape[2:])

"""Pallas TPU kernel for the ballistics forward recursion.

The recursion ``y[n] = y[n-1] + c[n] (u[n] - y[n-1])`` with a per-sample
coefficient choice cannot be parallelized over time, so it runs
sequentially on-chip with channels across the 128 vector lanes and time
across sublanes.

Layout matters enormously here: a 3D ``(time, 1, 128)`` block pads every
time step to a full (8, 128) register tile (measured ~200 ns/sample).
This kernel is strictly 2D — ``u`` viewed as ``(L, 128)`` per lane-group,
grid ``(lane_groups, time_chunks)`` — and walks aligned ``(8, 128)``
sublane tiles with a statically unrolled inner loop, keeping the
recursion near the VPU issue rate.

This replaces torchcomp's CUDA/Numba recursion (the reference's backend,
src/grafx/processors/core/envelope.py:63-101).  The backward pass is a
parallel associative scan in plain JAX (see grafx_tpu/ops/ballistics.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 32


def _kernel(zi_ref, at_ref, rt_ref, u_ref, y_ref, state, *, chunk):
    @pl.when(pl.program_id(1) == 0)
    def _():
        state[:] = zi_ref[:]

    at = at_ref[:]  # (1, LANES)
    rt = rt_ref[:]

    def body(j, st):
        tile = u_ref[pl.ds(j * TILE, TILE), :]  # (TILE, LANES), one reg tile
        rows = []
        for k in range(TILE):
            row = tile[k : k + 1, :]
            c = jnp.where(row > st, at, rt)
            st = st + c * (row - st)
            rows.append(st)
        y_ref[pl.ds(j * TILE, TILE), :] = jnp.concatenate(rows, axis=0)
        return st

    st = jax.lax.fori_loop(0, chunk // TILE, body, state[:])
    state[:] = st


def _bwd_kernel(a_ref, g_ref, gh_ref, state, *, chunk):
    @pl.when(pl.program_id(1) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def body(j, st):
        # walk tiles back-to-front; rows within a tile back-to-front
        base = chunk - (j + 1) * TILE
        a_tile = a_ref[pl.ds(base, TILE), :]
        g_tile = g_ref[pl.ds(base, TILE), :]
        rows = []
        for k in range(TILE - 1, -1, -1):
            st = g_tile[k : k + 1, :] + a_tile[k : k + 1, :] * st
            rows.append(st)
        gh_ref[pl.ds(base, TILE), :] = jnp.concatenate(rows[::-1], axis=0)
        return st

    st = jax.lax.fori_loop(0, chunk // TILE, body, state[:])
    state[:] = st


def reverse_scan_pallas_tm(a_t, g_t, chunk: int = 2048):
    """Time-major reverse recurrence ``gh[n] = g[n] + a[n] * gh[n+1]``
    (with ``gh[end] = 0``) on an already-padded ``(Lp, Np)`` layout.

    The walk starts at the last row; callers padding real length-``L``
    data at the END must zero the pad rows of both ``a_t`` and ``g_t``
    so the state entering the real tail is exactly 0.
    """
    Lp, Np = a_t.shape
    S = Np // LANES
    grid = (S, Lp // chunk)
    spec = pl.BlockSpec(
        (chunk, LANES),
        lambda s, i: (pl.num_programs(1) - 1 - i, s),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Lp, Np), a_t.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANES), a_t.dtype)],
    )(a_t, g_t)


def reverse_scan_pallas(a, g, chunk: int = 2048):
    """Reverse first-order recurrence ``gh[n] = g[n] + a[n] * gh[n+1]``
    (with ``gh[L] = 0``) — the ballistics adjoint — as a sequential Pallas
    kernel (same 2D layout as the forward; beats the log-depth
    associative scan's multi-pass memory traffic).

    Args:
        a, g: ``(N, L)``.
    """
    N, L = a.shape
    S = -(-N // LANES)
    Np = S * LANES
    Lp = -(-L // chunk) * chunk

    # pad at the END with a = 0, g = 0: the reverse walk crosses the pad
    # first and enters the real tail with state exactly 0
    at_ = jnp.zeros((Lp, Np), a.dtype).at[:L, :N].set(a.T)
    gt_ = jnp.zeros((Lp, Np), g.dtype).at[:L, :N].set(g.T)
    gh = reverse_scan_pallas_tm(at_, gt_, chunk=chunk)
    return gh[:L, :N].T


def pad_time_major(x, chunk: int = 2048):
    """``(N, L)`` -> end-padded time-major ``(Lp, Np)`` kernel layout."""
    N, L = x.shape
    S = -(-N // LANES)
    Np = S * LANES
    Lp = -(-L // chunk) * chunk
    return jnp.zeros((Lp, Np), x.dtype).at[:L, :N].set(x.T)


def expand_lanes(v, S):
    """``(N,)`` -> zero-padded ``(S, LANES)`` per-lane constants."""
    Np = S * LANES
    return jnp.zeros((Np,), v.dtype).at[: v.shape[0]].set(v).reshape(S, LANES)


def forward_pallas_tm(ut, zi2, at2, rt2, chunk: int = 2048):
    """Ballistics forward on the padded time-major layout.

    Args:
        ut: ``(Lp, Np)`` inputs from :func:`pad_time_major`.
        zi2, at2, rt2: ``(S, LANES)`` per-lane constants.

    Returns:
        ``(Lp, Np)`` smoothed outputs (same layout).
    """
    Lp, Np = ut.shape
    S = Np // LANES
    grid = (S, Lp // chunk)
    lane_spec = pl.BlockSpec(
        (1, LANES), lambda s, i: (s, 0), memory_space=pltpu.VMEM
    )
    data_spec = pl.BlockSpec(
        (chunk, LANES), lambda s, i: (i, s), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[lane_spec, lane_spec, lane_spec, data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((Lp, Np), ut.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANES), ut.dtype)],
    )(zi2, at2, rt2, ut)


def forward_pallas(u, zi, at, rt, chunk: int = 2048):
    """Ballistics forward on TPU.

    Args:
        u: ``(N, L)`` inputs.
        zi, at, rt: ``(N,)`` initial state / attack / release factors.

    Returns:
        ``(N, L)`` smoothed outputs.
    """
    N, L = u.shape
    S = -(-N // LANES)
    ut = pad_time_major(u, chunk)
    y = forward_pallas_tm(
        ut, expand_lanes(zi, S), expand_lanes(at, S), expand_lanes(rt, S),
        chunk=chunk,
    )
    return y[:L, :N].T

"""Pallas TPU kernel for the ballistics forward recursion.

The recursion ``y[n] = y[n-1] + c[n] (u[n] - y[n-1])`` with a per-sample
coefficient choice cannot be parallelized over time, so we run it
sequentially on-chip with the channel batch laid out across vector lanes
and sublanes: ``u`` is viewed as ``(L, S, 128)`` (S sublane groups of 128
channels) and the TPU grid walks time chunks in order while a VMEM scratch
buffer carries the filter state between chunks.

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


def _kernel(zi_ref, at_ref, rt_ref, u_ref, y_ref, state, *, chunk):
    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = zi_ref[:]

    def body(i, _):
        row = u_ref[i]
        st = state[:]
        c = jnp.where(row > st, at_ref[:], rt_ref[:])
        new = st + c * (row - st)
        state[:] = new
        y_ref[i] = new
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def forward_pallas(u, zi, at, rt, chunk: int = 512):
    """Ballistics forward on TPU.

    Args:
        u: ``(N, L)`` inputs.
        zi, at, rt: ``(N,)`` initial state / attack / release factors.

    Returns:
        ``(N, L)`` smoothed outputs.
    """
    N, L = u.shape
    S = -(-N // LANES)
    Np = S * LANES
    Lp = -(-L // chunk) * chunk

    ut = jnp.zeros((Lp, Np), u.dtype).at[:L, :N].set(u.T)
    ut = ut.reshape(Lp, S, LANES)

    def expand(v):
        return jnp.zeros((Np,), v.dtype).at[:N].set(v).reshape(S, LANES)

    zi2, at2, rt2 = expand(zi), expand(at), expand(rt)

    grid = (Lp // chunk,)
    y = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (chunk, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Lp, S, LANES), u.dtype),
        scratch_shapes=[pltpu.VMEM((S, LANES), u.dtype)],
    )(zi2, at2, rt2, ut)

    y = y.reshape(Lp, Np)[:L, :N]
    return y.T

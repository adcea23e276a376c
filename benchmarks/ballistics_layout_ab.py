"""A/B: ballistics kernel fed by XLA transposes vs in-kernel transposes.

The fused compressor kernels run in a padded time-major (Lp, Np) layout;
the console's compressor stages pay ~4 full-array XLA transposes per
step to get in and out of it (round-2 ablation: ~2.4 ms of 6.8).  This
experiment feeds the kernel NATURAL-layout (Np, Lp) blocks and
transposes (LANES, chunk) tiles inside the kernel (VMEM vector
transposes), eliminating the HBM transpose round-trips.

Usage: python benchmarks/ballistics_layout_ab.py [interpret]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grafx_tpu.ops.ballistics_tpu import (
    LANES,
    TILE,
    expand_lanes,
    forward_pallas_tm,
    pad_time_major,
)
from grafx_tpu.utils import enable_compilation_cache

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"


def _kernel_nat(zi_ref, at_ref, rt_ref, u_ref, y_ref, state, *, chunk):
    """Forward recursion reading/writing NATURAL (lane-major) blocks:
    u block is (LANES, chunk); transpose to (chunk, LANES) in VMEM,
    run the time walk, transpose the result back."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        state[:] = zi_ref[0:1, :]

    at = at_ref[0:1, :]
    rt = rt_ref[0:1, :]
    oma = 1.0 - at
    omr = 1.0 - rt

    TT = 128  # lane-aligned square tiles for the in-kernel transpose

    def body(j, st):
        tile = u_ref[:, pl.ds(j * TT, TT)].T  # (TT, LANES) in VMEM
        au = at * tile
        ru = rt * tile
        rows = []
        for k in range(TT):
            row = tile[k : k + 1, :]
            st_a = oma * st + au[k : k + 1, :]
            st_r = omr * st + ru[k : k + 1, :]
            st = jnp.where(row > st, st_a, st_r)
            rows.append(st)
        block = jnp.concatenate(rows, axis=0)  # (TT, LANES)
        y_ref[:, pl.ds(j * TT, TT)] = block.T
        return st

    st = jax.lax.fori_loop(0, chunk // TT, body, state[:])
    state[:] = st


def forward_pallas_natural(u_nat, zi2, at2, rt2, chunk=2048):
    """u_nat: (Np, Lp) natural layout, padded."""
    Np, Lp = u_nat.shape
    S = -(-Np // LANES)
    grid = (S, Lp // chunk)
    lane_spec = pl.BlockSpec((8, LANES), lambda s, i: (s, 0),
                             memory_space=pltpu.VMEM)
    nat_spec = pl.BlockSpec((LANES, chunk), lambda s, i: (s, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_nat, chunk=chunk),
        grid=grid,
        in_specs=[lane_spec, lane_spec, lane_spec, nat_spec],
        out_specs=nat_spec,
        out_shape=jax.ShapeDtypeStruct((Np, Lp), u_nat.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANES), u_nat.dtype)],
        interpret=INTERPRET,
    )(zi2, at2, rt2, u_nat)


def run_tm(u, zi, at, rt):
    N, L = u.shape
    S = -(-N // LANES)
    ut = pad_time_major(u)
    y = forward_pallas_tm(
        ut, expand_lanes(zi, S), expand_lanes(at, S), expand_lanes(rt, S),
        interpret=INTERPRET,
    )
    return y[:L, :N].T


def run_nat(u, zi, at, rt, chunk=2048):
    N, L = u.shape
    S = -(-N // LANES)
    Np, Lp = S * LANES, -(-L // chunk) * chunk
    u_nat = jnp.pad(u, ((0, Np - N), (0, Lp - L)))
    y = forward_pallas_natural(
        u_nat, expand_lanes(zi, S), expand_lanes(at, S), expand_lanes(rt, S),
        chunk=chunk,
    )
    return y[:N, :L]


def main():
    enable_compilation_cache()
    N, L = 68, 2**13 if INTERPRET else 2**17
    u = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (N, L)))
    zi = jnp.ones(N)
    at = jnp.full((N,), 0.1)
    rt = jnp.full((N,), 0.01)

    y_tm = run_tm(u, zi, at, rt)
    y_nat = run_nat(u, zi, at, rt)
    err = float(jnp.abs(y_tm - y_nat).max())
    print("max abs diff tm vs natural:", err)
    assert err < 2e-5

    if INTERPRET:
        print("interpret-mode correctness OK")
        return

    for name, fn in (("time-major + XLA transposes", run_tm),
                     ("natural + in-kernel transpose", run_nat)):
        f = jax.jit(lambda u, k, fn=fn: fn(u * (1.0 + 1e-6 * k), zi, at, rt))
        y = f(u, 0.0)
        jax.block_until_ready(y)
        t0 = time.time()
        iters = 50
        for i in range(iters):
            y = f(u, float(i + 1))
        jax.block_until_ready(y)
        print(f"{name:36s} {(time.time() - t0) / iters * 1000:7.3f} ms")


if __name__ == "__main__":
    main()

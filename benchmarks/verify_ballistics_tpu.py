"""Verify the Pallas ballistics kernels against the scan path ON TPU,
then microbenchmark them.

The pytest suite runs on a forced-CPU mesh (tests/conftest.py), so the
Pallas path is exercised here on the real chip: forward values and all
four gradients must match the ``lax.scan`` reference within float32
tolerance.

Usage: python benchmarks/verify_ballistics_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # repeat on-chip runs compile ~14x faster
from grafx_tpu.ops import ballistics
from grafx_tpu.ops.ballistics import ballistics_core


def run_case(N, L, seed):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(np.abs(rng.randn(N, L)).astype(np.float32))
    zi = jnp.asarray(np.abs(rng.randn(N)).astype(np.float32))
    at = jnp.asarray(rng.uniform(0.05, 0.9, N).astype(np.float32))
    rt = jnp.asarray(rng.uniform(0.001, 0.3, N).astype(np.float32))
    w = jnp.asarray(rng.randn(N, L).astype(np.float32))

    def loss(u, zi, at, rt):
        return jnp.sum(ballistics_core(u, zi, at, rt) * w)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

    ballistics.set_backend("pallas")
    y_p = jax.jit(ballistics_core)(u, zi, at, rt)
    v_p, g_p = grad_fn(u, zi, at, rt)
    jax.block_until_ready((y_p, v_p, g_p))

    ballistics.set_backend("scan")
    y_s = jax.jit(ballistics_core)(u, zi, at, rt)
    v_s, g_s = grad_fn(u, zi, at, rt)
    jax.block_until_ready((y_s, v_s, g_s))
    ballistics.set_backend(None)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

    names = ["du", "dzi", "dat", "drt"]
    errs = {"y": rel(y_p, y_s)}
    for n, a, b in zip(names, g_p, g_s):
        errs[n] = rel(a, b)
    print(f"N={N:4d} L={L:7d}  " + "  ".join(f"{k}={v:.2e}" for k, v in errs.items()))
    tol = {"y": 2e-5, "du": 1e-4, "dzi": 1e-3, "dat": 2e-3, "drt": 2e-3}
    for k, v in errs.items():
        assert v < tol[k], f"{k} rel err {v} exceeds {tol[k]} (N={N}, L={L})"


def microbench(N, L, iters=30):
    rng = np.random.RandomState(0)
    u = jnp.asarray(np.abs(rng.randn(N, L)).astype(np.float32))
    zi = jnp.ones((N,), jnp.float32)
    at = jnp.full((N,), 0.3, jnp.float32)
    rt = jnp.full((N,), 0.01, jnp.float32)
    w = jnp.asarray(rng.randn(N, L).astype(np.float32))

    ballistics.set_backend("pallas")

    @jax.jit
    def fwd(s, u):
        return ballistics_core(u * s, zi, at, rt)

    @jax.jit
    def fwdbwd(s, u):
        return jax.grad(
            lambda u_: jnp.sum(ballistics_core(u_, zi, at, rt) * w)
        )(u * s)

    for name, fn in [("fwd", fwd), ("fwd+bwd", fwdbwd)]:
        scales = [jnp.float32(1.0 + i * 1e-6) for i in range(iters + 1)]
        jax.block_until_ready(fn(scales[0], u))
        t0 = time.time()
        for s in scales[1:]:
            out = fn(s, u)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(
            f"  {name:8s} N={N:4d} L={L}: {dt * 1e3:7.3f} ms"
            f"  ({dt / L * 1e9:6.2f} ns/sample)"
        )
    ballistics.set_backend(None)


def run_fused_gain_case(N, L, seed, kind):
    """ballistics_gain_core (fused Pallas) vs the composed scan+knee
    reference, values and all 7 gradients, on-device."""
    from grafx_tpu.ops.ballistics import ballistics_gain_core

    rng = np.random.RandomState(seed)
    u = jnp.asarray(np.abs(rng.randn(N, L)).astype(np.float32))
    zi = jnp.asarray(np.abs(rng.randn(N)).astype(np.float32))
    at = jnp.asarray(rng.uniform(0.05, 0.9, N).astype(np.float32))
    rt = jnp.asarray(rng.uniform(0.001, 0.3, N).astype(np.float32))
    th = jnp.asarray(rng.uniform(-3.0, 0.0, N).astype(np.float32))
    cf = jnp.asarray(
        rng.uniform(-0.9, -0.2, N).astype(np.float32)
        if kind == "compressor"
        else rng.uniform(0.5, 3.0, N).astype(np.float32)
    )
    hk = jnp.asarray(rng.uniform(0.1, 1.0, N).astype(np.float32))
    w = jnp.asarray(rng.randn(N, L).astype(np.float32))

    def composed(u, zi, at, rt, th, cf, hk):
        from grafx_tpu.ops.ballistics import _forward_scan

        y = _forward_scan(u, zi, at, rt)
        x = jnp.log(y + 1e-5) - th[:, None]
        hk_ = hk[:, None]
        if kind == "compressor":
            mid = jnp.square(x + hk_) / (4.0 * hk_)
            f = jnp.where(x > hk_, x, jnp.where(x < -hk_, 0.0, mid))
        else:
            mid = -jnp.square(x - hk_) / (4.0 * hk_)
            f = jnp.where(x < -hk_, x, jnp.where(x > hk_, 0.0, mid))
        return jnp.exp(cf[:, None] * f)

    args = (u, zi, at, rt, th, cf, hk)

    def loss_fused(*a):
        return jnp.sum(ballistics_gain_core(*a, kind) * w)

    def loss_ref(*a):
        return jnp.sum(composed(*a) * w)

    g_f = jax.jit(jax.grad(loss_fused, argnums=tuple(range(7))))(*args)
    v_f = jax.jit(lambda *a: ballistics_gain_core(*a, kind))(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))(*args)
    v_r = jax.jit(composed)(*args)
    jax.block_until_ready((g_f, v_f, g_r, v_r))

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

    errs = {"gain": rel(v_f, v_r)}
    for n, a, b in zip(["du", "dzi", "dat", "drt", "dth", "dcf", "dhk"], g_f, g_r):
        errs[n] = rel(a, b)
    print(
        f"fused-{kind:10s} N={N:3d} L={L:7d}  "
        + "  ".join(f"{k}={v:.1e}" for k, v in errs.items())
    )
    for k, v in errs.items():
        assert v < 5e-3, f"fused {kind} {k} rel err {v} (N={N}, L={L})"


def run_pair_case(N, L, seed, onepole_a=False):
    """ballistics_gain_pair_core (one fused walk) vs the composed
    two-stage scan reference, values and all 11 gradients, on-device.

    ``onepole_a=True`` exercises the inits=(0.0, 1.0) variant: stage A
    becomes the exact one-pole special case (``at == rt == 1 - alpha``,
    zero initial state) that a ``NoiseGate(energy_smoother="iir_exact")``
    member maps onto in render/fuse.py's dynamics family."""
    from grafx_tpu.ops.ballistics import (
        _forward_scan,
        ballistics_gain_pair_core,
    )

    rng = np.random.RandomState(seed)
    u = jnp.asarray(np.abs(rng.randn(N, L)).astype(np.float32))
    w = jnp.asarray(rng.randn(N, L).astype(np.float32))

    def consts(kind, off):
        at = jnp.asarray(rng.uniform(0.05, 0.9, N).astype(np.float32))
        rt = jnp.asarray(rng.uniform(0.001, 0.3, N).astype(np.float32))
        th = jnp.asarray(rng.uniform(-3.0, 0.0, N).astype(np.float32))
        cf = jnp.asarray(
            rng.uniform(-0.9, -0.2, N).astype(np.float32)
            if kind == "compressor"
            else rng.uniform(0.5, 3.0, N).astype(np.float32)
        )
        hk = jnp.asarray(rng.uniform(0.1, 1.0, N).astype(np.float32))
        return at, rt, th, cf, hk

    kinds = ("noisegate", "compressor")
    ca = consts(kinds[0], 0)
    cb = consts(kinds[1], 5)
    inits = (1.0, 1.0)
    if onepole_a:
        oma = jnp.asarray(rng.uniform(0.02, 0.5, N).astype(np.float32))
        ca = (oma, oma) + ca[2:]
        inits = (0.0, 1.0)

    def stage(u, at, rt, th, cf, hk, kind, init):
        y = _forward_scan(u, jnp.full(N, init, u.dtype), at, rt)
        x = jnp.log(y + 1e-5) - th[:, None]
        hk_ = hk[:, None]
        if kind == "compressor":
            mid = jnp.square(x + hk_) / (4.0 * hk_)
            f = jnp.where(x > hk_, x, jnp.where(x < -hk_, 0.0, mid))
        else:
            mid = -jnp.square(x - hk_) / (4.0 * hk_)
            f = jnp.where(x < -hk_, x, jnp.where(x > hk_, 0.0, mid))
        return jnp.exp(cf[:, None] * f)

    def composed(u, *c):
        ga = stage(u, *c[:5], kinds[0], inits[0])
        gb = stage(ga * ga * u, *c[5:], kinds[1], inits[1])
        return ga * gb

    args = (u,) + ca + cb

    def loss_pair(*a):
        return jnp.sum(ballistics_gain_pair_core(*a, kinds, inits) * w)

    def loss_ref(*a):
        return jnp.sum(composed(*a) * w)

    v_f = jax.jit(lambda *a: ballistics_gain_pair_core(*a, kinds, inits))(*args)
    g_f = jax.jit(jax.grad(loss_pair, argnums=tuple(range(11))))(*args)
    v_r = jax.jit(composed)(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(11))))(*args)
    jax.block_until_ready((v_f, g_f, v_r, g_r))

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

    names = ["du", "dat_a", "drt_a", "dth_a", "dcf_a", "dhk_a",
             "dat_b", "drt_b", "dth_b", "dcf_b", "dhk_b"]
    errs = {"gain": rel(v_f, v_r)}
    for n, a, b in zip(names, g_f, g_r):
        errs[n] = rel(a, b)
    def rel_l2(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)

    tag = "pair1p" if onepole_a else "pair  "
    print(
        f"{tag} N={N:3d} L={L:7d}  "
        + "  ".join(f"{k}={v:.1e}" for k, v in errs.items())
        + f"  du_l2={rel_l2(g_f[0], g_r[0]):.1e}"
    )
    for k, v in errs.items():
        if onepole_a and k == "du":
            # The zero-init one-pole gate drives the early envelope into
            # the steep region of log(v + 1e-5), so isolated knee/branch
            # decisions flip between any two f32 evaluation orders and
            # the POINTWISE du disagrees O(1e-2) at ~70 of 2.2M samples.
            # benchmarks/diag_pair_onepole.py shows BOTH f32 forms sit
            # ~8e-2 maxrel from the f64 oracle at the same flip samples
            # (the kernel marginally closer: relL2 1.88e-3 vs 1.905e-3),
            # i.e. this is composition conditioning, not kernel error —
            # so du gates on relative L2 (observed 3.2e-4) + a loose
            # pointwise bound.
            assert v < 5e-2, f"pair1p du maxrel {v} (N={N}, L={L})"
            l2 = rel_l2(g_f[0], g_r[0])
            assert l2 < 2e-3, f"pair1p du rel-L2 {l2} (N={N}, L={L})"
        else:
            assert v < 5e-3, f"pair {k} rel err {v} (N={N}, L={L})"


def microbench_pair(N, L, iters=30):
    """Pair kernel vs two back-to-back fused-gain kernels, grad step."""
    from grafx_tpu.ops.ballistics import (
        ballistics_gain_core,
        ballistics_gain_pair_core,
    )

    rng = np.random.RandomState(0)
    u = jnp.asarray(np.abs(rng.randn(N, L)).astype(np.float32))
    w = jnp.asarray(rng.randn(N, L).astype(np.float32))
    kinds = ("noisegate", "compressor")
    ones = jnp.ones((N,), jnp.float32)
    at_a = jnp.full((N,), 0.3, jnp.float32)
    rt_a = jnp.full((N,), 0.01, jnp.float32)
    th_a = jnp.full((N,), -2.0, jnp.float32)
    cf_a = jnp.full((N,), 1.5, jnp.float32)
    hk_a = jnp.full((N,), 0.5, jnp.float32)
    at_b, rt_b = at_a, rt_a
    th_b = jnp.full((N,), -1.0, jnp.float32)
    cf_b = jnp.full((N,), -0.5, jnp.float32)
    hk_b = hk_a

    @jax.jit
    def pair(s, u):
        return jax.grad(
            lambda u_: jnp.sum(
                ballistics_gain_pair_core(
                    u_, at_a, rt_a, th_a, cf_a, hk_a,
                    at_b, rt_b, th_b, cf_b, hk_b, kinds,
                ) * w
            )
        )(u * s)

    @jax.jit
    def two_stage(s, u):
        def f(u_):
            ga = ballistics_gain_core(
                u_, ones, at_a, rt_a, th_a, cf_a, hk_a, kinds[0]
            )
            gb = ballistics_gain_core(
                ga * ga * u_, ones, at_b, rt_b, th_b, cf_b, hk_b, kinds[1]
            )
            return jnp.sum(ga * gb * w)

        return jax.grad(f)(u * s)

    for name, fn in [("pair fwd+bwd", pair), ("2-stage fwd+bwd", two_stage)]:
        scales = [jnp.float32(1.0 + i * 1e-6) for i in range(iters + 1)]
        jax.block_until_ready(fn(scales[0], u))
        t0 = time.time()
        for s in scales[1:]:
            out = fn(s, u)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(
            f"  {name:16s} N={N:4d} L={L}: {dt * 1e3:7.3f} ms"
            f"  ({dt / L * 1e9:6.2f} ns/sample)"
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    print("-- parity (pallas vs scan, on-device) --")
    run_case(3, 400, 0)
    run_case(17, 2**17, 1)
    run_case(68, 2**17, 2)
    run_case(130, 5000, 3)  # > 128 lanes -> two lane groups
    print("-- fused gain (pallas vs composed scan+knee, on-device) --")
    run_fused_gain_case(17, 2**17, 5, "compressor")
    run_fused_gain_case(68, 2**17, 6, "noisegate")
    print("-- fused pair (pallas vs composed two-stage scan, on-device) --")
    run_pair_case(17, 2**17, 7)
    run_pair_case(68, 2**17, 8)
    run_pair_case(17, 2**17, 9, onepole_a=True)  # iir_exact-gate mapping
    print("-- pair vs two-stage microbenchmark --")
    for N in (8, 17, 68):
        microbench_pair(N, 2**17)
    print("-- microbenchmark (pallas) --")
    for N in (17, 68):
        microbench(N, 2**17)
    print("OK")

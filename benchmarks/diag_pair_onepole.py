"""Diagnose the on-chip pair1p du disagreement (kernel vs composed scan)
by comparing BOTH against a float64 CPU oracle of the same composition.

Prints max-relative du error of (a) the Pallas pair kernel on TPU and
(b) the composed f32 scan autodiff on TPU, each vs the f64 oracle, plus
the location/magnitude of the worst disagreement.
"""

import subprocess
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

if "--oracle" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

N, L, SEED = 17, 2**17, 9


def consts_like_verify(rng, N):
    """Replicates benchmarks/verify_ballistics_tpu.py run_pair_case
    draws (seed 9, onepole_a=True)."""
    u = np.abs(rng.randn(N, L)).astype(np.float32)
    w = rng.randn(N, L).astype(np.float32)

    def consts(kind):
        at = rng.uniform(0.05, 0.9, N).astype(np.float32)
        rt = rng.uniform(0.001, 0.3, N).astype(np.float32)
        th = rng.uniform(-3.0, 0.0, N).astype(np.float32)
        cf = (
            rng.uniform(-0.9, -0.2, N).astype(np.float32)
            if kind == "compressor"
            else rng.uniform(0.5, 3.0, N).astype(np.float32)
        )
        hk = rng.uniform(0.1, 1.0, N).astype(np.float32)
        return at, rt, th, cf, hk

    ca = consts("noisegate")
    cb = consts("compressor")
    oma = rng.uniform(0.02, 0.5, N).astype(np.float32)
    ca = (oma, oma) + ca[2:]
    return u, w, ca, cb


def composed(u, ca, cb, dtype):
    """Two-stage composition, init (0, 1), pure jnp (backend-agnostic)."""

    def stage(u, at, rt, th, cf, hk, kind, init):
        def step(v, e):
            coef = jnp.where(e > v, at, rt)
            v = v + coef * (e - v)
            return v, v

        _, y = jax.lax.scan(step, jnp.full(u.shape[0], init, dtype), u.T)
        y = y.T
        x = jnp.log(y + 1e-5) - th[:, None]
        hk_ = hk[:, None]
        if kind == "compressor":
            mid = jnp.square(x + hk_) / (4.0 * hk_)
            f = jnp.where(x > hk_, x, jnp.where(x < -hk_, 0.0, mid))
        else:
            mid = -jnp.square(x - hk_) / (4.0 * hk_)
            f = jnp.where(x < -hk_, x, jnp.where(x > hk_, 0.0, mid))
        return jnp.exp(cf[:, None] * f)

    ga = stage(u, *ca, "noisegate", 0.0)
    gb = stage(ga * ga * u, *cb, "compressor", 1.0)
    return ga * gb


def oracle_main():
    """CPU + x64 subprocess: write the f64 du oracle to /tmp."""
    rng = np.random.RandomState(SEED)
    u_np, w_np, ca_np, cb_np = consts_like_verify(rng, N)
    u64 = jnp.asarray(u_np, jnp.float64)
    w64 = jnp.asarray(w_np, jnp.float64)
    ca64 = tuple(jnp.asarray(c, jnp.float64) for c in ca_np)
    cb64 = tuple(jnp.asarray(c, jnp.float64) for c in cb_np)

    def loss64(u):
        return jnp.sum(composed(u, ca64, cb64, jnp.float64) * w64)

    du = np.asarray(jax.jit(jax.grad(loss64))(u64))
    np.savez("/tmp/pair_onepole_oracle.npz", du=du)
    print("oracle written, dtype", du.dtype)


def main():
    subprocess.run(
        [sys.executable, __file__, "--oracle"], check=True, cwd="."
    )
    du_oracle = np.load("/tmp/pair_onepole_oracle.npz")["du"]

    rng = np.random.RandomState(SEED)
    u_np, w_np, ca_np, cb_np = consts_like_verify(rng, N)

    # ---- f32 composed autodiff on default backend (TPU) ---------------------
    u32 = jnp.asarray(u_np)
    w32 = jnp.asarray(w_np)
    ca32 = tuple(jnp.asarray(c) for c in ca_np)
    cb32 = tuple(jnp.asarray(c) for c in cb_np)

    def loss32(u):
        return jnp.sum(composed(u, ca32, cb32, jnp.float32) * w32)

    du_scan = np.asarray(jax.jit(jax.grad(loss32))(u32))

    # ---- Pallas pair kernel on default backend (TPU) ------------------------
    from grafx_tpu.ops.ballistics import ballistics_gain_pair_core

    def loss_k(u):
        return jnp.sum(
            ballistics_gain_pair_core(
                u, *ca32, *cb32, ("noisegate", "compressor"), (0.0, 1.0)
            )
            * w32
        )

    du_kern = np.asarray(jax.jit(jax.grad(loss_k))(u32))

    scale = np.abs(du_oracle).max()

    def report(name, du):
        err = np.abs(du.astype(np.float64) - du_oracle)
        rel_l2 = np.linalg.norm(err) / np.linalg.norm(du_oracle)
        n_bad = int((err > 1e-3 * scale).sum())
        i = np.unravel_index(err.argmax(), err.shape)
        print(
            f"{name:14s} maxrel={err.max() / scale:.3e} relL2={rel_l2:.3e} "
            f"n>1e-3={n_bad}/{err.size} "
            f"at n={i[0]} t={i[1]}  got={du[i]:+.6e} oracle={du_oracle[i]:+.6e}"
        )
        return err

    print("backend:", jax.default_backend(), " |du| scale:", scale)
    report("scan f32", du_scan)
    report("kernel", du_kern)
    err_mutual = np.abs(du_kern.astype(np.float64) - du_scan)
    rel_l2 = np.linalg.norm(err_mutual) / np.linalg.norm(du_oracle)
    i = np.unravel_index(err_mutual.argmax(), err_mutual.shape)
    print(
        f"{'mutual':14s} maxrel={err_mutual.max() / scale:.3e} "
        f"relL2={rel_l2:.3e} "
        f"at n={i[0]} t={i[1]}  kern={du_kern[i]:+.6e} scan={du_scan[i]:+.6e}"
        f" oracle={du_oracle[i]:+.6e}"
    )


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        oracle_main()
    else:
        main()

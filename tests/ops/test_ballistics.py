import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.ops import ballistics_core


def naive_ballistics(u, zi, at, rt):
    n, L = u.shape
    y = np.zeros_like(u)
    for i in range(n):
        prev = zi[i]
        for t in range(L):
            c = at[i] if u[i, t] > prev else rt[i]
            prev = prev + c * (u[i, t] - prev)
            y[i, t] = prev
    return y


def test_forward_matches_naive():
    rng = np.random.RandomState(0)
    u = np.abs(rng.randn(3, 400)).astype(np.float32)
    zi = np.ones(3, dtype=np.float32)
    at = np.array([0.5, 0.9, 0.1], dtype=np.float32)
    rt = np.array([0.05, 0.01, 0.3], dtype=np.float32)
    y = ballistics_core(jnp.array(u), jnp.array(zi), jnp.array(at), jnp.array(rt))
    ref = naive_ballistics(u, zi, at, rt)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_gradients_match_finite_differences():
    rng = np.random.RandomState(1)
    u = np.abs(rng.randn(2, 64)).astype(np.float64)
    zi = np.ones(2)
    at = np.array([0.6, 0.3])
    rt = np.array([0.05, 0.2])
    w = rng.randn(2, 64)

    def loss_np(u_, zi_, at_, rt_):
        return float((naive_ballistics(u_, zi_, at_, rt_) * w).sum())

    def loss_jax(u_, zi_, at_, rt_):
        return jnp.sum(
            ballistics_core(u_, zi_, at_, rt_) * jnp.array(w, dtype=jnp.float32)
        )

    args = (
        jnp.array(u, dtype=jnp.float32),
        jnp.array(zi, dtype=jnp.float32),
        jnp.array(at, dtype=jnp.float32),
        jnp.array(rt, dtype=jnp.float32),
    )
    grads = jax.grad(loss_jax, argnums=(0, 1, 2, 3))(*args)

    eps = 1e-5
    # du at a few positions
    for (i, t) in [(0, 0), (0, 10), (1, 63)]:
        up, um = u.copy(), u.copy()
        up[i, t] += eps
        um[i, t] -= eps
        fd = (loss_np(up, zi, at, rt) - loss_np(um, zi, at, rt)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[0])[i, t], fd, rtol=1e-2, atol=1e-4)

    # dat, drt
    for idx, (name, vec) in enumerate([("at", at), ("rt", rt)], start=2):
        for i in range(2):
            vp, vm = vec.copy(), vec.copy()
            vp[i] += eps
            vm[i] -= eps
            a_p = (at, rt)
            if name == "at":
                fd = (loss_np(u, zi, vp, rt) - loss_np(u, zi, vm, rt)) / (2 * eps)
            else:
                fd = (loss_np(u, zi, at, vp) - loss_np(u, zi, at, vm)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(grads[idx])[i], fd, rtol=2e-2, atol=1e-3
            )


def test_jit_and_vmap():
    rng = np.random.RandomState(2)
    u = jnp.array(np.abs(rng.randn(4, 128)).astype(np.float32))
    zi = jnp.ones(4)
    at = jnp.full((4,), 0.4)
    rt = jnp.full((4,), 0.02)
    y1 = ballistics_core(u, zi, at, rt)
    y2 = jax.jit(ballistics_core)(u, zi, at, rt)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)

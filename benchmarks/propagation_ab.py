"""A/B the cross-block state propagation formulations (VERDICT r2 #5).

The exact-IIR cascade propagates an S-dim state across NB blocks:
``s[k] = A s[k-1] + s_in[k]`` with per-item constant ``A``.  Today this
is prefix doubling (log2(NB) rounds of batched einsums, custom VJP).
Hypothesis to test: the rounds are latency/HBM-bound and a sequential
formulation could win.  Shapes from the 100-node console at batch 4:
geq (N=88, S=48) and eq (N=152, S=12), NB=1024.

Honest protocol: varied inputs each step, fwd+grad, block_until_ready.

Usage: python benchmarks/propagation_ab.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.ops.iir import _propagate_states
from grafx_tpu.utils import enable_compilation_cache


def prop_doubling(s_in, A):
    return _propagate_states(s_in, A)


def prop_scan(s_in, A):
    """Sequential lax.scan over blocks (matvec per step)."""

    def step(s, v):
        s = jnp.einsum("nij,nj->ni", A, s) + v
        return s, s

    N, NB, S = s_in.shape
    _, out = jax.lax.scan(step, jnp.zeros((N, S), s_in.dtype),
                          jnp.swapaxes(s_in, 0, 1))
    return jnp.swapaxes(out, 0, 1)


def prop_assoc(s_in, A):
    """Generic associative scan over (M, v) pairs (materializes NB
    copies of the matrix — the formulation the doubling replaced)."""
    N, NB, S = s_in.shape
    M = jnp.broadcast_to(A[:, None], (N, NB, S, S))

    def combine(first, second):
        M1, v1 = first
        M2, v2 = second
        return (
            jnp.einsum("nbij,nbjk->nbik", M2, M1),
            jnp.einsum("nbij,nbj->nbi", M2, v1) + v2,
        )

    _, out = jax.lax.associative_scan(combine, (M, s_in), axis=1)
    return out


def timeit(name, fn, N, S, NB=1024, iters=30):
    A = 0.9 * jax.random.orthogonal(jax.random.PRNGKey(0), S, shape=(N,))

    @jax.jit
    def step(v, k):
        vk = v * (1.0 + 1e-6 * k)
        loss, g = jax.value_and_grad(
            lambda v: jnp.mean(fn(v, A) ** 2)
        )(vk)
        return loss, v - 1e-3 * g

    v = jax.random.normal(jax.random.PRNGKey(1), (N, NB, S))
    loss, v = step(v, 0.0)
    jax.block_until_ready(v)
    t0 = time.time()
    for i in range(iters):
        loss, v = step(v, float(i + 1))
    jax.block_until_ready(v)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:32s} N={N:4d} S={S:3d}: {dt:7.3f} ms/step")
    return dt


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    for N, S, tag in ((88, 48, "geq-like"), (152, 12, "eq-like")):
        print(f"-- {tag} --")
        timeit("doubling (current)", prop_doubling, N, S)
        timeit("sequential lax.scan", prop_scan, N, S)
        timeit("associative_scan (M,v)", prop_assoc, N, S)


if __name__ == "__main__":
    main()

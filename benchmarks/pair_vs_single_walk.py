"""Device-time microbench: pair walk vs single walk at bus-stage shapes.

Question (round 5): ``dynamics_pad`` pads EVERY lone dynamics node into
the two-recursion pair composite — including nodes that can never
co-schedule with a genuine pair (the headline's two bus compressors,
which depend on every source chain through the mix).  For those nodes
padding buys no stage merge; it just swaps a single-recursion serial
walk for the pair walk.  This measures the fwd+bwd device-time delta
between ``ballistics_gain_core`` and ``ballistics_gain_pair_core`` at
the bus-stage shape (N=8 rows incl. graph batch, L=2^17) to decide
whether scope-aware padding is worth building.

Run: python benchmarks/pair_vs_single_walk.py [N] [L]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.ops.ballistics import (
    ballistics_gain_core,
    ballistics_gain_pair_core,
)
from grafx_tpu.profiling import device_time_ms
from grafx_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2**17
    key = jax.random.PRNGKey(0)
    u = jnp.square(jax.random.normal(key, (N, L)))
    w = jax.random.normal(jax.random.PRNGKey(1), (N, L))

    at = jnp.full((N,), 0.05)
    rt = jnp.full((N,), 0.005)
    th = jnp.full((N,), -3.0)
    cf = jnp.full((N,), -0.5)
    hk = jnp.full((N,), 3.0)
    zi = jnp.ones((N,))

    def loss_single(u, at, rt, th, cf, hk):
        return jnp.sum(ballistics_gain_core(u, zi, at, rt, th, cf, hk,
                                            "compressor") * w)

    def loss_pair(u, at, rt, th, cf, hk):
        return jnp.sum(
            ballistics_gain_pair_core(
                u, at, rt, th, jnp.zeros_like(cf), hk,
                at, rt, th, cf, hk,
                ("noisegate", "compressor"), (1.0, 1.0),
            ) * w
        )

    steps = 5
    for name, loss in (("single", loss_single), ("pair", loss_pair)):
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        # compile + warmup, varied inputs defeat tunnel caching
        val, grads = g(u, at, rt, th, cf, hk)
        jax.block_until_ready(grads)

        us = [u * (1.0 + 0.01 * i) for i in range(steps)]

        def run():
            out = None
            for i in range(steps):
                out = g(us[i], at, rt, th, cf, hk)
            jax.block_until_ready(out)

        dev_ms = device_time_ms(run) / steps
        print(
            f"{name}: fwd+bwd device {dev_ms:.3f} ms/step "
            f"({dev_ms / L * 1e6:.2f} ns/sample) at N={N} L={L}"
        )


if __name__ == "__main__":
    main()

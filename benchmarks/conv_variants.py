"""A/B the convolution formulations on the config-2 shapes (real TPU).

Honest protocol per MEMORY: varied inputs every step (the tunnel caches
identical calls), fwd+grad, block_until_ready, >=20 iters.

Usage: python benchmarks/conv_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.ops.fftconv import (
    fft_convolve,
    fft_convolve_os,
    fft_convolve_upols,
)
from grafx_tpu.utils import enable_compilation_cache

B, C, L = 16, 2, 5 * 44100


def timeit(name, make_loss, h_shape, iters=20):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, L))

    @jax.jit
    def step(h, k):
        xk = x * (1.0 + 1e-6 * k)  # varied input, defeats call caching
        loss, g = jax.value_and_grad(make_loss)(h, xk)
        return loss, h - 1e-3 * g

    h = jax.random.normal(jax.random.PRNGKey(1), h_shape) * 0.01
    loss, h = step(h, 0.0)
    jax.block_until_ready(h)
    t0 = time.time()
    for i in range(iters):
        loss, h = step(h, float(i + 1))
    jax.block_until_ready(h)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms/step")
    return dt


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())

    # --- short zerophase FIR (the zpeq conv: L_h = 2047) ---
    Lh = 2047

    def loss_big(h, xk):
        return jnp.mean(fft_convolve(xk, h, mode="zerophase") ** 2)

    def loss_os(block):
        def f(h, xk):
            return jnp.mean(
                fft_convolve_os(xk, h, mode="zerophase", block=block) ** 2
            )

        return f

    timeit("zpeq conv: one big FFT (2^18)", loss_big, (B, C, Lh))
    for blk in (2048, 4096, 8192, 16384, 32768):
        timeit(f"zpeq conv: overlap-save block {blk}", loss_os(blk), (B, C, Lh))

    # --- long causal reverb IR (L_h = 60000) ---
    Lh = 60000

    def loss_big_c(h, xk):
        return jnp.mean(fft_convolve(xk, h, mode="causal") ** 2)

    def loss_os_c(block):
        def f(h, xk):
            return jnp.mean(
                fft_convolve_os(xk, h, mode="causal", block=block) ** 2
            )

        return f

    timeit("reverb conv: one big FFT (2^19)", loss_big_c, (B, C, Lh))
    for blk in (65536, 131072):
        timeit(
            f"reverb conv: overlap-save block {blk}", loss_os_c(blk), (B, C, Lh)
        )

    def loss_up(part):
        def f(h, xk):
            return jnp.mean(
                fft_convolve_upols(xk, h, mode="causal", part=part) ** 2
            )

        return f

    for part in (4096, 8192, 16384):
        timeit(
            f"reverb conv: UPOLS part {part}", loss_up(part), (B, C, Lh)
        )


if __name__ == "__main__":
    main()

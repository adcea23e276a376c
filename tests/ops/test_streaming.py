"""Block-wise streaming parity: streamed output must equal the one-shot
computation to float round-off.

Streaming is beyond the reference (it has no streaming mode); the exact
state threading these tests gate is what makes the low-latency renderer
(grafx_tpu.render.streaming) possible — see SURVEY.md §5 long-sequence
mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.ops.ballistics import ballistics_core
from grafx_tpu.ops.fftconv import (
    conv_stream_zero_tail,
    fft_convolve,
    fft_convolve_stream,
)
from grafx_tpu.ops.iir import (
    biquad_exact,
    biquad_exact_apply,
    biquad_exact_build,
    biquad_exact_zero_state,
    onepole_exact,
)


def random_stable_biquads(rng, N, K, r_hi=0.99):
    r = rng.uniform(0.2, r_hi, (N, K))
    th = rng.uniform(0.02, np.pi - 0.02, (N, K))
    a1 = -2 * r * np.cos(th)
    a2 = r**2
    As = np.stack([np.ones_like(a1), a1, a2], -1)
    Bs = rng.randn(N, K, 3)
    return jnp.asarray(Bs, jnp.float32), jnp.asarray(As, jnp.float32)


@pytest.mark.parametrize("h_len,block", [(64, 256), (500, 256), (2000, 512)])
def test_fft_convolve_stream_matches_causal(h_len, block):
    """OLA streaming == one-shot causal conv, including tails longer
    than the block."""
    rng = np.random.RandomState(0)
    L = block * 6
    x = jnp.asarray(rng.randn(3, 2, L), jnp.float32)
    h = jnp.asarray(rng.randn(3, 2, h_len), jnp.float32)
    ref = fft_convolve(x, h, mode="causal")

    tail = conv_stream_zero_tail((3, 2), h_len)
    outs = []
    for k in range(L // block):
        y, tail = fft_convolve_stream(x[..., k * block : (k + 1) * block], h, tail)
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=2e-4
    )


@pytest.mark.parametrize("K", [1, 2, 6, 24])
def test_biquad_exact_stream_matches_full(K):
    """State-threaded blocked cascade == one-shot exact filter (both
    cache layouts: per-stage K<=2 and single-pass cascade K>2)."""
    rng = np.random.RandomState(1)
    N, L, T = 4, 4096, 128
    Bs, As = random_stable_biquads(rng, N, K)
    x = jnp.asarray(rng.randn(N, L), jnp.float32)
    ref = biquad_exact(x, Bs, As, block_size=T)

    cache = biquad_exact_build(Bs, As, block_size=T)
    state = biquad_exact_zero_state(cache, N)
    block = 512
    outs = []
    for k in range(L // block):
        y, state = biquad_exact_apply(
            x[:, k * block : (k + 1) * block],
            cache,
            block_size=T,
            state_in=state,
            return_state=True,
        )
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=-1)
    err = np.abs(np.asarray(streamed) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max() + 1e-9
    assert err / scale < 1e-4, f"relative error {err / scale:.2e}"


def test_biquad_exact_stream_rejects_partial_blocks():
    rng = np.random.RandomState(2)
    Bs, As = random_stable_biquads(rng, 2, 4)
    cache = biquad_exact_build(Bs, As, block_size=128)
    state = biquad_exact_zero_state(cache, 2)
    with pytest.raises(ValueError, match="multiple"):
        biquad_exact_apply(
            jnp.zeros((2, 100)), cache, block_size=128,
            state_in=state, return_state=True,
        )


def test_onepole_exact_stream_matches_full():
    rng = np.random.RandomState(3)
    N, L = 5, 4096
    alpha = jnp.asarray(rng.uniform(0.3, 0.999, N), jnp.float32)
    x = jnp.asarray(np.abs(rng.randn(N, L)), jnp.float32)
    ref = onepole_exact(x, alpha)

    state = jnp.zeros(N)
    block = 1024
    outs = []
    for k in range(L // block):
        y, state = onepole_exact(
            x[:, k * block : (k + 1) * block],
            alpha,
            state_in=state,
            return_state=True,
        )
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_ballistics_stream_matches_full():
    """zi threading: ballistics already exposes the carried state (its
    last output); streamed blocks == one shot."""
    rng = np.random.RandomState(4)
    N, L = 6, 2048
    u = jnp.asarray(np.abs(rng.randn(N, L)), jnp.float32)
    at = jnp.asarray(rng.uniform(0.01, 0.9, N), jnp.float32)
    rt = jnp.asarray(rng.uniform(0.01, 0.9, N), jnp.float32)
    zi = jnp.ones(N)
    ref = ballistics_core(u, zi, at, rt)

    state = zi
    outs = []
    block = 512
    for k in range(L // block):
        y = ballistics_core(u[:, k * block : (k + 1) * block], state, at, rt)
        outs.append(y)
        state = y[:, -1]
    streamed = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("h_len,block", [(20000, 4096), (6000, 2048), (500, 1024)])
def test_conv_stream_unified_matches_causal(h_len, block):
    """conv_stream_init/apply (frequency-domain partitioned delay line
    for long IRs, tail carry for short) == one-shot causal conv."""
    from grafx_tpu.ops.fftconv import conv_stream_apply, conv_stream_init

    rng = np.random.RandomState(5)
    L = block * 6
    x = jnp.asarray(rng.randn(2, 2, L), jnp.float32)
    h = jnp.asarray(rng.randn(2, 2, h_len) * 0.02, jnp.float32)
    ref = fft_convolve(x, h, mode="causal")

    state, cache = conv_stream_init(h, 2, block)
    if h_len > 2 * min(8192, block):
        assert cache["kind"] == "upols"
    outs = []
    for k in range(L // block):
        y, state = conv_stream_apply(
            x[..., k * block : (k + 1) * block], state, cache
        )
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(ref), rtol=1e-4, atol=2e-4
    )

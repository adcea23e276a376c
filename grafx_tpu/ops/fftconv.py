"""FFT-based convolution primitives.

TPU-native replacement for the reference's FIR convolution backend
(reference: src/grafx/processors/core/convolution.py:109-134) and its
optional FlashFFTConv CUDA fast path.  On TPU, XLA's rfft/irfft are native
and fuse with the surrounding elementwise work, so a single code path
suffices; we default to power-of-two FFT lengths, which XLA tiles best.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

# The custom-VJP path shares the forward spectra rfft(x)/rfft(h) with the
# adjoint and writes the backward as two IRFFTs (correlation theorem),
# replacing the complex-to-complex FFTs that JAX's generic rfft/irfft
# transpose rules emit.  Measured NEUTRAL-to-slightly-negative on TPU
# v5e (the long-FFT decomposition passes bind, not the C2C transforms —
# BASELINE.md round 3), and a custom_vjp rejects forward-mode autodiff
# (jax.jvp/jacfwd through renders), so it is OFF by default; set
# GRAFX_TPU_FFTCONV_VJP=1 to enable (kept for FFT-op-count-sensitive
# targets, gradient-parity-tested either way).
USE_CUSTOM_VJP = os.environ.get("GRAFX_TPU_FFTCONV_VJP", "0") == "1"

# Automatic blocked-convolution dispatch: XLA's 1-D FFTs beyond ~2^17
# points lower to transpose-heavy multi-pass programs whose per-point
# cost is several times that of ~2^14-2^16 transforms (measured on TPU
# v5e: benchmarks/conv_variants.py — 2.6x for a 2k-tap FIR on 2^18).
# When a long conv can run at short FFT lengths, do so:
#   * SHORT filters (fit one fast block): plain overlap-save with a
#     maximal non-pow2 hop;
#   * LONG filters (a 60k reverb tail would force the block length back
#     up): uniformly-partitioned overlap-save (fft_convolve_upols) —
#     measured 3.5x over maximal-block OS (26.4 -> 7.6 ms on the 60k
#     reverb workload).
# GRAFX_TPU_CONV_AUTO_OS=0 disables both.
AUTO_OS = os.environ.get("GRAFX_TPU_CONV_AUTO_OS", "1") != "0"
_AUTO_OS_LONG_FFT = 1 << 17  # big-FFT lengths above this trigger blocking
_AUTO_OS_MIN_NFFT = 1 << 14  # never use blocks shorter than this
_UPOLS_PART = 1 << 13  # partition length (FFT size 2^14), measured optimum


def _auto_os_block(x_len: int, h_len: int, shift: int):
    """Blocked-conv dispatch decision: ``None`` (single full-length
    FFT), ``("os", block)``, or ``("upols", part)``."""
    span = h_len + shift  # filter history + zerophase lookahead
    if next_pow2(x_len + span - 1) <= _AUTO_OS_LONG_FFT:
        return None
    if next_pow2(span) > _UPOLS_PART:
        return ("upols", _UPOLS_PART)
    nfft = max(2 * next_pow2(span), _AUTO_OS_MIN_NFFT)
    block = nfft - (span - 1)  # maximal alias-free hop (non-pow2 is fine)
    if -(-x_len // block) < 2:
        return None
    return ("os", block)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n."""
    return 1 << (int(n) - 1).bit_length()


def compute_pad_len(x_len: int, h_len: int, pad_mode: str = "pow2") -> int:
    """FFT length for a full linear convolution of lengths ``x_len`` and
    ``h_len`` (reference: core/convolution.py:109-117)."""
    full = x_len + h_len - 1
    if pad_mode == "pow2":
        return next_pow2(full)
    elif pad_mode == "min":
        return full
    raise ValueError(f"Unsupported pad_mode: {pad_mode}")


def _crop_params(x_len: int, h_len: int, n: int, mode: str):
    """(start, length) of the output window within the length-``n``
    circular convolution.  ``mode`` may be ``"causal"``, ``"zerophase"``,
    ``"full"``, or ``("shift", s)`` — an arbitrary integer advance (the
    generalization both crops are instances of: causal is s=0,
    zerophase is s=h_len//2; composed LTI chains need the summed s)."""
    if isinstance(mode, tuple) and mode[0] == "shift":
        return int(mode[1]), x_len
    if mode == "zerophase":
        return h_len // 2, x_len
    elif mode == "causal":
        return 0, x_len
    elif mode == "full":
        return 0, n
    raise ValueError(f"Unsupported convolution mode: {mode}")


def _unbroadcast(g, shape):
    """Adjoint of broadcasting: sum ``g`` down to ``shape``."""
    extra = g.ndim - len(shape)
    if extra:
        g = jnp.sum(g, axis=tuple(range(extra)))
    axes = tuple(
        i for i, (a, b) in enumerate(zip(g.shape, shape)) if b == 1 and a != 1
    )
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g


def _fft_convolve_spectra(x, h, mode, pad_mode):
    x_len, h_len = x.shape[-1], h.shape[-1]
    n = compute_pad_len(x_len, h_len, pad_mode)
    X = jnp.fft.rfft(x, n=n)
    H = jnp.fft.rfft(h, n=n)
    y = jnp.fft.irfft(X * H, n=n)
    start, out_len = _crop_params(x_len, h_len, n, mode)
    return y[..., start : start + out_len], X, H


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fft_convolve_shared_vjp(x, h, mode, pad_mode):
    y, _, _ = _fft_convolve_spectra(x, h, mode, pad_mode)
    return y


def _fft_convolve_fwd(x, h, mode, pad_mode):
    y, X, H = _fft_convolve_spectra(x, h, mode, pad_mode)
    return y, (X, H, x.shape, h.shape)


def _fft_convolve_bwd(mode, pad_mode, res, dy):
    # Adjoint of y = crop(irfft(rfft(x) * rfft(h))): with the circulant
    # view y = R C_h P x, the cotangents are circular *correlations* —
    # dx = irfft(conj(H) * DY)[:L_x], dh = irfft(conj(X) * DY)[:L_h] —
    # computed from the SAVED forward spectra, so fwd+bwd together cost
    # exactly 3 RFFTs + 3 IRFFTs (the minimum for a bilinear conv).
    X, H, x_shape, h_shape = res
    x_len, h_len = x_shape[-1], h_shape[-1]
    n = compute_pad_len(x_len, h_len, pad_mode)
    start, _ = _crop_params(x_len, h_len, n, mode)
    if start:
        dy = jnp.pad(dy, [(0, 0)] * (dy.ndim - 1) + [(start, 0)])
    DY = jnp.fft.rfft(dy, n=n)
    dx = jnp.fft.irfft(jnp.conj(H) * DY, n=n)[..., :x_len]
    dh = jnp.fft.irfft(jnp.conj(X) * DY, n=n)[..., :h_len]
    return _unbroadcast(dx, x_shape), _unbroadcast(dh, h_shape)


_fft_convolve_shared_vjp.defvjp(_fft_convolve_fwd, _fft_convolve_bwd)


def fft_convolve(x, h, mode: str = "zerophase", pad_mode: str = "pow2"):
    """Batched linear convolution via real FFT.

    Args:
        x: input signals ``(..., L_x)``; leading dims broadcast against ``h``.
        h: FIR filters ``(..., L_h)``.
        mode: ``"causal"`` keeps ``y[..., :L_x]``; ``"zerophase"`` keeps a
            window centered at ``L_h // 2`` (reference:
            core/convolution.py:119-134); ``"full"`` returns the whole
            padded product.
        pad_mode: ``"pow2"`` (TPU-friendly) or ``"min"``.

    Returns:
        Convolved signals of length ``L_x`` (for causal/zerophase) with
        broadcast leading dims, e.g. channel broadcasting between a mono
        filter and a stereo signal.

    Long convs automatically run as blocked overlap-save when that
    avoids a pathological long 1-D XLA FFT (see ``AUTO_OS``); outputs
    identical to round-off either way.  An optional shared-spectra
    custom VJP (``GRAFX_TPU_FFTCONV_VJP=1``) minimizes the FFT op count
    of fwd+bwd pairs; it is off by default — measured neutral on TPU,
    and a ``custom_vjp`` would reject forward-mode autodiff
    (``jax.jvp``/``jacfwd``) through renders.
    """
    if AUTO_OS and pad_mode == "pow2" and mode != "full":
        if isinstance(mode, tuple):
            shift = int(mode[1])
        else:
            shift = h.shape[-1] // 2 if mode == "zerophase" else 0
        plan = _auto_os_block(x.shape[-1], h.shape[-1], shift)
        if plan is not None:
            kind, size = plan
            if kind == "upols":
                return fft_convolve_upols(x, h, mode=mode, part=size)
            return fft_convolve_os(x, h, mode=mode, block=size)
    if USE_CUSTOM_VJP:
        return _fft_convolve_shared_vjp(x, h, mode, pad_mode)
    y, _, _ = _fft_convolve_spectra(x, h, mode, pad_mode)
    return y


class FIRConvolution:
    """A stateless FIR convolution 'module' mirroring the reference API
    (reference: core/convolution.py:17-106).

    The ``flashfftconv`` / ``max_input_len`` arguments of the reference are
    accepted and ignored: on TPU the XLA FFT path *is* the fast path.
    """

    def __init__(self, mode="causal", pad_mode="pow2", overlap_save=False,
                 **_ignored_backend_kwargs):
        if mode not in ("causal", "zerophase"):
            raise ValueError(f"Unsupported convolution mode: {mode}")
        self.mode = mode
        self.pad_mode = pad_mode
        self.overlap_save = overlap_save

    def __call__(self, input_signals, fir):
        if self.overlap_save and self.mode == "causal":
            return fft_convolve_os(input_signals, fir)
        return fft_convolve(input_signals, fir, mode=self.mode, pad_mode=self.pad_mode)


def fft_convolve_upols(x, h, mode: str = "causal", part: int = 8192):
    """Uniformly-partitioned overlap-save convolution (UPOLS).

    The classic real-time convolution-reverb algorithm, which is also
    the right TPU formulation for LONG filters: the filter splits into
    ``m`` length-``part`` chunks, the signal into hop-``part`` segments
    (FFT size ``2 * part`` — the fast XLA regime), and chunk ``j``'s
    contribution to output segment ``k`` is ``X[k-j] * H[j]`` — a small
    banded complex accumulation XLA fuses, with ONE irfft per output
    segment.  Versus plain overlap-save (whose FFT length must exceed
    the whole filter), every transform stays short regardless of
    ``L_h``.  Exact to float round-off (same result as
    :func:`fft_convolve`).

    Args:
        x: ``(..., L_x)``; h: ``(..., L_h)`` (leading dims broadcast).
        mode: ``"causal"``, ``"zerophase"``, or ``("shift", s)``.
        part: chunk/hop length (FFT size is ``2 * part``).

    Returns:
        ``(..., L_x)`` convolved signals.
    """
    L = x.shape[-1]
    Lh = h.shape[-1]
    if isinstance(mode, tuple) and mode[0] == "shift":
        shift = int(mode[1])
    elif mode == "causal":
        shift = 0
    elif mode == "zerophase":
        shift = Lh // 2
    else:
        raise ValueError(f"Unsupported UPOLS mode: {mode}")
    C = part
    nfft = 2 * C
    m = -(-Lh // C)
    nb = -(-(L + shift) // C)

    lead_x = [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, lead_x + [(C, nb * C - L)])  # len (nb + 1) * C
    # 50%-overlapped segments via reshape (two static slices + concat
    # instead of nb dynamic slices): segment k holds x[kC - C : kC + C]
    S = xp.reshape(xp.shape[:-1] + (nb + 1, C))
    segs = jnp.concatenate([S[..., :-1, :], S[..., 1:, :]], axis=-1)
    # (..., nb, 2C)
    X = jnp.fft.rfft(segs, n=nfft)  # (..., nb, F)

    lead_h = [(0, 0)] * (h.ndim - 1)
    hp = jnp.pad(h, lead_h + [(0, m * C - Lh)])
    H = jnp.fft.rfft(
        hp.reshape(hp.shape[:-1] + (m, C)), n=nfft
    )  # (..., m, F)

    # Y[k] = sum_j X[k - j] H[j]; left-pad the segment axis so negative
    # indices read zeros (x has no content before its start)
    Xp = jnp.pad(X, [(0, 0)] * (X.ndim - 2) + [(m - 1, 0), (0, 0)])
    Y = None
    for j in range(m):
        term = Xp[..., m - 1 - j : m - 1 - j + nb, :] * H[..., j : j + 1, :]
        Y = term if Y is None else Y + term
    y = jnp.fft.irfft(Y, n=nfft)[..., C:]  # (..., nb, C) valid halves
    y = y.reshape(y.shape[:-2] + (nb * C,))
    return y[..., shift : shift + L]


def conv_stream_zero_tail(lead_shape, h_len, dtype=jnp.float32):
    """Initial (zero) overlap-add tail for :func:`fft_convolve_stream`:
    shape ``lead_shape + (h_len - 1,)``."""
    return jnp.zeros(tuple(lead_shape) + (max(h_len - 1, 0),), dtype)


def fft_convolve_stream(x, h, tail):
    """One block of a streaming causal FIR convolution (overlap-add).

    Computes the full linear convolution of the block and folds the
    carried tail in: ``acc = conv_full(x, h); acc[:L_tail] += tail``;
    the first ``B`` samples are this block's output, the remaining
    ``L_h - 1`` are the next tail.  Streaming any block split this way
    reproduces the one-shot ``fft_convolve(mode="causal")`` output
    exactly (to float round-off) — the conv side of the streaming
    renderer (reference behavior: core/convolution.py:119-134; streaming
    itself is beyond the reference).

    Args:
        x: block ``(..., B)``.
        h: FIR ``(..., L_h)`` (any length vs ``B`` — tails longer than
            the block simply span several future blocks).
        tail: carried tail ``(..., L_h - 1)`` from the previous step
            (:func:`conv_stream_zero_tail` initially).

    Returns:
        ``(y_block (..., B), new_tail (..., L_h - 1))``.
    """
    B = x.shape[-1]
    Lt = h.shape[-1] - 1
    full = fft_convolve(x, h, mode="full")[..., : B + Lt]
    if Lt:
        acc = full + jnp.pad(
            tail, [(0, 0)] * (tail.ndim - 1) + [(0, B)]
        )
    else:
        acc = full
    return acc[..., :B], acc[..., B:]


def conv_stream_init(h, num_channels, block_len):
    """Initialize a streaming causal convolution with filter ``h``
    ``(B, C_h, L_h)``; returns ``(state, cache)`` for
    :func:`conv_stream_apply`.

    Short filters carry a time-domain overlap-add tail
    (:func:`fft_convolve_stream`).  Long filters (past one UPOLS
    partition, when the block divides the partition grid) carry a
    *frequency-domain delay line* — the last ``m - 1`` segment spectra —
    so every per-block transform stays at the fast ``2^14`` FFT length
    regardless of ``L_h`` (the classic real-time partitioned
    convolution, matching :func:`fft_convolve_upols`).

    ``GRAFX_TPU_STREAM_CONV`` = ``auto`` (default) / ``tail`` /
    ``upols`` forces the state representation for A/B measurement."""
    import os

    B, C_h, Lh = h.shape
    C_bc = max(num_channels, C_h)
    part = min(_UPOLS_PART, next_pow2(block_len))
    mode = os.environ.get("GRAFX_TPU_STREAM_CONV", "auto")
    want_upols = (
        Lh > 2 * part and block_len % part == 0
        if mode == "auto"
        else mode == "upols" and block_len % part == 0 and Lh > part
    )
    if want_upols:
        Cp = part
        nfft = 2 * Cp
        m = -(-Lh // Cp)
        hp = jnp.pad(h, [(0, 0), (0, 0), (0, m * Cp - Lh)])
        H = jnp.fft.rfft(hp.reshape(B, C_h, m, Cp), n=nfft)
        state = {
            "X": jnp.zeros((B, C_bc, m - 1, nfft // 2 + 1), jnp.complex64),
            "xtail": jnp.zeros((B, C_bc, Cp), h.dtype),
        }
        # X[..., i, :] holds X_{k-1-(m-2-i)}, pairing with H_{m-1-i}: store
        # H_1..H_{m-1} pre-reversed so the step is one elementwise
        # multiply + sum over the segment axis instead of an m-term loop.
        cache = {
            "kind": "upols",
            "H0": H[..., 0, :],
            "Hrev": H[..., 1:, :][..., ::-1, :],
            "part": Cp,
        }
        return state, cache
    return (
        conv_stream_zero_tail((B, C_bc), Lh, h.dtype),
        {"kind": "tail", "h": h},
    )


def conv_stream_apply(x, state, cache):
    """One streaming block through a conv initialized by
    :func:`conv_stream_init`; returns ``(y_block, new_state)``."""
    if cache["kind"] == "tail":
        return fft_convolve_stream(x, cache["h"], state)
    H0 = cache["H0"]  # (B, C_h, F)
    Hrev = cache["Hrev"]  # (B, C_h, m-1, F), H_{m-1}..H_1
    Cp = int(cache["part"])
    nfft = 2 * Cp
    X = state["X"]
    xtail = state["xtail"]
    lead = X.shape[:2]
    xb = jnp.broadcast_to(x, lead + (x.shape[-1],))
    outs = []
    for s in range(x.shape[-1] // Cp):
        xs = xb[..., s * Cp : (s + 1) * Cp]
        window = jnp.concatenate([xtail, xs], axis=-1)  # x[kC-C : kC+C]
        Xk = jnp.fft.rfft(window, n=nfft)  # (B, C, F)
        # Y_k = sum_j X_{k-j} H_j, one fused reduction over segments
        Y = Xk * H0 + jnp.sum(X * Hrev, axis=-2)
        outs.append(jnp.fft.irfft(Y, n=nfft)[..., Cp:])
        X = jnp.concatenate([X[..., 1:, :], Xk[..., None, :]], axis=-2)
        xtail = xs
    y = jnp.concatenate(outs, axis=-1)
    return y, {"X": X, "xtail": xtail}


def fft_convolve_os(x, h, mode: str = "causal", block: int = None):
    """Overlap-save blocked FFT convolution, cropped to ``L_x``.

    Runs several shorter transforms (each ``next_pow2(block + L_h - 1)``)
    instead of one big one.  Exact (same result as :func:`fft_convolve`
    to float round-off).  For long filters (60k reverb tails) this was
    measured performance-neutral on TPU v5e (the blocks are still long
    FFTs); for SHORT filters it replaces one pathological long-1D
    XLA FFT with many small well-tiled ones — see
    benchmarks/conv_variants.py for the measured crossover.

    Args:
        x: ``(..., L_x)``; h: ``(..., L_h)`` (any ``block`` works: the
            FFT length confines circular wrap-around to the discarded
            leading samples of each block).
        mode: ``"causal"`` or ``"zerophase"`` (centered crop, matching
            :func:`fft_convolve`).
        block: output hop per FFT block; default picks
            ``next_pow2(L_h)`` so the FFT length is ``2 * next_pow2(L_h)``.
    """
    L = x.shape[-1]
    Lh = h.shape[-1]
    if isinstance(mode, tuple) and mode[0] == "shift":
        shift = int(mode[1])
    elif mode == "causal":
        shift = 0
    elif mode == "zerophase":
        shift = Lh // 2
    else:
        raise ValueError(f"Unsupported overlap-save mode: {mode}")
    if block is None:
        block = max(next_pow2(Lh), 4096)
    nfft = next_pow2(block + Lh - 1 + shift)
    nb = -(-L // block)
    pad_tail = nb * block - L + shift + (nfft - block - Lh + 1)
    lead = [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, lead + [(Lh - 1, pad_tail)])
    # the hop is deliberately the maximal alias-free (non-pow2) value,
    # so reshape framing does not apply — static per-segment slices
    segs = jnp.stack(
        [
            jax.lax.slice_in_dim(xp, k * block, k * block + nfft, axis=-1)
            for k in range(nb)
        ],
        axis=-2,
    )  # (..., nb, nfft)
    X = jnp.fft.rfft(segs, n=nfft)
    H = jnp.fft.rfft(h, n=nfft)[..., None, :]
    y = jnp.fft.irfft(X * H, n=nfft)[..., Lh - 1 + shift : Lh - 1 + shift + block]
    # leading dims broadcast between x and h (e.g. a stereo filter on a
    # mono signal) — flatten the block axis on the BROADCAST shape
    return y.reshape(y.shape[:-2] + (nb * block,))[..., :L]

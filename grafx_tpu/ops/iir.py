"""Exact and frequency-sampled IIR filtering, TPU-first.

The reference offers three biquad backends (reference:
src/grafx/processors/core/iir.py:96-131): an FSM approximation (FFT), an
exact ``torchaudio.lfilter`` loop (CUDA), and an exact diagonalized
state-space scan built on torchlpc's CUDA sample-wise recursion.

Here the exact path is re-designed for TPU as a **blocked state-space
filter** that needs no sequential per-sample work at all:

* split the signal into blocks of length ``T``;
* inside a block, the zero-state response is a causal FIR convolution with
  the (exactly computed) length-``T`` truncated impulse response — an XLA
  FFT;
* the state handed to the next block is a linear function of the incoming
  state and the block's samples — MXU matmuls plus constant-matrix prefix
  doubling across the ``L / T`` blocks.

For cascades of 3+ biquads the whole stack is treated as ONE blocked
linear system with a ``2K``-dim state (``_biquad_block_cascade``): a
single FFT convolution with the cascade IR plus small matmuls, with the
operator kernels assembled by log-depth pairwise composition.

This is exact to float precision (block truncation is *not* an
approximation: older history flows through the state) and maps onto the
TPU's MXU + FFT units instead of a length-``L`` recursion.

A sequential ``lax.scan`` reference implementation (`biquad_scan`) is kept
as the correctness oracle, and the FSM backend is provided for parity with
the reference's default.
"""

import functools

import jax
import jax.numpy as jnp

from grafx_tpu.ops.fftconv import fft_convolve, next_pow2

# ---------------------------------------------------------------------------
# Frequency-sampling method (FSM)
# ---------------------------------------------------------------------------


def fsm_delay_phasors(order: int, fir_len: int):
    """DFT-bin phasors ``exp(-j w k)`` for delays ``k = 0..order``
    (reference: core/iir.py:269-276)."""
    k = jnp.arange(order + 1, dtype=jnp.float32)[:, None]
    bins = jnp.arange(fir_len // 2 + 1, dtype=jnp.float32)[None, :]
    phase = 2.0 * jnp.pi * k * bins / fir_len
    return jnp.exp(-1j * phase)  # (order+1, fir_len//2+1)


def iir_fsm_response(Bs, As, delays):
    """Sampled DTFT of a biquad cascade.

    Args:
        Bs, As: coefficients ``(..., K, 3)``.
        delays: phasors ``(3, F)`` from :func:`fsm_delay_phasors`.

    Returns:
        Complex response ``(..., K, F)`` (per biquad; multiply over ``K``
        outside).  Reference: core/iir.py:263-267.
    """
    num = jnp.sum(Bs[..., None] * delays, axis=-2)
    den = jnp.sum(As[..., None] * delays, axis=-2)
    return num / den


def iir_fsm_fir(Bs, As, fir_len: int):
    """FIR approximation of a biquad cascade via frequency sampling.

    Args:
        Bs, As: ``(..., K, 3)`` biquad coefficients.
        fir_len: number of DTFT sample points / FIR taps.

    Returns:
        Real FIR ``(..., fir_len)``.
    """
    delays = fsm_delay_phasors(2, fir_len)
    response = iir_fsm_response(Bs, As, delays)
    response = jnp.prod(response, axis=-2)
    return jnp.fft.irfft(response, n=fir_len)


# ---------------------------------------------------------------------------
# Exact sequential scan (correctness oracle)
# ---------------------------------------------------------------------------


def _normalize(Bs, As):
    b = Bs / As[..., :1]
    a = As / As[..., :1]
    return b, a


def biquad_scan(x, Bs, As):
    """Exact biquad cascade via a sequential ``lax.scan`` (transposed
    direct-form II).  Slow but exact; used as the test oracle.

    Args:
        x: ``(N, L)`` signals.
        Bs, As: ``(N, K, 3)`` coefficients (un-normalized allowed).
    """
    b, a = _normalize(Bs, As)
    num_biquads = b.shape[-2]

    def stage(x, bk, ak):
        b0, b1, b2 = bk[..., 0], bk[..., 1], bk[..., 2]
        a1, a2 = ak[..., 1], ak[..., 2]

        def step(carry, xn):
            s1, s2 = carry
            yn = b0 * xn + s1
            s1_new = b1 * xn - a1 * yn + s2
            s2_new = b2 * xn - a2 * yn
            return (s1_new, s2_new), yn

        init = (jnp.zeros_like(x[:, 0]), jnp.zeros_like(x[:, 0]))
        _, y = jax.lax.scan(step, init, x.T)
        return y.T

    y = x
    for k in range(num_biquads):
        y = stage(y, b[:, k], a[:, k])
    return y


# ---------------------------------------------------------------------------
# Exact blocked state-space filter (the TPU fast path)
# ---------------------------------------------------------------------------


def _companion_powers(a1, a2, T):
    """Top rows ``(p[n], q[n]) = (A^n)[0, :]`` of the companion-matrix
    powers for ``A = [[-a1, -a2], [1, 0]]``, for ``n = 0..T``.

    Computed in closed form from the eigenvalues ``l1, l2`` of ``A``
    (the diagonalized state-space view, matching the case analysis of the
    reference's "ssm" backend, core/iir.py:285-338):

        S[n] = (l1^n - l2^n) / (l1 - l2),   p[n] = S[n+1],
        q[n] = -a2 * S[n],

    with the double-root limit ``S[n] = n * l^(n-1)`` when the
    discriminant vanishes.  The closed form is numerically stable for
    poles arbitrarily close to the unit circle, where product-form
    recurrences blow up in float32.

    Args:
        a1, a2: ``(N,)`` normalized feedback coefficients.

    Returns:
        p, q of shape ``(N, T + 1)``, real, same dtype as ``a1``.
    """
    dtype = a1.dtype
    is64 = dtype == jnp.float64
    cdtype = jnp.complex128 if is64 else jnp.complex64
    tol = 1e-12 if is64 else 1e-6

    a1c = a1.astype(cdtype)
    a2c = a2.astype(cdtype)
    d = a1c * a1c - 4.0 * a2c
    scale = jnp.abs(a1c) ** 2 + 4.0 * jnp.abs(a2c) + 1e-20
    double_root = jnp.abs(d) <= tol * scale

    # sqrt of the (guarded) discriminant; guarding keeps the unselected
    # branch's gradient finite under jnp.where
    d_safe = jnp.where(double_root, 1.0, d)
    sq = jnp.sqrt(d_safe)
    l1 = (-a1c + sq) / 2.0
    l2 = (-a1c - sq) / 2.0

    n = jnp.arange(T + 2)

    # complex powers in explicit polar-real form: XLA's generic complex
    # pow lowers to a slow path on TPU (measured ~7 ms for (432, 1026));
    # exp/cos/sin on reals is ~100x faster
    def safe_pow(lam):
        mag = jnp.maximum(jnp.abs(lam), 1e-20)
        ang = jnp.arctan2(lam.imag, lam.real)
        logmag = jnp.log(mag)
        nl = n[None, :] * logmag[:, None]
        na = n[None, :] * ang[:, None]
        r = jnp.exp(nl)
        return jax.lax.complex(r * jnp.cos(na), r * jnp.sin(na))

    S = (safe_pow(l1) - safe_pow(l2)) / sq[:, None]  # (N, T+2)

    lmid = -a1c / 2.0
    lmid = jnp.where(jnp.abs(lmid) < 1e-20, 1e-20 + 0.0j, lmid)
    # S_double[n] = n * lmid^(n-1) = n * lmid^n / lmid (safe: |lmid|>=1e-20)
    S_double = n * safe_pow(lmid) / lmid[:, None]

    S = jnp.where(double_root[:, None], S_double, S)

    p = S[:, 1:].real.astype(dtype)  # p[n] = S[n+1], n = 0..T
    q = (-a2c[:, None] * S[:, : T + 1]).real.astype(dtype)
    return p, q


def _biquad_block_stage(x, bk, ak, T):
    """One exact biquad applied to ``x`` with block size ``T``.

    Direct-form II state space: with state ``s[n]`` (2-vector),
    ``s[n+1] = A s[n] + B u[n]``, ``y[n] = C s[n] + b0 u[n]`` where
    ``A = [[-a1, -a2], [1, 0]]``, ``B = e0``, ``C = [b1 - b0 a1,
    b2 - b0 a2]`` (reference derivation: core/iir.py:63-78; the
    blocked evaluation itself is original to this rebuild).

    Args:
        x: ``(N, L)``; bk ``(N, 3)`` normalized; ak ``(N, 3)`` normalized.
    """
    N, L = x.shape
    num_blocks = -(-L // T)
    pad = num_blocks * T - L
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    xb = xp.reshape(N, num_blocks, T)

    b0, b1, b2 = bk[:, 0], bk[:, 1], bk[:, 2]
    a1, a2 = ak[:, 1], ak[:, 2]
    c0, c1 = b1 - b0 * a1, b2 - b0 * a2  # C vector

    p, q = _companion_powers(a1, a2, T)  # (N, T+1) each
    p_prev = jnp.concatenate([jnp.zeros_like(p[:, :1]), p[:, :-1]], axis=1)
    q_prev = jnp.concatenate([jnp.ones_like(q[:, :1]), q[:, :-1]], axis=1)

    # A^n B = (p[n], p[n-1]);  C A^n = (c0 p[n] + c1 p[n-1],
    #                                   c0 q[n] + c1 q[n-1]).
    CA0 = c0[:, None] * p[:, :T] + c1[:, None] * p_prev[:, :T]  # (N, T)
    CA1 = c0[:, None] * q[:, :T] + c1[:, None] * q_prev[:, :T]  # (N, T)

    # Truncated impulse response h[0] = b0, h[n] = C A^(n-1) B = CA0[n-1].
    h = jnp.concatenate([b0[:, None], CA0[:, : T - 1]], axis=-1)  # (N, T)

    # Zero-state response inside each block: causal FFT conv, exact since
    # the filter history within a block never exceeds T samples.
    y_zs = fft_convolve(xb, h[:, None, :], mode="causal", pad_mode="pow2")

    # State injected by each block: s_in[k] = sum_i A^(T-1-i) B u[k, i];
    # component-wise correlations with the reversed power sequences (MXU).
    F0 = p[:, :T][:, ::-1]  # p[T-1-i]
    F1 = p_prev[:, :T][:, ::-1]  # p[T-2-i]
    s_in0 = jnp.einsum("nbt,nt->nb", xb, F0)  # (N, NB)
    s_in1 = jnp.einsum("nbt,nt->nb", xb, F1)

    # Propagate states across blocks: s_{k+1} = A^T s_k + s_in[k], s_0 = 0,
    # with A^T = [[p[T], q[T]], [p[T-1], q[T-1]]]; scalar-component affine
    # associative scan over the (tiny) block axis.
    def bc(v):
        return jnp.broadcast_to(v[:, None], (N, num_blocks))

    m11, m12 = bc(p[:, T]), bc(q[:, T])
    m21, m22 = bc(p[:, T - 1]), bc(q[:, T - 1])

    def combine(first, second):
        # second ∘ first for affine maps s -> M s + v
        f11, f12, f21, f22, fv1, fv2 = first
        s11, s12, s21, s22, sv1, sv2 = second
        return (
            s11 * f11 + s12 * f21,
            s11 * f12 + s12 * f22,
            s21 * f11 + s22 * f21,
            s21 * f12 + s22 * f22,
            s11 * fv1 + s12 * fv2 + sv1,
            s21 * fv1 + s22 * fv2 + sv2,
        )

    scanned = jax.lax.associative_scan(
        combine, (m11, m12, m21, m22, s_in0, s_in1), axis=1
    )
    s_after0, s_after1 = scanned[4], scanned[5]
    zeros = jnp.zeros_like(s_after0[:, :1])
    s_enter0 = jnp.concatenate([zeros, s_after0[:, :-1]], axis=1)  # (N, NB)
    s_enter1 = jnp.concatenate([zeros, s_after1[:, :-1]], axis=1)

    # Initial-state response inside each block: y_is[k, n] = (C A^n) s_k.
    y_is = CA0[:, None, :] * s_enter0[:, :, None] + CA1[:, None, :] * s_enter1[
        :, :, None
    ]

    y = (y_zs + y_is).reshape(N, num_blocks * T)
    return y[:, :L]


def biquad_exact(x, Bs, As, block_size: int = 128):
    """Exact biquad cascade via the blocked state-space method.

    Args:
        x: ``(N, L)`` signals.
        Bs, As: ``(N, K, 3)`` (un-normalized allowed).
        block_size: block length ``T``; clamped to ``next_pow2(L)``.
            Smaller blocks shift work from the parameter-dependent
            kernel build (cost ~ K*T) to the cheap data path; T=256
            measured ~2.5x faster than T=1024 for 24-biquad cascades
            at L=2^17 with identical (exact) results.

    Returns:
        ``(N, L)`` filtered signals, bit-comparable (float32) to the exact
        recursion.
    """
    L = x.shape[-1]
    T = min(block_size, next_pow2(L))
    b, a = _normalize(Bs, As)
    num_biquads = b.shape[-2]
    if num_biquads <= 2:
        y = x
        for k in range(num_biquads):
            y = _biquad_block_stage(y, b[:, k], a[:, k], T)
        return y
    # longer cascades: single-pass blocked cascade operator (one big FFT
    # conv + MXU matmuls instead of K sequential FFT convs)
    return _biquad_block_cascade(x, b, a, T)


# ---------------------------------------------------------------------------
# Exact blocked CASCADE filter: one data pass for the whole biquad stack
# ---------------------------------------------------------------------------
#
# The per-stage blocked filter does K sequential length-L FFT convolutions.
# The cascade version treats all K biquads as one linear system with a
# 2K-dim state: the data-dependent work collapses to
#   (1) ONE causal FFT convolution with the cascade's truncated IR,
#   (2) one MXU matmul for per-block state injection,
#   (3) a tiny associative scan of 2K x 2K affine maps across blocks,
#   (4) one MXU matmul for the initial-state responses.
# All parameter-dependent kernels (W, V, A_blk) are built by a lax.scan
# over the K stages on length-T signals — independent of L.


def _tconv(x, h, T):
    """Truncated causal convolution ``(x * h)[0:T]`` of length-``T``
    causal signals (exact: lags < T are alias-free at FFT size 2T)."""
    n = 2 * T
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=n) * jnp.fft.rfft(h, n=n), n=n)
    return y[..., :T]


def _cascade_kernels(b, a, T):
    """Blocked-cascade operator kernels.

    Args:
        b, a: ``(N, K, 3)`` normalized coefficients.

    Returns:
        ``(H_cas, W, V, A_blk)``:
        H_cas ``(N, T)`` cascade IR (truncated);
        W ``(N, S, T)`` with ``s_in[s] = sum_t xb[t] W[s, t]``;
        V ``(N, S, T)`` with ``y_is[t] = sum_s s[s] V[s, t]``;
        A_blk ``(N, S, S)`` end-of-block state from start-of-block state;
        where ``S = 2K``.
    """
    N, K, _ = b.shape
    S = 2 * K

    a1f, a2f = a[..., 1].reshape(-1), a[..., 2].reshape(-1)
    p, q = _companion_powers(a1f, a2f, T)  # (N*K, T+1)
    p = p.reshape(N, K, T + 1)
    q = q.reshape(N, K, T + 1)
    p_prev = jnp.concatenate([jnp.zeros_like(p[..., :1]), p[..., :-1]], -1)
    q_prev = jnp.concatenate([jnp.ones_like(q[..., :1]), q[..., :-1]], -1)

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    a1, a2 = a[..., 1], a[..., 2]
    c0, c1 = b1 - b0 * a1, b2 - b0 * a2

    # per-stage kernels, stage axis leading for the scan
    CA0 = c0[..., None] * p[..., :T] + c1[..., None] * p_prev[..., :T]
    CA1 = c0[..., None] * q[..., :T] + c1[..., None] * q_prev[..., :T]
    CA = jnp.stack([CA0, CA1], axis=-2)  # (N, K, 2, T)
    # own-state output must include the feedthrough b0 * (C s) ... no:
    # y[n] = C A^n s exactly (feedthrough applies to inputs, which are
    # zero for the ISR), so CA is complete.
    h = jnp.concatenate([b0[..., None], CA0[..., : T - 1]], axis=-1)  # (N,K,T)
    phi = jnp.stack([p[..., :T], p_prev[..., :T]], axis=-2)  # (N, K, 2, T)
    phi_rev = phi[..., ::-1]
    AT = jnp.stack(
        [
            jnp.stack([p[..., T], q[..., T]], -1),
            jnp.stack([p[..., T - 1], q[..., T - 1]], -1),
        ],
        axis=-2,
    )  # (N, K, 2, 2)

    # scan over stages, building the cascade operator
    H0 = jnp.zeros((N, T), b.dtype).at[:, 0].set(1.0)  # delta
    V0 = jnp.zeros((N, S, T), b.dtype)
    W0 = jnp.zeros((N, S, T), b.dtype)
    A0 = jnp.zeros((N, S, S), b.dtype)

    def stage(carry, xs):
        H_pre, V, W, A = carry
        j, h_j, phi_j, phi_rev_j, CA_j, AT_j = xs
        # injection kernels for stage j: reverse(tconv(H_pre, phi))
        wj = _tconv(H_pre[:, None, :], phi_j, T)[..., ::-1]  # (N, 2, T)
        W = jax.lax.dynamic_update_slice(W, wj, (0, 2 * j, 0))
        # A rows: old states' signals (V) correlated into stage j's state
        a_rows = jnp.einsum("nrt,nmt->nmr", V, phi_rev_j)  # (N, 2, S)
        A = jax.lax.dynamic_update_slice(A, a_rows, (0, 2 * j, 0))
        # own-state 2x2 block on the diagonal
        A = jax.lax.dynamic_update_slice(A, AT_j, (0, 2 * j, 2 * j))
        # propagate old ISR signals through stage j; add own kernels
        V = _tconv(V, h_j[:, None, :], T)
        V = jax.lax.dynamic_update_slice(V, CA_j, (0, 2 * j, 0))
        H_pre = _tconv(H_pre, h_j, T)
        return (H_pre, V, W, A), None

    xs = (
        jnp.arange(K),
        jnp.moveaxis(h, 1, 0),
        jnp.moveaxis(phi, 1, 0),
        jnp.moveaxis(phi_rev, 1, 0),
        jnp.moveaxis(CA, 1, 0),
        jnp.moveaxis(AT, 1, 0),
    )
    (H_cas, V, W, A_blk), _ = jax.lax.scan(stage, (H0, V0, W0, A0), xs)
    return H_cas, W, V, A_blk


def _cascade_kernels_doubling(b, a, T):
    """Blocked-cascade operator kernels via log-depth composition.

    Same output as :func:`_cascade_kernels`, but built by *doubling*:
    adjacent stage-groups are composed pairwise, so the whole operator is
    assembled in ``ceil(log2 K)`` batched rounds instead of ``K``
    sequential ones.  TPU FFTs are matmul-based and hate many small
    sequential calls; each round here is a handful of large batched FFTs
    plus MXU matmuls.

    Composition of upstream group 1 with downstream group 2 (each a
    blocked linear system ``(s, x) -> (s', y)`` with kernels H, V, W, A):

        H   = trunc(H1 * H2)
        V   = [trunc(V1 * H2); V2]
        W   = [W1; rev(trunc(H1 * rev(W2)))]
        A   = [[A1, 0], [V1 W2^T, A2]]

    K is padded to a power of two with identity stages (zero kernels).
    """
    N, K, _ = b.shape
    K_pad = 1 << max((K - 1).bit_length(), 0)

    # per-stage primitive kernels (same math as _cascade_kernels)
    a1f, a2f = a[..., 1].reshape(-1), a[..., 2].reshape(-1)
    p, q = _companion_powers(a1f, a2f, T)
    p = p.reshape(N, K, T + 1)
    q = q.reshape(N, K, T + 1)
    p_prev = jnp.concatenate([jnp.zeros_like(p[..., :1]), p[..., :-1]], -1)
    q_prev = jnp.concatenate([jnp.ones_like(q[..., :1]), q[..., :-1]], -1)

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    a1, a2 = a[..., 1], a[..., 2]
    c0, c1 = b1 - b0 * a1, b2 - b0 * a2

    CA0 = c0[..., None] * p[..., :T] + c1[..., None] * p_prev[..., :T]
    CA1 = c0[..., None] * q[..., :T] + c1[..., None] * q_prev[..., :T]
    CA = jnp.stack([CA0, CA1], axis=-2)  # (N, K, 2, T)
    h = jnp.concatenate([b0[..., None], CA0[..., : T - 1]], axis=-1)
    phi = jnp.stack([p[..., :T], p_prev[..., :T]], axis=-2)  # (N, K, 2, T)
    AT = jnp.stack(
        [
            jnp.stack([p[..., T], q[..., T]], -1),
            jnp.stack([p[..., T - 1], q[..., T - 1]], -1),
        ],
        axis=-2,
    )  # (N, K, 2, 2)

    # pad stages to K_pad with identity stages: h = delta, all state
    # kernels zero (the extra states never charge or discharge)
    if K_pad != K:
        pad_n = K_pad - K
        delta = jnp.zeros((N, pad_n, T), h.dtype).at[..., 0].set(1.0)
        h = jnp.concatenate([h, delta], axis=1)
        CA = jnp.concatenate([CA, jnp.zeros((N, pad_n, 2, T), h.dtype)], 1)
        phi = jnp.concatenate([phi, jnp.zeros((N, pad_n, 2, T), h.dtype)], 1)
        AT = jnp.concatenate([AT, jnp.zeros((N, pad_n, 2, 2), h.dtype)], 1)

    # initial groups: one stage each. Group tensors (N, G, R, T) etc.
    G = K_pad
    H = h[:, :, None, :][..., 0, :]  # (N, G, T)
    V = CA  # (N, G, 2, T)
    # single-stage injection kernels: W = reverse(phi)
    W = phi[..., ::-1]  # (N, G, 2, T)
    A = AT  # (N, G, 2, 2)

    n2 = 2 * T

    def tconv_freq(Xf, Yf):
        return jnp.fft.irfft(Xf * Yf, n=n2)[..., :T]

    while G > 1:
        H1, H2 = H[:, 0::2], H[:, 1::2]  # (N, G/2, T)
        V1, V2 = V[:, 0::2], V[:, 1::2]  # (N, G/2, R, T)
        W1, W2 = W[:, 0::2], W[:, 1::2]
        A1, A2 = A[:, 0::2], A[:, 1::2]  # (N, G/2, R, R)

        H1f = jnp.fft.rfft(H1, n=n2)
        H2f = jnp.fft.rfft(H2, n=n2)
        V1f = jnp.fft.rfft(V1, n=n2)
        W2rf = jnp.fft.rfft(W2[..., ::-1], n=n2)

        H = tconv_freq(H1f, H2f)
        V1H2 = tconv_freq(V1f, H2f[..., None, :])
        W2c = tconv_freq(H1f[..., None, :], W2rf)[..., ::-1]
        B = jnp.einsum("ngst,ngrt->ngsr", W2, V1)  # (N, G/2, R2, R1)

        R = V.shape[2]
        zeros = jnp.zeros_like(B)
        A = jnp.concatenate(
            [
                jnp.concatenate([A1, jnp.swapaxes(zeros, -1, -2)], -1),
                jnp.concatenate([B, A2], -1),
            ],
            axis=-2,
        )  # (N, G/2, 2R, 2R)
        V = jnp.concatenate([V1H2, V2], axis=2)
        W = jnp.concatenate([W1, W2c], axis=2)
        G //= 2

    H_cas, V, W, A_blk = H[:, 0], V[:, 0], W[:, 0], A[:, 0]
    S = 2 * K
    # drop identity-padding states (they are zero rows/cols at the tail
    # of each merged half... padding stages were appended at the END of
    # the cascade, so their rows are the trailing ones)
    return H_cas, W[:, :S], V[:, :S], A_blk[:, :S, :S]


def _biquad_block_cascade(x, b, a, T):
    """Exact biquad cascade via the single-pass blocked operator.

    Args:
        x: ``(N, L)``; b, a: ``(N, K, 3)`` normalized.
    """
    N, L = x.shape
    num_blocks = -(-L // T)
    pad = num_blocks * T - L
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    xb = xp.reshape(N, num_blocks, T)

    H_cas, W, V, A_blk = _cascade_kernels_doubling(b, a, T)
    S = W.shape[1]

    # (1) zero-state response: one causal FFT convolution
    y_zs = fft_convolve(xb, H_cas[:, None, :], mode="causal", pad_mode="pow2")

    # (2) per-block state injection (MXU)
    s_in = jnp.einsum("nbt,nst->nbs", xb, W)  # (N, NB, S)

    # (3) cross-block state propagation.  The transition matrix is the
    # same for every block, so instead of a generic associative scan over
    # (M, v) pairs (which materializes NB copies of M and multiplies them
    # at every level), run prefix doubling on the vectors alone:
    #   v[k] += A^(2^l) v[k - 2^l],  A^(2^(l+1)) = (A^(2^l))^2.
    s_after = s_in
    A_pow = A_blk
    shift = 1
    while shift < num_blocks:
        shifted = jnp.pad(s_after, ((0, 0), (shift, 0), (0, 0)))[:, :num_blocks]
        s_after = s_after + jnp.einsum("nij,nbj->nbi", A_pow, shifted)
        A_pow = A_pow @ A_pow
        shift *= 2
    zeros = jnp.zeros_like(s_after[:, :1])
    s_enter = jnp.concatenate([zeros, s_after[:, :-1]], axis=1)  # (N, NB, S)

    # (4) initial-state responses (MXU)
    y_is = jnp.einsum("nbs,nst->nbt", s_enter, V)

    y = (y_zs + y_is).reshape(N, num_blocks * T)
    return y[:, :L]


# ---------------------------------------------------------------------------
# First-order (one-pole) exact filter, blocked
# ---------------------------------------------------------------------------


def onepole_exact(x, alpha, block_size: int = 1024):
    """Exact one-pole smoother ``y[n] = alpha y[n-1] + (1 - alpha) x[n]``.

    Blocked closed-form analogue of :func:`biquad_exact` for first-order
    filters (scalar state, powers in closed form).  Replaces the
    reference's truncated-FIR approximation (core/envelope.py:10-60) with
    an exact filter when requested.

    Args:
        x: ``(N, L)``.
        alpha: ``(N,)`` in ``(0, 1)``.
    """
    N, L = x.shape
    T = min(block_size, next_pow2(L))
    num_blocks = -(-L // T)
    pad = num_blocks * T - L
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    xb = xp.reshape(N, num_blocks, T)

    log_alpha = jnp.log(alpha)[:, None]  # (N, 1)
    n = jnp.arange(T, dtype=x.dtype)[None, :]
    powers = jnp.exp(log_alpha * n)  # alpha^n, (N, T)
    alpha_T = jnp.exp(log_alpha[:, 0] * T)  # (N,)

    h = (1.0 - alpha)[:, None] * powers  # (N, T)
    y_zs = fft_convolve(xb, h[:, None, :], mode="causal", pad_mode="pow2")

    # State = y at the end of the previous block: y carried across blocks.
    # s_in[k] = sum_i alpha^{T-1-i} (1-alpha) u[k, i]
    F = h[:, ::-1]  # (N, T)
    s_in = jnp.einsum("nbt,nt->nb", xb, F)

    m = jnp.broadcast_to(alpha_T[:, None], (N, num_blocks))

    def combine(prev, cur):
        m1, v1 = prev
        m2, v2 = cur
        return m2 * m1, m2 * v1 + v2

    _, s_after = jax.lax.associative_scan(combine, (m, s_in), axis=1)
    s_enter = jnp.concatenate(
        [jnp.zeros_like(s_after[:, :1]), s_after[:, :-1]], axis=1
    )

    y = (y_zs + powers[:, None, :] * alpha[:, None, None] * s_enter[..., None]).reshape(
        N, num_blocks * T
    )
    return y[:, :L]

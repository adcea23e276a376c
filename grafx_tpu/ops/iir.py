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

# All load-bearing contractions of the exact path request HIGHEST
# precision: TPU MXU float32 einsums otherwise run as single-pass
# bfloat16 (~3 decimal digits), which would silently break the "exact to
# float32" contract on hardware while the CPU test gates stay green.
PREC = jax.lax.Precision.HIGHEST
# Apply-path contractions tolerate the 3-pass bf16 mode (~f32-equivalent
# for these well-conditioned, contraction-bounded operands) at half the
# MXU passes; the build-path kernels stay at HIGHEST.  Configurable
# (GRAFX_TPU_EXACT_APPLY_PRECISION=highest or
# :func:`set_exact_apply_precision`) and gated by BOTH the manual
# on-device dB suite (benchmarks/verify_iir_tpu.py) and the automated
# :func:`exactness_check_db` self-check that bench.py runs on the real
# chip before every headline measurement.
import os as _os

PREC_APPLY = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("GRAFX_TPU_EXACT_APPLY_PRECISION", "high").lower()
    == "highest"
    else jax.lax.Precision.HIGH
)


def set_exact_apply_precision(precision):
    """Set the precision of exact-path *apply* contractions.

    ``precision`` is ``"high"`` (default: 3-pass bf16, ~f32-equivalent,
    verified on TPU v5e at -79 dB worst case) or ``"highest"`` (6-pass,
    ~6% more step time, -94 dB worst case).  Build-path contractions
    always run at HIGHEST.

    Already-compiled programs keep the precision they were traced with,
    so this also clears the library's render-closure cache and JAX's
    jit caches — rebuilt/re-called closures pick up the new setting.
    """
    global PREC_APPLY
    table = {
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }
    if isinstance(precision, str):
        precision = table[precision.lower()]
    PREC_APPLY = precision
    try:
        from grafx_tpu.render import graph as _render_graph

        _render_graph._RENDER_FN_CACHE.clear()
    except ImportError:  # circular-import-safe during module init
        pass
    jax.clear_caches()


def exactness_check_db(L=2**15, N=4, K=24, r_hi=0.999, seed=0):
    """Measure the exact-cascade error vs a float64 scipy oracle ON THE
    CURRENT DEFAULT DEVICE, in dB (target <= -60).

    This is the automated guard for the PREC_APPLY relaxation: CPU test
    gates cannot see TPU MXU precision, so bench.py calls this on the
    real chip before timing and escalates to HIGHEST precision if the
    contract is violated (e.g. on a different TPU generation or XLA
    version).  Small enough to run in ~a second.
    """
    import numpy as np
    from scipy import signal as ss

    rng = np.random.RandomState(seed)
    r = rng.uniform(0.2, r_hi, (N, K))
    th = rng.uniform(0.02, np.pi - 0.02, (N, K))
    As = np.stack([np.ones_like(r), -2 * r * np.cos(th), r**2], -1)
    Bs = rng.randn(N, K, 3)
    x = rng.randn(N, L)
    y_ref = x.astype(np.float64)
    for n in range(N):
        yn = y_ref[n]
        for k in range(K):
            yn = ss.lfilter(Bs[n, k], As[n, k], yn)
        y_ref[n] = yn
    y = biquad_exact(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(Bs, jnp.float32),
        jnp.asarray(As, jnp.float32),
    )
    y = np.asarray(jax.block_until_ready(y), np.float64)
    err = y - y_ref
    return float(
        10.0
        * np.log10(np.mean(err**2) / (np.mean(y_ref**2) + 1e-300) + 1e-300)
    )

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


def _compensated_disc(a1, a2):
    """``a1**2 - 4*a2`` with the squaring's rounding error compensated
    (Dekker split product).  The raw float32 expression loses all
    significance when ``a1**2`` is close to ``4*a2`` — exactly the
    near-double-root / small-pole-angle regime real EQ filters live in
    (shelving biquads at low ``w0`` have pole angles ~1e-3)."""
    splitter = 134217729.0 if a1.dtype == jnp.float64 else 4097.0
    c = a1 * splitter
    hi = c - (c - a1)
    lo = a1 - hi
    p = a1 * a1
    err = ((hi * hi - p) + 2.0 * hi * lo) + lo * lo  # exact a1*a1 - p
    return (p - 4.0 * a2) + err


# A/B history: the r3 single-run wall reads (scan 17.9 vs doubling 19.4)
# and the r4 interleaved wall matrix ("neutral") could not resolve this
# arm inside tunnel noise.  The r5 bit-stable DEVICE metric does:
# doubling 13.28 vs scan 13.66 ms/step at the lane-unpad headline
# (outputs/evidence/r5b/bench_powers_doubling.log vs bench_laneunpad.log,
# same session) — doubling-by-concatenation is now the default;
# GRAFX_TPU_POWERS=scan restores the associative-scan build.
_POWERS_BUILD = _os.environ.get("GRAFX_TPU_POWERS", "doubling")


def _cum_powers(re0, im0, T):
    """Complex cumulative powers ``l^n`` for ``n = 1..T`` of per-row
    eigenvalues ``l = re0 + i im0`` -> ``(re, im)`` arrays ``(M, T)``.

    Default is doubling-by-concatenation (measured faster on the
    device metric — see the A/B note at ``_POWERS_BUILD``;
    ``GRAFX_TPU_POWERS=scan`` restores the ``associative_scan``
    build): the
    length-``2^k`` prefix times its own last element appends the next
    ``2^k`` powers, so the whole sequence is ``ceil(log2 T)`` broadcast
    complex multiplies + concats.  Both are one product ``l^a * l^b``
    (binary split) deep per level, so they share the same float32 error
    class; they differ only in how XLA lowers the data movement.
    """
    if _POWERS_BUILD == "scan":
        re = jnp.broadcast_to(re0[:, None], re0.shape + (T,))
        im = jnp.broadcast_to(im0[:, None], im0.shape + (T,))

        def combine(x, y):
            xr, xi = x
            yr, yi = y
            return (xr * yr - xi * yi, xr * yi + xi * yr)

        return jax.lax.associative_scan(combine, (re, im), axis=1)
    pr, pi = re0[:, None], im0[:, None]
    while pr.shape[1] < T:
        sr, si = pr[:, -1:], pi[:, -1:]  # l^len: last element so far
        nr = pr * sr - pi * si
        ni = pr * si + pi * sr
        pr = jnp.concatenate([pr, nr], axis=1)
        pi = jnp.concatenate([pi, ni], axis=1)
    return pr[:, :T], pi[:, :T]


def _stage_eigen_kernels(bk, ak, T):
    """Blocked state-space kernels for one biquad, expressed in the pole
    pair's eigenbasis.

    Direct-form II state space: ``s[n+1] = A s[n] + B u[n]``,
    ``y[n] = C s[n] + b0 u[n]`` with ``A = [[-a1, -a2], [1, 0]]``,
    ``B = e0``, ``C = [b1 - b0 a1, b2 - b0 a2]`` (reference derivation:
    core/iir.py:63-78; the blocked evaluation is original to this
    rebuild).  The block recursion is run in transformed coordinates
    ``t = P^-1 s`` (suitably rescaled) in which the per-block transition
    ``M`` is:

    * complex pole pair: a scaled rotation ``r^T R(T 8)`` — *normal*;
    * separated real poles: ``diag(l1^T, l2^T)`` — normal;
    * near-double real poles: the Jordan block power
      ``[[m^T, T m^(T-1)], [0, m^T]]`` (upper-triangular with equal
      diagonal; products accumulate the off-diagonal additively with no
      cancellation).

    This choice is the load-bearing numerics decision: in raw companion
    coordinates the cross-block associative scan multiplies non-normal
    matrices whose transient growth (~``min(n, 1/sin 8)``) amplifies
    float32 roundoff catastrophically for poles near the unit circle
    (measured -26 dB at r = 0.9999, pole angle 0.018 from pi); in the
    eigenbasis every branch's scan is contraction/normal (or
    cancellation-free triangular) and the same configuration lands below
    -90 dB.  Pole-type dispatch is per lane via ``jnp.where`` over a
    *compensated* discriminant, mirroring the case analysis of the
    reference's "ssm" backend (core/iir.py:285-338).  Gates: the
    near-unit-circle suite in tests/ops/test_iir.py.

    Args:
        bk, ak: ``(N, 3)`` normalized biquad coefficients.
        T: block length.

    Returns:
        ``(h, K_out, K_in, M)``: ``h (N, T)`` truncated impulse
        response; ``K_out (N, 2, T)`` initial-state response kernels
        (``y_is[n] = sum_s K_out[s, n] t[s]``); ``K_in (N, 2, T)``
        state-injection kernels (``t_in[s] = sum_i K_in[s, i] u[i]``);
        ``M (N, 2, 2)`` block transition (``t' = M t + t_in``).
    """
    N = ak.shape[0]
    dtype = ak.dtype
    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    b0, b1, b2 = bk[:, 0], bk[:, 1], bk[:, 2]
    a1, a2 = ak[:, 1], ak[:, 2]
    c0, c1 = b1 - b0 * a1, b2 - b0 * a2  # C vector

    disc = _compensated_disc(a1, a2)
    mu = -0.5 * a1
    # guarded branch ingredients (guards keep the *unselected* branches
    # NaN-free so jnp.where gradients stay finite)
    dim = 0.5 * jnp.sqrt(jnp.maximum(-disc, tiny))  # Im(l), complex case
    delta = 0.5 * jnp.sqrt(jnp.maximum(disc, tiny))  # (l1 - l2)/2, real
    is_complex = disc < 0
    # Jordan handles only (near-)exactly double real roots, where
    # l1 - l2 underflows the coefficient ulp and the diagonal basis
    # degenerates (l1 == l2 after rounding makes the modal difference
    # identically zero).  Anywhere above ~10 ulp the diagonal branch is
    # measurably more accurate, because treating split poles as a double
    # root perturbs the pole radius by delta — catastrophic when delta
    # is comparable to the distance 1 - r to the unit circle (measured
    # -28 dB at r = 0.999 with a sqrt(eps) threshold).
    jtol = 1e-14 if dtype == jnp.float64 else 1e-6
    is_jordan = (~is_complex) & (delta <= jtol * jnp.abs(mu))

    # cumulative powers n = 1..T;
    # rows = [l_c = mu + i dim | l1 = mu + delta | l2 = mu - delta]
    l1 = mu + delta
    l2 = mu - delta
    re0 = jnp.concatenate([mu, l1, l2])
    im0 = jnp.concatenate([dim, jnp.zeros_like(l1), jnp.zeros_like(l2)])
    Pr, Pi = _cum_powers(re0, im0, T)
    one = jnp.ones((N, 1), dtype)
    zero = jnp.zeros((N, 1), dtype)
    xs = jnp.concatenate([one, Pr[:N]], axis=1)  # Re l_c^n, n = 0..T
    ys = jnp.concatenate([zero, Pi[:N]], axis=1)  # Im l_c^n
    u = jnp.concatenate([one, Pr[N : 2 * N]], axis=1)  # l1^n
    v = jnp.concatenate([one, Pr[2 * N :]], axis=1)  # l2^n

    # --- complex pair: basis P = [[mu, dim], [1, 0]] scaled by dim;
    # M^n = r^n R(n 8) with entries (xs, ys); B~ = (0, 1);
    # C~ = ((c0 mu + c1)/dim, c0)
    dim_s = jnp.maximum(dim, tiny)
    C1c = ((c0 * mu + c1) / dim_s)[:, None]
    C2c = c0[:, None]
    Koc0 = C1c * xs[:, :T] - C2c * ys[:, :T]
    Koc1 = C1c * ys[:, :T] + C2c * xs[:, :T]
    Kic0 = ys[:, :T][:, ::-1]
    Kic1 = xs[:, :T][:, ::-1]
    Mc = jnp.stack(
        [
            jnp.stack([xs[:, T], ys[:, T]], -1),
            jnp.stack([-ys[:, T], xs[:, T]], -1),
        ],
        axis=-2,
    )
    hc = jnp.concatenate([b0[:, None], Koc1[:, : T - 1]], axis=-1)

    # --- separated real poles: diagonal basis scaled by (l1 - l2);
    # B~ = (1, -1); C~ = ((c0 l1 + c1)/(l1-l2), (c0 l2 + c1)/(l1-l2))
    sq_s = jnp.maximum(2.0 * delta, tiny)
    C1r = ((c0 * l1 + c1) / sq_s)[:, None]
    C2r = ((c0 * l2 + c1) / sq_s)[:, None]
    Kor0 = C1r * u[:, :T]
    Kor1 = C2r * v[:, :T]
    Kir0 = u[:, :T][:, ::-1]
    Kir1 = -v[:, :T][:, ::-1]
    zcol = jnp.zeros_like(u[:, T])
    Mr = jnp.stack(
        [
            jnp.stack([u[:, T], zcol], -1),
            jnp.stack([zcol, v[:, T]], -1),
        ],
        axis=-2,
    )
    hr = jnp.concatenate(
        [b0[:, None], (Kor0 - Kor1)[:, : T - 1]], axis=-1
    )

    # --- near-double real poles: Jordan basis P = [[m, 1], [1, 0]]
    # (det -1, no rescale needed); m^n from the l_c row (dim ~ 0 there);
    # B' = (0, 1); C' = (c0 m + c1, c0)
    m_pow = xs  # m^n, n = 0..T
    m_prev = jnp.concatenate([zero, xs[:, :T]], axis=1)  # m^(n-1)
    narr = jnp.arange(T + 1, dtype=dtype)[None, :]
    nm = narr * m_prev  # n m^(n-1); n = 0 entry is 0
    C1j = (c0 * mu + c1)[:, None]
    C2j = c0[:, None]
    Koj0 = C1j * m_pow[:, :T]
    Koj1 = C1j * nm[:, :T] + C2j * m_pow[:, :T]
    Kij0 = nm[:, :T][:, ::-1]
    Kij1 = m_pow[:, :T][:, ::-1]
    Mj = jnp.stack(
        [
            jnp.stack([m_pow[:, T], nm[:, T]], -1),
            jnp.stack([zcol, m_pow[:, T]], -1),
        ],
        axis=-2,
    )
    hj = jnp.concatenate([b0[:, None], Koj1[:, : T - 1]], axis=-1)

    def sel(shape_suffix, c, j, r_):
        cx = is_complex.reshape((N,) + (1,) * len(shape_suffix))
        jd = is_jordan.reshape((N,) + (1,) * len(shape_suffix))
        return jnp.where(cx, c, jnp.where(jd, j, r_))

    h = sel((T,), hc, hj, hr)
    K_out = sel(
        (2, T),
        jnp.stack([Koc0, Koc1], axis=1),
        jnp.stack([Koj0, Koj1], axis=1),
        jnp.stack([Kor0, Kor1], axis=1),
    )
    K_in = sel(
        (2, T),
        jnp.stack([Kic0, Kic1], axis=1),
        jnp.stack([Kij0, Kij1], axis=1),
        jnp.stack([Kir0, Kir1], axis=1),
    )
    M = sel((2, 2), Mc, Mj, Mr)
    return h, K_out, K_in, M


def _biquad_block_stage(x, bk, ak, T):
    """One exact biquad applied to ``x`` with block size ``T``.

    Zero-state response inside each block is a causal FFT convolution
    with the (exactly computed) truncated impulse response; cross-block
    state is carried in the pole pair's eigenbasis (see
    :func:`_stage_eigen_kernels` for why that basis is load-bearing).

    Args:
        x: ``(N, L)``; bk ``(N, 3)`` normalized; ak ``(N, 3)`` normalized.
    """
    return _biquad_block_stage_apply(x, _stage_eigen_kernels(bk, ak, T), T)


def _biquad_block_stage_apply(
    x, kernels, T, toeplitz=None, state_in=None, return_state=False
):
    """Data path of :func:`_biquad_block_stage` on prebuilt kernels.

    ``state_in``/``return_state``: ``(N, 2)`` eigenbasis state carried
    across calls (streaming); ``return_state`` requires ``L % T == 0``.
    """
    h, K_out, K_in, M = kernels
    N, L = x.shape
    num_blocks = -(-L // T)
    pad = num_blocks * T - L
    if return_state and pad:
        raise ValueError(
            f"return_state requires the signal length ({L}) to be a"
            f" multiple of the block size ({T})."
        )
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    xb = xp.reshape(N, num_blocks, T)

    # Zero-state response inside each block: exact since the filter
    # history within a block never exceeds T samples.  One batched MXU
    # matmul against the causal-Toeplitz operator of h for short blocks
    # (prebuilt by biquad_exact_build when cached), causal FFT conv
    # beyond that (see _causal_toeplitz).
    if toeplitz is None and T <= _TOEPLITZ_MAX_T:
        toeplitz = _causal_toeplitz(h)
    if toeplitz is not None:
        y_zs = jnp.einsum("nbq,nqt->nbt", xb, toeplitz, precision=PREC_APPLY)
    else:
        y_zs = fft_convolve(xb, h[:, None, :], mode="causal", pad_mode="pow2")

    # State injected by each block (MXU): t_in[k] = sum_i K_in[:, i] u[k, i]
    s_in = jnp.einsum("nbt,nst->nbs", xb, K_in, precision=PREC_APPLY)  # (N, NB, 2)
    if state_in is not None:
        s_in = s_in.at[:, 0].add(
            jnp.einsum("nij,nj->ni", M, state_in, precision=PREC)
        )

    # Propagate states across blocks: t_{k+1} = M t_k + t_in[k], t_0 = 0
    # (M is normal/triangular in the eigenbasis, so the recurrence is
    # well-conditioned).  Same constant-transition prefix doubling (with
    # its hand-written adjoint) as the cascade path — the generic
    # associative scan over affine-map tuples materializes NB copies of
    # M and was measured ~10x slower at console shapes
    # (benchmarks/propagation_ab.py).
    s_after = _propagate_states(s_in, M)
    first = (
        jnp.zeros_like(s_after[:, :1])
        if state_in is None
        else state_in[:, None]
    )
    s_enter = jnp.concatenate([first, s_after[:, :-1]], axis=1)  # (N, NB, 2)

    # Initial-state response inside each block (MXU)
    y_is = jnp.einsum("nbs,nst->nbt", s_enter, K_out, precision=PREC_APPLY)

    y = (y_zs + y_is).reshape(N, num_blocks * T)
    if return_state:
        return y[:, :L], s_after[:, -1]
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


def biquad_exact_build(Bs, As, block_size: int = 128):
    """Build the parameter-dependent kernels of :func:`biquad_exact` once.

    The kernel build costs ~``K * T`` work and, crucially, unrolls into
    many small XLA ops; when the same filters are applied in several
    render stages (e.g. an EQ type appearing on every console chain and
    the master bus), building once and slicing per stage removes the
    duplicated op streams (the ``precompute`` processor hook).

    Args:
        Bs, As: ``(N, K, 3)`` (un-normalized allowed).

    Returns:
        dict of arrays, leading dim ``N`` (sliceable per node batch).
    """
    b, a = _normalize(Bs, As)
    K = b.shape[-2]
    T = block_size
    if K <= 2:
        ks = [_stage_eigen_kernels(b[:, k], a[:, k], T) for k in range(K)]
        cache = {
            "h": jnp.stack([k_[0] for k_ in ks], 1),
            "K_out": jnp.stack([k_[1] for k_ in ks], 1),
            "K_in": jnp.stack([k_[2] for k_ in ks], 1),
            "M": jnp.stack([k_[3] for k_ in ks], 1),
        }
        if T <= _TOEPLITZ_MAX_T:
            cache["Toep"] = jnp.stack(
                [_causal_toeplitz(k_[0]) for k_ in ks], 1
            )
        return cache
    H, W, V, A = _cascade_kernels_doubling(b, a, T)
    cache = {"H": H, "W": W, "V": V, "A": A}
    if T <= _TOEPLITZ_MAX_T:
        cache["Toep"] = _causal_toeplitz(H)
    return cache


def biquad_exact_apply(
    x, cache, block_size: int = 128, state_in=None, return_state=False
):
    """Apply kernels from :func:`biquad_exact_build` to ``(N, L)``
    signals.  Exact for any ``L`` (shorter signals just waste block
    padding).

    ``state_in``/``return_state`` carry the filter state across calls
    for block-wise streaming (``return_state`` requires ``L`` to be a
    multiple of ``block_size``).  The state layout matches the cache:
    ``(N, S)`` for the single-pass cascade (``S = 2 K``), ``(N, K, 2)``
    for the per-stage path; :func:`biquad_exact_zero_state` builds the
    initial zeros.
    """
    T = block_size
    if "H" in cache:
        return _biquad_block_cascade_apply(
            x,
            (cache["H"], cache["W"], cache["V"], cache["A"]),
            T,
            toeplitz=cache.get("Toep"),
            state_in=state_in,
            return_state=return_state,
        )
    y = x
    toep = cache.get("Toep")
    states_out = []
    for k in range(cache["h"].shape[1]):
        kernels = (
            cache["h"][:, k],
            cache["K_out"][:, k],
            cache["K_in"][:, k],
            cache["M"][:, k],
        )
        result = _biquad_block_stage_apply(
            y,
            kernels,
            T,
            toeplitz=None if toep is None else toep[:, k],
            state_in=None if state_in is None else state_in[:, k],
            return_state=return_state,
        )
        if return_state:
            y, s_k = result
            states_out.append(s_k)
        else:
            y = result
    if return_state:
        return y, jnp.stack(states_out, axis=1)
    return y


def biquad_exact_zero_state(cache, num_signals):
    """Zero initial state matching ``cache``'s layout for
    :func:`biquad_exact_apply` streaming."""
    if "H" in cache:
        S = cache["W"].shape[-2]
        return jnp.zeros((num_signals, S), cache["W"].dtype)
    K = cache["h"].shape[1]
    return jnp.zeros((num_signals, K, 2), cache["h"].dtype)


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
# All parameter-dependent kernels (W, V, A_blk) are built by log-depth
# pairwise composition of per-stage eigenbasis kernels on length-T
# signals — independent of L.


def _tconv(x, h, T):
    """Truncated causal convolution ``(x * h)[0:T]`` of length-``T``
    causal signals (exact: lags < T are alias-free at FFT size 2T)."""
    n = 2 * T
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=n) * jnp.fft.rfft(h, n=n), n=n)
    return y[..., :T]


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

    # per-stage primitive kernels in each pole pair's eigenbasis
    # (the numerics rationale lives in _stage_eigen_kernels)
    h_f, K_out_f, K_in_f, M_f = _stage_eigen_kernels(
        b.reshape(N * K, 3), a.reshape(N * K, 3), T
    )
    h = h_f.reshape(N, K, T)
    CA = K_out_f.reshape(N, K, 2, T)  # per-state ISR signals
    W_stage = K_in_f.reshape(N, K, 2, T)  # per-state injection kernels
    AT = M_f.reshape(N, K, 2, 2)  # per-stage block transition

    # pad stages to K_pad with identity stages: h = delta, all state
    # kernels zero (the extra states never charge or discharge)
    if K_pad != K:
        pad_n = K_pad - K
        delta = jnp.zeros((N, pad_n, T), h.dtype).at[..., 0].set(1.0)
        h = jnp.concatenate([h, delta], axis=1)
        CA = jnp.concatenate([CA, jnp.zeros((N, pad_n, 2, T), h.dtype)], 1)
        W_stage = jnp.concatenate(
            [W_stage, jnp.zeros((N, pad_n, 2, T), h.dtype)], 1
        )
        AT = jnp.concatenate([AT, jnp.zeros((N, pad_n, 2, 2), h.dtype)], 1)

    # initial groups: one stage each. Group tensors (N, G, R, T) etc.
    G = K_pad
    H = h[:, :, None, :][..., 0, :]  # (N, G, T)
    V = CA  # (N, G, 2, T)
    W = W_stage  # (N, G, 2, T); K_in is already the reversed power seq
    A = AT  # (N, G, 2, 2)

    n2 = 2 * T

    def tconv_freq(Xf, Yf):
        return jnp.fft.irfft(Xf * Yf, n=n2)[..., :T]

    use_toeplitz = _CASCADE_COMPOSE == "toeplitz" and T <= _TOEPLITZ_MAX_T

    while G > 1:
        H1, H2 = H[:, 0::2], H[:, 1::2]  # (N, G/2, T)
        V1, V2 = V[:, 0::2], V[:, 1::2]  # (N, G/2, R, T)
        W1, W2 = W[:, 0::2], W[:, 1::2]
        A1, A2 = A[:, 0::2], A[:, 1::2]  # (N, G/2, R, R)

        if use_toeplitz:
            # Truncated causal convs of length-T kernels as MXU matmuls
            # against the downstream/upstream causal-Toeplitz operators
            # (round-2 on-chip measurement: at T=128 the Toeplitz matmul
            # is ~15x fewer FLOPs than XLA's matmul-based radix FFTs —
            # the same trade the per-block ZSR makes).  One operator per
            # pair serves all R rows.  GRAFX_TPU_CASCADE_COMPOSE=fft
            # keeps the FFT composition for A/B.
            T2 = _causal_toeplitz_nd(H2)  # (N, G/2, T, T): H2[t - q]
            T1 = _causal_toeplitz_nd(H1)
            H = jnp.einsum("ngq,ngqt->ngt", H1, T2, precision=PREC)
            V1H2 = jnp.einsum("ngrq,ngqt->ngrt", V1, T2, precision=PREC)
            W2c = jnp.einsum(
                "ngrq,ngqt->ngrt", W2[..., ::-1], T1, precision=PREC
            )[..., ::-1]
        else:
            H1f = jnp.fft.rfft(H1, n=n2)
            H2f = jnp.fft.rfft(H2, n=n2)
            V1f = jnp.fft.rfft(V1, n=n2)
            W2rf = jnp.fft.rfft(W2[..., ::-1], n=n2)

            H = tconv_freq(H1f, H2f)
            V1H2 = tconv_freq(V1f, H2f[..., None, :])
            W2c = tconv_freq(H1f[..., None, :], W2rf)[..., ::-1]
        B = jnp.einsum("ngst,ngrt->ngsr", W2, V1, precision=PREC)  # (N, G/2, R2, R1)

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


# On-chip A/B history: r3's single-run logs said gather 18.0 ms vs
# reshape 19.4 ms, but the r4 variance-aware matrix (3 interleaved
# rounds x 5 windows, benchmarks/ab_matrix.py; BASELINE.md "Adjudicated
# on-chip A/B") reversed it: reshape 21.7/21.9/21.9 ms run-medians vs
# gather 21.8/22.4/22.9 — reshape is ~0.5 ms faster AND tighter, so
# reshape (contiguous copies; reshape/pad adjoint, no scatter) is the
# default.  The r3 numbers were single runs inside ~1.5 ms tunnel noise.
_TOEPLITZ_BUILD = _os.environ.get("GRAFX_TPU_TOEPLITZ_BUILD", "reshape")
# Cascade-operator composition: "fft" truncated convs (default) or
# "toeplitz" MXU matmuls.  The Toeplitz form is slightly more accurate
# and mirrors the ZSR trade that won on-chip in round 2, but measured
# 3x SLOWER on CPU (geq-like grad step 62 -> 195 ms — the (N, G/2, T, T)
# operators are expensive without an MXU), so it stays opt-in until the
# on-chip A/B (benchmarks/on_chip_checklist.sh) decides for TPU.
_CASCADE_COMPOSE = _os.environ.get("GRAFX_TPU_CASCADE_COMPOSE", "fft")


def _causal_toeplitz_nd(h):
    """:func:`_causal_toeplitz` for any leading batch dims:
    ``(..., T) -> (..., T, T)`` with ``Op[..., q, t] = h[..., t - q]``."""
    lead = h.shape[:-1]
    T = h.shape[-1]
    out = _causal_toeplitz(h.reshape((-1, T)))
    return out.reshape(lead + (T, T))


def _causal_toeplitz(h):
    """``(N, T)`` causal IR -> ``(N, T, T)`` causal Toeplitz operator
    ``Op[n, q, t] = h[n, t - q]`` (zero below the anti-causal diagonal).

    Lets the per-block zero-state response run as ONE batched MXU matmul
    (``y_zs[b] = x[b] @ Op``) instead of an FFT convolution: at block
    length T=128 that is ~15x fewer FLOPs than the radix/matmul FFTs XLA
    emits on TPU, in exactly the MXU's favorite shape.

    Default construction is the pad+tile+reshape trick (row ``q`` of
    the ``2T``-periodic tiling of ``[h, 0]`` at stride ``2T - 1`` is
    ``[h, 0]`` rolled by ``q``): contiguous copies only, so both the
    build and its adjoint lower to reshapes/pads — measured faster and
    tighter than the gather under the r4 interleaved A/B (see the note
    at ``_TOEPLITZ_BUILD``).  ``GRAFX_TPU_TOEPLITZ_BUILD=gather``
    selects the clip+where gather construction (whose adjoint is a
    scatter)."""
    N, T = h.shape
    if _TOEPLITZ_BUILD == "reshape":
        z = jnp.concatenate([h, jnp.zeros_like(h)], axis=-1)  # (N, 2T)
        zt = jnp.tile(z, (1, T))[:, : T * (2 * T - 1)].reshape(
            N, T, 2 * T - 1
        )
        return zt[:, :, :T]
    idx = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # t - q
    gathered = h[:, jnp.clip(idx, 0, T - 1)]
    return jnp.where(idx >= 0, gathered, jnp.zeros_like(gathered))


# Toeplitz ZSR memory is N*T^2 floats; beyond this block length fall
# back to the FFT convolution.
_TOEPLITZ_MAX_T = 256


def _biquad_block_cascade(x, b, a, T):
    """Exact biquad cascade via the single-pass blocked operator.

    Args:
        x: ``(N, L)``; b, a: ``(N, K, 3)`` normalized.
    """
    return _biquad_block_cascade_apply(x, _cascade_kernels_doubling(b, a, T), T)


def _doubling_flat(v, A, transpose):
    """Single-level prefix doubling: ``v[k] += A^(2^l) v[k -+ 2^l]``."""
    num_blocks = v.shape[-2]
    out = v
    P = A
    shift = 1
    while shift < num_blocks:
        pad_lead = [(0, 0)] * (out.ndim - 2)
        if transpose:
            shifted = jnp.pad(out, pad_lead + [(0, shift), (0, 0)])[..., shift:, :]
            out = out + jnp.einsum(
                "nji,n...bj->n...bi", P, shifted, precision=PREC_APPLY
            )
        else:
            shifted = jnp.pad(out, pad_lead + [(shift, 0), (0, 0)])[
                ..., :num_blocks, :
            ]
            out = out + jnp.einsum(
                "nij,n...bj->n...bi", P, shifted, precision=PREC_APPLY
            )
        P = jnp.einsum("nij,njk->nik", P, P, precision=PREC)
        shift *= 2
    return out


def _doubling_apply(v, A, transpose):
    """Linear-recurrence solve ``out[k] = v[k] + A out[k-1]`` (forward)
    or its time-reversed transpose, via prefix doubling.  (A two-level
    grouped decomposition was measured slower on TPU — the grouped
    einsums batch worse than the straight full-size rounds.)"""
    return _doubling_flat(v, A, transpose)


@jax.custom_vjp
def _propagate_states(s_in, A):
    """Cross-block state propagation ``s[k] = A s[k-1] + s_in[k]``
    (``s[-1] = 0``) for a constant per-item transition ``A``.

    The transition matrix is the same for every block, so instead of a
    generic associative scan over (M, v) pairs (which materializes NB
    copies of M and multiplies them at every level), prefix doubling
    runs on the vectors alone.  The hand-written adjoint (the classic
    linear-recurrence result) avoids autodiff transposing through the
    matrix-squaring chain:

        lambda[k] = g[k] + A^T lambda[k+1]   (reverse doubling)
        ds_in = lambda,   dA = sum_k lambda[k] s[k-1]^T
    """
    return _doubling_apply(s_in, A, transpose=False)


def _propagate_states_fwd(s_in, A):
    s_after = _doubling_apply(s_in, A, transpose=False)
    return s_after, (s_after, A)


def _propagate_states_bwd(res, g):
    s_after, A = res
    lam = _doubling_apply(g, A, transpose=True)
    s_prev = jnp.concatenate(
        [jnp.zeros_like(s_after[:, :1]), s_after[:, :-1]], axis=1
    )
    dA = jnp.einsum("nbi,nbj->nij", lam, s_prev, precision=PREC)
    return lam, dA


_propagate_states.defvjp(_propagate_states_fwd, _propagate_states_bwd)


def _biquad_block_cascade_apply(
    x, kernels, T, toeplitz=None, state_in=None, return_state=False
):
    """Data path of :func:`_biquad_block_cascade` on prebuilt kernels.

    ``state_in``/``return_state`` thread the ``S``-dim eigenbasis state
    across calls for block-wise streaming; ``return_state`` requires
    ``L % T == 0`` (zero-padding a partial final block would evolve the
    carried state past sample ``L``).
    """
    H_cas, W, V, A_blk = kernels
    N, L = x.shape
    num_blocks = -(-L // T)
    pad = num_blocks * T - L
    if return_state and pad:
        raise ValueError(
            f"return_state requires the signal length ({L}) to be a"
            f" multiple of the block size ({T})."
        )
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    xb = xp.reshape(N, num_blocks, T)

    S = W.shape[1]

    # (1) zero-state response: one batched MXU matmul against the
    # causal-Toeplitz operator (see _causal_toeplitz), FFT fallback for
    # long blocks
    if toeplitz is None and T <= _TOEPLITZ_MAX_T:
        toeplitz = _causal_toeplitz(H_cas)
    if toeplitz is not None:
        y_zs = jnp.einsum("nbq,nqt->nbt", xb, toeplitz, precision=PREC_APPLY)
    else:
        y_zs = fft_convolve(xb, H_cas[:, None, :], mode="causal", pad_mode="pow2")

    # (2) per-block state injection (MXU)
    s_in = jnp.einsum("nbt,nst->nbs", xb, W, precision=PREC_APPLY)  # (N, NB, S)
    if state_in is not None:
        s_in = s_in.at[:, 0].add(
            jnp.einsum("nij,nj->ni", A_blk, state_in, precision=PREC)
        )

    # (3) cross-block state propagation (custom VJP; see
    # _propagate_states)
    s_after = _propagate_states(s_in, A_blk)
    first = (
        jnp.zeros_like(s_after[:, :1])
        if state_in is None
        else state_in[:, None]
    )
    s_enter = jnp.concatenate([first, s_after[:, :-1]], axis=1)  # (N, NB, S)

    # (4) initial-state responses (MXU)
    y_is = jnp.einsum("nbs,nst->nbt", s_enter, V, precision=PREC_APPLY)

    y = (y_zs + y_is).reshape(N, num_blocks * T)
    if return_state:
        return y[:, :L], s_after[:, -1]
    return y[:, :L]


# ---------------------------------------------------------------------------
# First-order (one-pole) exact filter, blocked
# ---------------------------------------------------------------------------


def onepole_exact(
    x, alpha, block_size: int = 1024, state_in=None, return_state=False
):
    """Exact one-pole smoother ``y[n] = alpha y[n-1] + (1 - alpha) x[n]``.

    Blocked closed-form analogue of :func:`biquad_exact` for first-order
    filters (scalar state, powers in closed form).  Replaces the
    reference's truncated-FIR approximation (core/envelope.py:10-60) with
    an exact filter when requested.

    Args:
        x: ``(N, L)``.
        alpha: ``(N,)`` in ``(0, 1)``.
        state_in: optional ``(N,)`` previous output sample ``y[-1]``
            (streaming continuation; defaults to zero).
        return_state: also return ``y[L-1]`` as the carried state, for
            block-wise streaming.  Requires ``L`` to be a multiple of
            the internal block length only for efficiency, not
            correctness (the final state is read from ``y`` directly).
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
    s_in = jnp.einsum("nbt,nt->nb", xb, F, precision=PREC_APPLY)
    if state_in is not None:
        s_in = s_in.at[:, 0].add(alpha_T * state_in)

    # scalar prefix doubling: s[k] = alpha_T s[k-1] + s_in[k] (the
    # associative scan over (m, v) pairs materializes NB copies of the
    # constant coefficient and multiplies them at every level)
    s_after = s_in
    P = alpha_T
    shift = 1
    while shift < num_blocks:
        shifted = jnp.pad(s_after, ((0, 0), (shift, 0)))[:, :num_blocks]
        s_after = s_after + P[:, None] * shifted
        P = P * P
        shift *= 2
    first = (
        jnp.zeros_like(s_after[:, :1])
        if state_in is None
        else state_in[:, None]
    )
    s_enter = jnp.concatenate([first, s_after[:, :-1]], axis=1)

    y = (y_zs + powers[:, None, :] * alpha[:, None, None] * s_enter[..., None]).reshape(
        N, num_blocks * T
    )
    y = y[:, :L]
    if return_state:
        return y, y[:, -1]
    return y

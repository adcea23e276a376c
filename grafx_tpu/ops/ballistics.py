"""Attack/release ballistics smoothing with a custom VJP.

TPU-native replacement for ``torchcomp.compressor_core`` (used by the
reference at src/grafx/processors/core/envelope.py:63-101).  Semantics
follow torchcomp: with smoothing factors ``at`` (attack) and ``rt``
(release) and initial state ``zi``,

    y[n] = (1 - c[n]) * y[n-1] + c[n] * u[n],
    c[n] = at  if u[n] > y[n-1]  else  rt.

The per-sample coefficient choice depends on the running state, so the
forward pass is a true sequential recursion (not associative).  We provide:

* a ``lax.scan`` forward (works on any backend; used for CPU tests), and
* a Pallas TPU kernel that runs the recursion on-chip with the channel
  batch across vector lanes (grafx_tpu/ops/ballistics_tpu.py).

The backward pass is *linear* once the forward decisions are fixed, so it
is a parallel ``associative_scan`` — no sequential kernel needed for
gradients (decisions are treated as constants, matching torchcomp's
hand-derived backward).  The decisions themselves are recomputed in the
backward from the saved outputs (``attack[n] = u[n] > y[n-1]``), so the
forward does not need to materialize a mask.
"""

import functools

import jax
import jax.numpy as jnp

_FORCE_BACKEND = None  # None = auto, "scan", "pallas"


def set_backend(name):
    """Force the forward backend: ``None`` (auto), ``"scan"``, ``"pallas"``."""
    global _FORCE_BACKEND
    _FORCE_BACKEND = name


def _use_pallas():
    if _FORCE_BACKEND == "scan":
        return False
    if _FORCE_BACKEND == "pallas":
        return True
    # 'axon' is the tunneled single-chip TPU platform name.
    return jax.default_backend() in ("tpu", "axon")


def _forward_scan(u, zi, at, rt):
    def step(y_prev, u_n):
        c = jnp.where(u_n > y_prev, at, rt)
        y = y_prev + c * (u_n - y_prev)
        return y, y

    _, y = jax.lax.scan(step, zi, u.T)
    return y.T


def _forward(u, zi, at, rt):
    if _use_pallas():
        from grafx_tpu.ops.ballistics_tpu import forward_pallas

        return forward_pallas(u, zi, at, rt)
    return _forward_scan(u, zi, at, rt)


@jax.custom_vjp
def ballistics_core(u, zi, at, rt):
    """Attack/release one-pole smoother.

    Args:
        u: ``(N, L)`` input envelopes.
        zi: ``(N,)`` initial conditions.
        at: ``(N,)`` attack smoothing factor in ``(0, 1)``.
        rt: ``(N,)`` release smoothing factor in ``(0, 1)``.

    Returns:
        ``(N, L)`` smoothed envelopes.
    """
    return _forward(u, zi, at, rt)


def _ballistics_fwd(u, zi, at, rt):
    if _use_pallas():
        # Run and save residuals in the padded time-major kernel layout:
        # the backward kernel consumes the same layout, so the whole VJP
        # needs only one transpose in (u, g each) and one out (y, du)
        # instead of re-padding/transposing around every kernel call.
        # The only saved full-length residual is d[n] = u[n] - y[n-1]: it
        # encodes both the attack/release decisions (d > 0) and the dc
        # factor, so neither u nor y needs to be kept.
        from grafx_tpu.ops.ballistics_tpu import (
            LANES,
            expand_lanes,
            forward_pallas_tm_d,
            pad_time_major,
        )

        N, L = u.shape
        S = -(-N // LANES)
        ut = pad_time_major(u)
        yt, dt = forward_pallas_tm_d(
            ut, expand_lanes(zi, S), expand_lanes(at, S), expand_lanes(rt, S)
        )
        y = yt[:L, :N].T
        return y, (dt, at, rt)
    y = _forward_scan(u, zi, at, rt)
    return y, (u, y, zi, at, rt)


def _ballistics_bwd(res, g):
    # dispatch on the residual arity, not the (mutable) backend global:
    # the pallas fwd saves 3 residuals, the scan fwd 5
    if len(res) == 3:
        return _ballistics_bwd_pallas(res, g)
    u, y, zi, at, rt = res
    y_prev = jnp.concatenate([zi[:, None], y[:, :-1]], axis=1)
    attack = u > y_prev
    c = jnp.where(attack, at[:, None], rt[:, None])  # (N, L)

    # Adjoint recursion (reverse time):  gh[n] = g[n] + (1 - c[n+1]) gh[n+1].
    a = jnp.concatenate([1.0 - c[:, 1:], jnp.zeros_like(c[:, :1])], axis=1)

    def combine(inner, outer):
        a_i, b_i = inner
        a_o, b_o = outer
        return a_o * a_i, a_o * b_i + b_o

    _, gh = jax.lax.associative_scan(combine, (a, g), axis=1, reverse=True)

    du = c * gh
    dc = (u - y_prev) * gh
    dat = jnp.sum(jnp.where(attack, dc, 0.0), axis=1)
    drt = jnp.sum(jnp.where(attack, 0.0, dc), axis=1)
    dzi = (1.0 - c[:, 0]) * gh[:, 0]
    return du, dzi, dat, drt


def _ballistics_bwd_pallas(res, g):
    """Backward pass as ONE fused Pallas kernel in the padded time-major
    layout — no full-length HBM temporaries beyond (d, g, du)."""
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        backward_fused_pallas_tm,
        expand_lanes,
        pad_time_major,
    )

    dt, at, rt = res
    N, L = g.shape
    Lp, Np = dt.shape
    S = -(-Np // LANES)
    gt = pad_time_major(g)

    du_t, dat2, drt2, dzi2 = backward_fused_pallas_tm(
        dt, gt, expand_lanes(at, S), expand_lanes(rt, S)
    )
    du = du_t[:L, :N].T
    # per-lane outputs come back as (8*S, LANES) with broadcast rows
    dat = dat2[::8].reshape(-1)[:N]
    drt = drt2[::8].reshape(-1)[:N]
    dzi = dzi2[::8].reshape(-1)[:N]
    return du, dzi, dat, drt


ballistics_core.defvjp(_ballistics_fwd, _ballistics_bwd)


# ---------------------------------------------------------------------------
# Fused smoother + quadratic-knee gain (Pallas-only fast path)
# ---------------------------------------------------------------------------


def fused_gain_available():
    """The fused compressor/gate gain path runs where Pallas does."""
    return _use_pallas()


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ballistics_gain_core(u, zi, at, rt, th, cf, hk, kind="compressor"):
    """Ballistics smoothing + quadratic-knee gain in one fused op.

    Computes ``gain = exp(cf * f(log(smooth(u)) + 1e-5) - th))`` where
    ``smooth`` is the attack/release one-pole recursion and ``f`` the
    quadratic knee (compressor or noise-gate flavor; see
    ops/ballistics_tpu.py).  Equivalent to composing
    :func:`ballistics_core` with the processor's knee math, but the
    whole epilogue and its adjoint live inside the Pallas kernels —
    fewer HBM round-trips and ~40 fewer XLA ops per call site.

    Args:
        u: ``(N, L)`` energy envelopes.
        zi, at, rt: ``(N,)`` recursion constants.
        th: ``(N,)`` log-threshold (already shifted by -6).
        cf: ``(N,)`` knee coefficient (``1/ratio - 1`` for compressors,
            ``ratio - 1`` for gates).
        hk: ``(N,)`` half-knee ``exp(log_knee) / 2``.
        kind: ``"compressor"`` or ``"noisegate"`` (static).

    Returns:
        ``(N, L)`` gains.
    """
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        expand_lanes,
        forward_gain_only_pallas_tm,
        pad_time_major,
    )

    N, L = u.shape
    S = -(-N // LANES)
    gain_t = forward_gain_only_pallas_tm(
        pad_time_major(u),
        expand_lanes(zi, S),
        expand_lanes(at, S),
        expand_lanes(rt, S),
        expand_lanes(th, S),
        expand_lanes(cf, S),
        expand_lanes(hk, S),
        kind=kind,
    )
    return gain_t[:L, :N].T


def _gain_fwd(u, zi, at, rt, th, cf, hk, kind):
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        expand_lanes,
        forward_gain_pallas_tm,
        pad_time_major,
    )

    N, L = u.shape
    S = -(-N // LANES)
    ut = pad_time_major(u)
    gain_t, dt, ylast = forward_gain_pallas_tm(
        ut,
        expand_lanes(zi, S),
        expand_lanes(at, S),
        expand_lanes(rt, S),
        expand_lanes(th, S),
        expand_lanes(cf, S),
        expand_lanes(hk, S),
        kind=kind,
    )
    # ut is already materialized for the kernel, so keeping it as a
    # residual costs nothing; y is reconstructed in the backward from
    # u - d and the final-state seed
    return gain_t[:L, :N].T, (dt, ut, ylast, at, rt, th, cf, hk)


def _gain_bwd(kind, res, g):
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        backward_gain_pallas_tm,
        expand_lanes,
        pad_time_major,
    )

    dt, ut, ylast, at, rt, th, cf, hk = res
    N, L = g.shape
    Lp, Np = dt.shape
    S = -(-Np // LANES)
    ggt = pad_time_major(g)
    du_t, dat2, drt2, dzi2, dth2, dcf2, dhk2 = backward_gain_pallas_tm(
        dt, ut, ylast, ggt,
        expand_lanes(at, S),
        expand_lanes(rt, S),
        expand_lanes(th, S),
        expand_lanes(cf, S),
        expand_lanes(hk, S),
        kind=kind,
    )
    du = du_t[:L, :N].T
    pick = lambda v: v[::8].reshape(-1)[:N]
    return (
        du,
        pick(dzi2),
        pick(dat2),
        pick(drt2),
        pick(dth2),
        pick(dcf2),
        pick(dhk2),
    )


ballistics_gain_core.defvjp(_gain_fwd, _gain_bwd)


# ---------------------------------------------------------------------------
# Fused dynamics-pair gain (gate -> compressor in one walk; Pallas-only)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def ballistics_gain_pair_core(
    u,
    at_a, rt_a, th_a, cf_a, hk_a,
    at_b, rt_b, th_b, cf_b, hk_b,
    kinds=("noisegate", "compressor"),
    inits=(1.0, 1.0),
):
    """Two chained ballistics+quadratic-knee gain stages in ONE walk.

    Computes ``gain = g_a * g_b`` where ``g_a`` is the first stage's
    fused smoother+knee gain on the input energy ``u`` (initial state
    ``inits[0]``), and ``g_b`` the second stage's gain on the gated energy
    ``g_a^2 * u`` — i.e. exactly the composition of two
    :func:`ballistics_gain_core` stages with the intermediate signal
    eliminated.  Used by the "dynamics" graph-fusion family
    (render/fuse.py FusedDynamicsChain) for serial gate -> compressor
    runs; both recursions and the complete adjoint live in single
    Pallas kernels (ops/ballistics_tpu.py).

    Args:
        u: ``(N, L)`` input energy envelopes.
        at_a..hk_a: ``(N,)`` first-stage recursion/knee constants.
            An exact ONE-POLE smoothed stage maps onto the same
            recursion with ``at == rt == 1 - alpha`` and init 0.0
            (its trailing relu is a no-op on nonnegative energy), so
            iir_exact-smoothed members ride the same walk.
        at_b..hk_b: ``(N,)`` second-stage constants.
        kinds: static pair of ``"compressor"``/``"noisegate"``.
        inits: static per-stage initial envelope (1.0 for ballistics
            members, 0.0 for exact one-pole members).

    Returns:
        ``(N, L)`` combined gains.
    """
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        expand_lanes,
        forward_gain_pair_pallas_tm,
        pad_time_major,
    )

    N, L = u.shape
    S = -(-N // LANES)
    ex = lambda v: expand_lanes(v, S)
    gain_t = forward_gain_pair_pallas_tm(
        pad_time_major(u),
        (ex(at_a), ex(rt_a), ex(th_a), ex(cf_a), ex(hk_a)),
        (ex(at_b), ex(rt_b), ex(th_b), ex(cf_b), ex(hk_b)),
        kinds=kinds,
        with_residuals=False,
        inits=inits,
    )
    return gain_t[:L, :N].T


def _gain_pair_fwd(
    u, at_a, rt_a, th_a, cf_a, hk_a, at_b, rt_b, th_b, cf_b, hk_b,
    kinds, inits,
):
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        expand_lanes,
        forward_gain_pair_pallas_tm,
        pad_time_major,
    )

    N, L = u.shape
    S = -(-N // LANES)
    ex = lambda v: expand_lanes(v, S)
    consts_a = (ex(at_a), ex(rt_a), ex(th_a), ex(cf_a), ex(hk_a))
    consts_b = (ex(at_b), ex(rt_b), ex(th_b), ex(cf_b), ex(hk_b))
    ut = pad_time_major(u)
    gain_t, da_t, db_t, vlast, ulast = forward_gain_pair_pallas_tm(
        ut, consts_a, consts_b, kinds=kinds, with_residuals=True,
        inits=inits,
    )
    res = (da_t, db_t, ut, vlast, ulast, consts_a, consts_b)
    return gain_t[:L, :N].T, res


def _gain_pair_bwd(kinds, inits, res, g):
    del inits  # the adjoint reconstructs envelopes from residuals
    from grafx_tpu.ops.ballistics_tpu import (
        LANES,
        backward_gain_pair_pallas_tm,
        pad_time_major,
    )

    da_t, db_t, ut, vlast, ulast, consts_a, consts_b = res
    N, L = g.shape
    ggt = pad_time_major(g)
    outs = backward_gain_pair_pallas_tm(
        da_t, db_t, ut, vlast, ulast, ggt, consts_a, consts_b, kinds=kinds
    )
    du_t = outs[0]
    du = du_t[:L, :N].T
    pick = lambda v: v[::8].reshape(-1)[:N]
    return (du,) + tuple(pick(v) for v in outs[1:])


ballistics_gain_pair_core.defvjp(_gain_pair_fwd, _gain_pair_bwd)

"""LTI-chain fusion: fused graphs must render identically (to float
round-off) to the unfused graph, with aux losses preserved and fusion
stopping at nonlinear nodes and fan-ins."""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    Compressor,
    MultitapDelay,
    NewZeroPhaseFIREqualizer,
    STFTMaskedNoiseReverb,
    StereoGain,
)
from grafx_tpu.render import (
    fuse_serial_fir,
    make_render_fn,
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters


def _render(G, procs, params, x):
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    out = make_render_fn(procs, plan, jit=False)(x, params)
    return np.asarray(out[0]), out[1]


def _fused_params_from(params, G2, procs2):
    """Nest the unfused per-type params into the fused types' layout
    (member order == node order, both sorted by node id)."""
    fused = {}
    for t, proc in procs2.items():
        if not t.startswith("fused("):
            if t in params:
                fused[t] = params[t]
            continue
        fused[t] = {
            name: params[name.split("_", 1)[1]]
            for name, _ in proc.members
        }
    return fused


def test_fuse_eq_reverb_chain_matches():
    """The BASELINE config-2 shape: zpeq -> reverb folds into one conv."""
    procs = {
        "zpeq": NewZeroPhaseFIREqualizer(num_frequency_bins=256),
        "reverb": STFTMaskedNoiseReverb(ir_len=4000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "zpeq", "reverb", "out"])

    G2, procs2 = fuse_serial_fir(G, procs)
    fused_types = [t for t in procs2 if t.startswith("fused(")]
    assert fused_types == ["fused(zpeq+reverb)"]
    assert G2.number_of_nodes() == G.number_of_nodes() - 1

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda v: v * 20.0, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**14))

    # Fusion semantics with zero-phase members: the ideal LTI
    # composition == the per-node render of the zero-padded signal
    # (per-node rendering truncates the zero-phase pre-ring at the
    # signal start; see fuse.py docstring).  Exact to round-off:
    P = 4608  # >= reverb ir_len + eq lookahead
    xp = jnp.pad(x, ((0, 0), (0, 0), (P, 0)))
    y_ref_p, _ = _render(G, procs, params, xp)
    ref = y_ref_p[..., P:]
    y_fused, _ = _render(G2, procs2, _fused_params_from(params, G2, procs2), x)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(y_fused - ref).max() / scale < 1e-4

    # ... and matches the plain unfused render everywhere except the
    # truncated-pre-ring influence (audibly identical, ~1% worst-case
    # on white noise)
    y_ref, _ = _render(G, procs, params, x)
    assert np.abs(y_fused - y_ref).max() / scale < 0.05


def test_fuse_multichain_with_gain_delay_and_aux():
    """Two identical gain -> delay -> reverb chains fuse into one
    composite type (still node-batched); the delay's radii_reg aux
    survives fusion.  The compressor between fusable nodes blocks
    fusion across it."""
    procs = {
        "gain": StereoGain(),
        "delay": MultitapDelay(
            segment_len=300, num_segments=3, processor_channel="stereo"
        ),
        "reverb": STFTMaskedNoiseReverb(ir_len=2000),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(2):
        _, last = G.add_serial_chain(["in", "gain", "delay", "comp", "reverb"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))

    G2, procs2 = fuse_serial_fir(G, procs)
    fused_types = sorted(t for t in procs2 if t.startswith("fused("))
    # gain+delay fuse; the lone reverb after the compressor does not
    # (runs need >= 2 members)
    assert fused_types == ["fused(gain+delay)"]
    assert G2.number_of_nodes() == G.number_of_nodes() - 2

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 2**13))
    y_ref, aux_ref = _render(G, procs, params, x)
    y_fused, aux_fused = _render(
        G2, procs2, _fused_params_from(params, G2, procs2), x
    )

    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-4

    def aux_sum(aux_list):
        return sum(float(jnp.sum(v)) for a in aux_list
                   for v in jax.tree.leaves(a))

    # radii_reg flows in both; totals match
    np.testing.assert_allclose(
        aux_sum(aux_fused), aux_sum(aux_ref), rtol=1e-5
    )


def test_fuse_noop_on_non_lti_graph():
    procs = {"comp": Compressor(energy_smoother="ballistics")}
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "comp", "out"])
    G2, procs2 = fuse_serial_fir(G, procs)
    assert G2 is G and set(procs2) == set(procs)


def test_fuse_preserves_mimo_edges():
    """Fusion in a graph with MIMO types must keep the original
    inlet/outlet wiring (regression: the rebuilt config downgraded
    every type to SISO and dropped edge port attributes)."""
    from grafx_tpu.processors import MidSideToStereo, StereoToMidSide

    procs = {
        "gain": StereoGain(),
        "delay": MultitapDelay(
            segment_len=200, num_segments=2, processor_channel="stereo"
        ),
        "s2ms": StereoToMidSide(),
        "ms2s": MidSideToStereo(),
    }
    config = NodeConfigs(
        {
            "gain": {"inlets": ["main"], "outlets": ["main"]},
            "delay": {"inlets": ["main"], "outlets": ["main"]},
            "s2ms": {"inlets": ["main"], "outlets": ["mid", "side"]},
            "ms2s": {"inlets": ["mid", "side"], "outlets": ["main"]},
        }
    )
    G = GRAFX(config=config)
    src = G.add("in")
    g = G.add("gain")
    d = G.add("delay")
    sp = G.add("s2ms")
    mg = G.add("ms2s")
    out = G.add("out")
    G.connect(src, g)
    G.connect(g, d)
    G.connect(d, sp)
    G.connect(sp, mg, outlet="mid", inlet="mid")
    G.connect(sp, mg, outlet="side", inlet="side")
    G.connect(mg, out)

    G2, procs2 = fuse_serial_fir(G, procs)
    assert any(t.startswith("fused(") for t in procs2)
    # the mid/side edges survive with their ports
    ports = sorted(
        (dat["outlet"], dat["inlet"]) for _, _, dat in G2.edges(data=True)
    )
    assert ("mid", "mid") in ports and ("side", "side") in ports

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 2**12))
    y_ref, aux_ref = _render(G, procs, params, x)
    y_fused, _ = _render(G2, procs2, _fused_params_from(params, G2, procs2), x)
    scale = np.abs(y_ref).max() + 1e-9
    # gain+delay run is causal: exact match
    assert np.abs(y_fused - y_ref).max() / scale < 1e-4


# -- IIR-cascade fusion (fuse_serial_lti) ------------------------------


def _iir_chain_setup(backend):
    from grafx_tpu.processors import (
        GraphicEqualizer,
        LowPassFilter,
        ParametricEqualizer,
        PoleZeroFilter,
    )

    procs = {
        "peq": ParametricEqualizer(num_filters=6, backend=backend),
        "geq": GraphicEqualizer(backend=backend),
        "lp": LowPassFilter(backend=backend),
        "pz": PoleZeroFilter(backend=backend),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "peq", "geq", "lp", "pz", "out"])
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(7))
    # non-trivial parameters (empty params make most filters identity)
    params = jax.tree.map(
        lambda a: 0.3
        * jax.random.normal(jax.random.PRNGKey(a.size % 9973), a.shape),
        params,
    )
    return G, procs, params


def test_fuse_iir_cascade_chain_matches():
    """A serial run of exact-backend biquad processors folds into ONE
    cascade (FusedBiquadChain) whose output and gradients match the
    per-node render; the PoleZeroFilter's post-gain is preserved."""
    from grafx_tpu.render import FusedBiquadChain, fuse_serial_lti

    G, procs, params = _iir_chain_setup("exact")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 2**13))
    y_ref, _ = _render(G, procs, params, x)

    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = [t for t in procs2 if t.startswith("fused(")]
    assert fused_types == ["fused(peq+geq+lp+pz)"]
    assert isinstance(procs2[fused_types[0]], FusedBiquadChain)

    params2 = _fused_params_from(params, G2, procs2)
    y_fused, _ = _render(G2, procs2, params2, x)

    scale = np.abs(y_ref).max() + 1e-9
    rel = np.abs(y_fused - y_ref).max() / scale
    assert rel < 1e-4, rel  # both exact-class algorithms, < -80 dB

    # gradient parity member-by-member
    def loss_u(p):
        G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
        out = make_render_fn(procs, prepare_render(G_t), jit=False)(x, p)
        return jnp.sum(out[0] ** 2)

    def loss_f(p):
        G_t = reorder_for_fast_render(convert_to_tensor(G2), method="beam")
        out = make_render_fn(procs2, prepare_render(G_t), jit=False)(x, p)
        return jnp.sum(out[0] ** 2)

    gu = jax.grad(loss_u)(params)
    gf = jax.grad(loss_f)(params2)
    fused = fused_types[0]
    for mname, _ in procs2[fused].members:
        orig = mname.split("_", 1)[1]
        for k, a in gu[orig].items():
            b = gf[fused][mname][k]
            e = np.abs(np.asarray(a - b)).max() / (
                np.abs(np.asarray(a)).max() + 1e-9
            )
            assert e < 1e-3, (orig, k, e)


def test_fuse_fsm_backend_joins_fir_fusion():
    """fsm-backend cascade processors expose their own FIR and join the
    FIR fusion family: convolving member FIRs == applying them in
    sequence (exact, both causal convolutions)."""
    from grafx_tpu.render import FusedFIRChain, fuse_serial_lti

    G, procs, params = _iir_chain_setup("fsm")
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 2**13))
    y_ref, _ = _render(G, procs, params, x)

    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = [t for t in procs2 if t.startswith("fused(")]
    assert fused_types == ["fused(peq+geq+lp+pz)"]
    assert isinstance(procs2[fused_types[0]], FusedFIRChain)

    y_fused, _ = _render(G2, procs2, _fused_params_from(params, G2, procs2), x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 3e-5


def test_fuse_kind_boundary_splits_runs():
    """FIR and IIR fusion families do not mix: a chain of two zero-phase
    FIR EQs followed by two exact-backend filters produces one fused
    type per family."""
    from grafx_tpu.processors import LowPassFilter, ParametricEqualizer
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "zp": NewZeroPhaseFIREqualizer(num_frequency_bins=128),
        "zp2": NewZeroPhaseFIREqualizer(num_frequency_bins=128),
        "peq": ParametricEqualizer(num_filters=4, backend="exact"),
        "lp": LowPassFilter(backend="exact"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "zp", "zp2", "peq", "lp", "out"])
    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = sorted(t for t in procs2 if t.startswith("fused("))
    assert fused_types == ["fused(peq+lp)", "fused(zp+zp2)"]


def test_fuse_skips_midside_iir():
    """midside channel processing is not channel-diagonal; such nodes
    must not join an IIR fusion run."""
    from grafx_tpu.processors import GraphicEqualizer, ParametricEqualizer
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "peq": ParametricEqualizer(
            num_filters=4, backend="exact", processor_channel="midside"
        ),
        "geq": GraphicEqualizer(backend="exact"),
    }
    assert procs["peq"].lti_kind is None
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "peq", "geq", "out"])
    G2, procs2 = fuse_serial_lti(G, procs)
    assert not [t for t in procs2 if t.startswith("fused(")]


def test_fused_iir_chain_streams():
    """FusedBiquadChain's streaming contract: block-wise application
    with carried cascade state reproduces the one-shot output."""
    from grafx_tpu.processors import LowPassFilter, PeakingFilter
    from grafx_tpu.render.fuse import FusedBiquadChain

    members = [
        ("0_pk", PeakingFilter(backend="exact")),
        ("1_lp", LowPassFilter(backend="exact")),
    ]
    chain = FusedBiquadChain(members)
    key = jax.random.PRNGKey(9)
    params = {
        "0_pk": {
            "w0": 0.3 * jax.random.normal(key, (3, 1)),
            "q_inv": jnp.zeros((3, 1)),
            "log_gain": 0.5 * jnp.ones((3, 1)),
        },
        "1_lp": {
            "w0": jnp.ones((3, 1)),
            "q_inv": jnp.zeros((3, 1)),
        },
    }
    x = jax.random.normal(jax.random.PRNGKey(10), (3, 2, 2048))
    y_full = chain(x, **params)

    block = 512
    state, cache = chain.stream_init(2, block, **params)
    outs = []
    for i in range(0, 2048, block):
        y, state = chain.stream_step(x[..., i : i + block], state, cache)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(y_stream), np.asarray(y_full), atol=2e-5
    )


# -- containers join fusion runs ---------------------------------------


def test_fuse_serialchain_container_joins_iir_run():
    """A SerialChain whose members are all exact-backend cascades is
    itself IIR-LTI and fuses with its neighbors."""
    from grafx_tpu.processors import (
        GraphicEqualizer,
        LowPassFilter,
        ParametricEqualizer,
        SerialChain,
    )
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "chain": SerialChain(
            {
                "peq": ParametricEqualizer(num_filters=4, backend="exact"),
                "lp": LowPassFilter(backend="exact"),
            }
        ),
        "geq": GraphicEqualizer(backend="exact"),
    }
    assert procs["chain"].lti_kind == "iir"
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "chain", "geq", "out"])
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(2))
    params = jax.tree.map(
        lambda a: 0.3
        * jax.random.normal(jax.random.PRNGKey(a.size % 7919), a.shape),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**13))
    y_ref, _ = _render(G, procs, params, x)

    G2, procs2 = fuse_serial_lti(G, procs)
    assert [t for t in procs2 if t.startswith("fused(")] == [
        "fused(chain+geq)"
    ]
    y_f, _ = _render(G2, procs2, _fused_params_from(params, G2, procs2), x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_f - y_ref).max() / scale < 1e-4


def test_fuse_drywet_and_parallelmix_join_fir_run():
    """DryWet (internal weight) and ParallelMix of FIR branches are
    FIR-LTI: ``w h + (1-w) d`` / the weighted shift-aligned IR sum.
    Compared against the per-node render of the start-padded signal
    (the zero-phase fused semantics, see module docstring)."""
    from grafx_tpu.processors import DryWet, ParallelMix
    from grafx_tpu.render import fuse_serial_lti

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**13))
    P = 4608

    def check(procs, chain):
        G = GRAFX(config=NodeConfigs(sorted(procs)))
        G.add_serial_chain(["in"] + chain + ["out"])
        params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(3))
        params = jax.tree.map(
            lambda a: 0.3
            * jax.random.normal(jax.random.PRNGKey(a.size % 7919), a.shape),
            params,
        )
        xp = jnp.pad(x, ((0, 0), (0, 0), (P, 0)))
        ref = _render(G, procs, params, xp)[0][..., P:]
        G2, procs2 = fuse_serial_lti(G, procs)
        fused = [t for t in procs2 if t.startswith("fused(")]
        assert fused == ["fused(" + "+".join(chain) + ")"], fused
        y_f, _ = _render(
            G2, procs2, _fused_params_from(params, G2, procs2), x
        )
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(y_f - ref).max() / scale < 1e-4

    dw = DryWet(
        NewZeroPhaseFIREqualizer(num_frequency_bins=128),
        external_param=False,
    )
    assert dw.lti_kind == "fir"
    check(
        {"dw": dw, "reverb": STFTMaskedNoiseReverb(ir_len=2000)},
        ["dw", "reverb"],
    )

    pm = ParallelMix(
        {
            "zp": NewZeroPhaseFIREqualizer(num_frequency_bins=128),
            "dl": MultitapDelay(
                segment_len=200, num_segments=2, processor_channel="stereo"
            ),
        }
    )
    assert pm.lti_kind == "fir"
    check({"pm": pm, "gain": StereoGain()}, ["pm", "gain"])


def test_fuse_containers_stay_opaque_when_mixed():
    """A SerialChain mixing FIR and IIR members (or wrapping a
    non-LTI member) reports lti_kind None and does not fuse; DryWet
    with an external weight is also excluded."""
    from grafx_tpu.processors import (
        DryWet,
        LowPassFilter,
        SerialChain,
    )

    mixed = SerialChain(
        {
            "zp": NewZeroPhaseFIREqualizer(num_frequency_bins=64),
            "lp": LowPassFilter(backend="exact"),
        }
    )
    assert mixed.lti_kind is None
    nonlti = SerialChain(
        {
            "comp": Compressor(energy_smoother="ballistics"),
            "lp": LowPassFilter(backend="exact"),
        }
    )
    assert nonlti.lti_kind is None
    ext = DryWet(NewZeroPhaseFIREqualizer(num_frequency_bins=64))
    assert ext.lti_kind is None


def test_fuse_random_graph_property():
    """Property: for random DAGs mixing causal LTI and nonlinear types,
    the fused graph renders identically (causal members, so no
    pre-ring caveat).  Exercises run detection around fan-ins,
    fan-outs, and kind boundaries."""
    import random as pyrandom

    from grafx_tpu.processors import LowPassFilter, PeakingFilter
    from grafx_tpu.render import fuse_parameters, fuse_serial_lti

    procs = {
        "gain": StereoGain(),  # fir (causal, shift 0)
        "pk": PeakingFilter(backend="exact"),  # iir
        "lp": LowPassFilter(backend="exact"),  # iir
        "comp": Compressor(energy_smoother="ballistics"),  # opaque
    }
    types = list(procs)

    for seed in range(4):
        r = pyrandom.Random(seed)
        G = GRAFX(config=NodeConfigs(sorted(procs)))
        frontier = [G.add("in") for _ in range(2)]
        for _ in range(r.randint(6, 12)):
            t = r.choice(types)
            n = G.add(t)
            src = r.choice(frontier)
            G.connect(src, n)
            # sometimes fan out: keep the source in the frontier too
            if r.random() < 0.4:
                frontier.append(n)
            else:
                frontier[frontier.index(src)] = n
        mix = G.add("mix")
        for e in frontier:
            G.connect(e, mix)
        G.connect(mix, G.add("out"))

        params = create_empty_parameters(
            procs, G, key=jax.random.PRNGKey(seed)
        )
        params = jax.tree.map(
            lambda a: 0.2
            * jax.random.normal(jax.random.PRNGKey(a.size % 4099), a.shape),
            params,
        )
        x = jax.random.normal(jax.random.PRNGKey(seed + 50), (2, 2, 2**12))
        y_ref, _ = _render(G, procs, params, x)

        G2, procs2 = fuse_serial_lti(G, procs)
        params2 = fuse_parameters(params, G, G2, procs2)
        y_f, _ = _render(G2, procs2, params2, x)
        scale = np.abs(y_ref).max() + 1e-9
        rel = np.abs(y_f - y_ref).max() / scale
        assert rel < 2e-4, (seed, rel)


def test_fuse_rng_threading_through_fused_chain():
    """A fused chain containing a stochastic member (resampled-noise
    reverb) still receives per-render RNG: same key => identical
    output, different keys => different noise."""
    from grafx_tpu.render import fuse_serial_lti, make_render_fn

    procs = {
        "zpeq": NewZeroPhaseFIREqualizer(num_frequency_bins=64),
        "reverb": STFTMaskedNoiseReverb(ir_len=1500, fixed_noise=False),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "zpeq", "reverb", "out"])
    G2, procs2 = fuse_serial_lti(G, procs)
    assert [t for t in procs2 if t.startswith("fused(")]

    G_t = reorder_for_fast_render(convert_to_tensor(G2), method="beam")
    render = make_render_fn(procs2, prepare_render(G_t), jit=False)
    params = create_empty_parameters(procs2, G2, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**12))

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    y_a, _, _ = render(x, params, rng=k1)
    y_a2, _, _ = render(x, params, rng=k1)
    y_b, _, _ = render(x, params, rng=k2)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_a2))
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))


# ---------------------------------------------------------------------------
# Dynamics fusion family (gate -> compressor shared-energy gain product)
# ---------------------------------------------------------------------------


def _dyn_graph(gate_smoother, comp_smoother, num_chains=3):
    from grafx_tpu.processors import NoiseGate

    procs = {
        "gate": NoiseGate(energy_smoother=gate_smoother),
        "comp": Compressor(energy_smoother=comp_smoother),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(num_chains):
        _, last = G.add_serial_chain(["in", "gate", "comp"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))
    return G, procs


def test_fuse_dynamics_pair_matches_and_grads():
    """gate -> compressor runs fold into ONE dynamics node whose render
    and parameter gradients match the per-node graph to round-off
    (composed path on CPU; the TPU pair kernel is gated by the
    interpret-mode tests in tests/ops/test_ballistics_pallas.py and
    benchmarks/verify_ballistics_tpu.py on-chip)."""
    from grafx_tpu.render import fuse_serial_lti

    G, procs = _dyn_graph("ballistics", "ballistics")
    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = [t for t in procs2 if t.startswith("fused(")]
    assert fused_types == ["fused(gate+comp)"]
    assert G2.number_of_nodes() == G.number_of_nodes() - 3

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(4))
    # push thresholds into the active range so knees/recursions engage
    params["gate"]["log_threshold"] = params["gate"]["log_threshold"] - 2.0
    params["comp"]["log_threshold"] = params["comp"]["log_threshold"] - 1.0
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 2, 2**12))

    y_ref, _ = _render(G, procs, params, x)
    fused_params = _fused_params_from(params, G2, procs2)
    y_fused, _ = _render(G2, procs2, fused_params, x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-5

    # gradient parity, member by member
    def make_loss(G_, procs_):
        G_t = reorder_for_fast_render(convert_to_tensor(G_), method="beam")
        plan = prepare_render(G_t)
        render = make_render_fn(procs_, plan, jit=False)
        return lambda p: jnp.sum(jnp.square(render(x, p)[0]))

    g_ref = jax.grad(make_loss(G, procs))(params)
    g_fused = jax.grad(make_loss(G2, procs2))(fused_params)
    for member, orig in [("0_gate", "gate"), ("1_comp", "comp")]:
        for k in g_ref[orig]:
            np.testing.assert_allclose(
                np.asarray(g_fused["fused(gate+comp)"][member][k]),
                np.asarray(g_ref[orig][k]),
                rtol=2e-4, atol=1e-5,
                err_msg=f"{member}.{k}",
            )


def test_fuse_dynamics_mixed_smoothers_matches():
    """iir_exact gate -> ballistics compressor (the headline console's
    combination) fuses on the composed path with identical output."""
    from grafx_tpu.render import fuse_serial_lti

    G, procs = _dyn_graph("iir_exact", "ballistics", num_chains=2)
    G2, procs2 = fuse_serial_lti(G, procs)
    assert any(t.startswith("fused(") for t in procs2)

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(6))
    params["gate"]["log_threshold"] = params["gate"]["log_threshold"] - 2.0
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 2**12))
    y_ref, _ = _render(G, procs, params, x)
    y_fused, _ = _render(G2, procs2, _fused_params_from(params, G2, procs2), x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-5


def test_fuse_dynamics_does_not_join_lti_runs():
    """A gain -> gate -> comp chain: the LTI gain must NOT join the
    dynamics run (different kind), and vice versa."""
    from grafx_tpu.processors import NoiseGate
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "gain": StereoGain(),
        "gate": NoiseGate(energy_smoother="ballistics"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "gain", "gate", "comp", "out"])
    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = sorted(t for t in procs2 if t.startswith("fused("))
    assert fused_types == ["fused(gate+comp)"]
    # the lone gain neither fuses nor disappears
    types2 = [G2.nodes[n]["node_type"] for n in G2.nodes]
    assert "gain" in types2


def test_fuse_dynamics_partial_coverage_guard():
    """Dynamics runs fuse only when every node of the member types is
    inside a run: partial fusion would SPLIT the type's serial-walk
    stage (row-count-independent cost) and add a whole walk per
    direction — measured +3.3 ms on the headline console.  A graph
    where some compressors sit outside gate->comp pairs must therefore
    stay unfused by default, and fuse with dynamics_partial=True."""
    from grafx_tpu.processors import NoiseGate
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "gate": NoiseGate(energy_smoother="ballistics"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for i in range(4):
        chain = ["in", "gate", "comp"] if i % 2 == 0 else ["in", "comp"]
        _, last = G.add_serial_chain(chain)
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))

    G2, procs2 = fuse_serial_lti(G, procs)
    assert G2 is G and not any(t.startswith("fused(") for t in procs2)

    G3, procs3 = fuse_serial_lti(G, procs, dynamics_partial=True)
    assert any(t.startswith("fused(") for t in procs3)
    # ... and parity still holds on the partial-fusion path.  With
    # PARTIAL coverage some comp rows stay under the plain type and
    # some move into the composite, so the naive type-copy helper
    # misroutes rows — the schedule-aware fuse_parameters is required.
    from grafx_tpu.render import fuse_parameters

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 2, 2**11))
    y_ref, _ = _render(G, procs, params, x)
    fused_params = fuse_parameters(params, G, G3, procs3, method="beam")
    y_fused, _ = _render(G3, procs3, fused_params, x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-5


def _padded_dyn_graph(num_pairs=2, num_lone_comp=2, num_lone_gate=1):
    """Console-like partial coverage: some chains gate->comp, some
    compressor-only, some gate-only."""
    from grafx_tpu.processors import NoiseGate

    procs = {
        "gate": NoiseGate(energy_smoother="iir_exact"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(num_pairs):
        ends.append(G.add_serial_chain(["in", "gate", "comp"])[1])
    for _ in range(num_lone_comp):
        ends.append(G.add_serial_chain(["in", "comp"])[1])
    for _ in range(num_lone_gate):
        ends.append(G.add_serial_chain(["in", "gate"])[1])
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))
    return G, procs


def test_fuse_dynamics_pad_unifies_the_family():
    """dynamics_pad=True: lone gates/comps join fused(gate+comp) with
    the other member absent, so NO plain dynamics type survives (one
    serial-walk stage instead of a split), and output parity holds via
    the schedule-aware parameter migration."""
    from grafx_tpu.render import fuse_parameters, fuse_serial_lti

    G, procs = _padded_dyn_graph()
    # default guard refuses partial coverage ...
    G0, procs0 = fuse_serial_lti(G, procs)
    assert G0 is G
    # ... padding rescues it
    G2, procs2 = fuse_serial_lti(G, procs, dynamics_pad=True)
    types2 = {G2.nodes[n]["node_type"] for n in G2.nodes}
    assert "fused(gate+comp)" in types2
    assert "gate" not in types2 and "comp" not in types2
    n_fused = sum(
        1 for n in G2.nodes
        if G2.nodes[n]["node_type"] == "fused(gate+comp)"
    )
    assert n_fused == 5  # 2 pairs + 2 lone comps + 1 lone gate

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(12))
    params["gate"]["log_threshold"] = params["gate"]["log_threshold"] - 2.0
    x = jax.random.normal(jax.random.PRNGKey(13), (5, 2, 2**12))
    y_ref, _ = _render(G, procs, params, x)
    fused_params = fuse_parameters(params, G, G2, procs2, method="beam")
    # mask rows flagged for exactly the padded nodes
    absent = np.asarray(fused_params["fused(gate+comp)"]["_absent"])
    assert absent.shape == (5, 2)
    assert absent[:, 0].sum() == 2 and absent[:, 1].sum() == 1
    y_fused, _ = _render(G2, procs2, fused_params, x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-5


def test_fuse_dynamics_pad_grad_parity_and_absent_grads_zero():
    """Gradients of the padded fused render match the per-node graph
    through the (differentiable) parameter migration, and the grads on
    an ABSENT member's zero-filled rows are exactly zero (the presence
    indicator multiplies the knee coefficient gradient-free)."""
    from grafx_tpu.render import fuse_parameters, fuse_serial_lti

    G, procs = _padded_dyn_graph(num_pairs=1, num_lone_comp=1,
                                 num_lone_gate=0)
    G2, procs2 = fuse_serial_lti(G, procs, dynamics_pad=True)

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(14))
    params["gate"]["log_threshold"] = params["gate"]["log_threshold"] - 1.0
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 2, 2**11))
    w = jax.random.normal(jax.random.PRNGKey(16), (1, 2, 2**11))

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    render_u = make_render_fn(procs, prepare_render(G_t), jit=False)
    G2_t = reorder_for_fast_render(convert_to_tensor(G2), method="beam")
    render_f = make_render_fn(procs2, prepare_render(G2_t), jit=False)

    def loss_u(p):
        return jnp.sum(render_u(x, p)[0] * w)

    def loss_f(p):
        return jnp.sum(
            render_f(x, fuse_parameters(p, G, G2, procs2, method="beam"))[0]
            * w
        )

    gu = jax.grad(loss_u)(params)
    gf = jax.grad(loss_f)(params)
    for t in gu:
        for k in gu[t]:
            a, b = np.asarray(gf[t][k]), np.asarray(gu[t][k])
            np.testing.assert_allclose(
                a, b, rtol=2e-4,
                atol=2e-6 * (np.abs(b).max() + 1e-9),
                err_msg=f"{t}.{k}",
            )

    # direct fused-params grads: absent member-A rows exactly zero
    fused_params = fuse_parameters(params, G, G2, procs2, method="beam")

    def loss_direct(fp):
        return jnp.sum(render_f(x, fp)[0] * w)

    gd = jax.grad(loss_direct)(fused_params)["fused(gate+comp)"]
    absent = np.asarray(fused_params["fused(gate+comp)"]["_absent"])
    pad_rows = absent[:, 0] > 0.5
    assert pad_rows.sum() == 1
    gate_member = [n for n, _ in procs2["fused(gate+comp)"].members][0]
    for k, v in gd[gate_member].items():
        assert np.all(np.asarray(v)[pad_rows] == 0.0), k
    # the _absent mask itself receives no gradient (comparison only)
    assert np.all(np.asarray(gd["_absent"]) == 0.0)


def test_fuse_dynamics_pad_streaming_matches():
    """The padded composite streams: the _absent mask rides the stream
    cache and the streamed output matches the one-shot fused render."""
    from grafx_tpu.render import fuse_parameters, fuse_serial_lti
    from grafx_tpu.render.streaming import StreamRenderer

    G, procs = _padded_dyn_graph(num_pairs=1, num_lone_comp=1,
                                 num_lone_gate=0)
    G2, procs2 = fuse_serial_lti(G, procs, dynamics_pad=True)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(17))
    fused_params = fuse_parameters(params, G, G2, procs2, method="beam")

    G2_t = reorder_for_fast_render(convert_to_tensor(G2), method="beam")
    plan2 = prepare_render(G2_t)
    x = jax.random.normal(jax.random.PRNGKey(18), (2, 2, 4096))
    full = np.asarray(
        make_render_fn(procs2, plan2, jit=False)(x, fused_params)[0]
    )

    block = 1024
    streamer = StreamRenderer(procs2, plan2, fused_params, block_len=block)
    state = streamer.init_state()
    outs = []
    for k in range(x.shape[-1] // block):
        y, state = streamer(x[..., k * block : (k + 1) * block], state)
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)
    err = np.abs(streamed - full).max() / (np.abs(full).max() + 1e-9)
    assert err < 1e-5, err


def test_fuse_dynamics_pad_auto_demotes_unmergeable_lones():
    """dynamics_pad="auto": a lone dynamics node that can never
    co-schedule with a genuine run (here a bus compressor downstream of
    the mix of every chain) stays its PLAIN type — padding it would
    swap its single-recursion walk for the costlier pair walk without
    merging any stage — while co-schedulable lone nodes are still
    padded, and parity vs the per-node render holds."""
    from grafx_tpu.processors import NoiseGate
    from grafx_tpu.render import fuse_parameters, fuse_serial_lti

    procs = {
        "gate": NoiseGate(energy_smoother="iir_exact"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(2):
        ends.append(G.add_serial_chain(["in", "gate", "comp"])[1])
    ends.append(G.add_serial_chain(["in", "comp"])[1])  # padable lone
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    bus_comp = G.add("comp")  # unmergeable lone: depends on every chain
    G.connect(mix, bus_comp)
    G.connect(bus_comp, G.add("out"))

    G2, procs2 = fuse_serial_lti(G, procs, dynamics_pad="auto")
    from collections import Counter

    c = Counter(G2.nodes[n]["node_type"] for n in G2.nodes)
    assert c["fused(gate+comp)"] == 3  # 2 genuine + 1 padded lone
    assert c["comp"] == 1  # the bus compressor, demoted
    assert "gate" not in c

    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(21))
    params["gate"]["log_threshold"] = params["gate"]["log_threshold"] - 2.0
    x = jax.random.normal(jax.random.PRNGKey(22), (3, 2, 2**12))
    y_ref, _ = _render(G, procs, params, x)
    fused_params = fuse_parameters(params, G, G2, procs2, method="beam")
    absent = np.asarray(fused_params["fused(gate+comp)"]["_absent"])
    assert absent[:, 0].sum() == 1 and absent[:, 1].sum() == 0
    y_fused, _ = _render(G2, procs2, fused_params, x)
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_fused - y_ref).max() / scale < 1e-5


def test_fuse_dynamics_pad_auto_equals_pad_when_all_mergeable():
    """With every lone node co-schedulable (flat parallel chains),
    "auto" demotes nothing and produces the same rewrite as pad=True."""
    from grafx_tpu.render import fuse_serial_lti

    G, procs = _padded_dyn_graph()
    G_pad, _ = fuse_serial_lti(G, procs, dynamics_pad=True)
    G_auto, _ = fuse_serial_lti(G, procs, dynamics_pad="auto")
    types = lambda g: sorted(g.nodes[n]["node_type"] for n in g.nodes)
    assert types(G_pad) == types(G_auto)

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

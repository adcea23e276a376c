"""Streaming renderer parity: block-wise streamed output must equal the
one-shot full-length render to float32 tolerance.

Streaming (low-latency inference with carried filter/ballistics/conv
state) is a capability beyond the reference; the plan, schedule, and
processors are shared with the one-shot path (VERDICT r2 item 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    Compressor,
    DryWet,
    GraphicEqualizer,
    MultitapDelay,
    NoiseGate,
    ParametricEqualizer,
    SerialChain,
    STFTMaskedNoiseReverb,
    StereoGain,
    TanhDistortion,
)
from grafx_tpu.render import (
    StreamRenderer,
    make_render_fn,
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters


def _stream_vs_full(G, procs, num_sources, L, block, rtol=2e-4, atol=2e-4,
                    seed=0):
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(seed))
    # widen params away from ~0 so processors actually do something
    params = jax.tree.map(lambda v: v * 30.0, params)
    render = make_render_fn(procs, plan)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (num_sources, 2, L))

    full, _, _ = render(x, params)

    streamer = StreamRenderer(procs, plan, params, block_len=block)
    state = streamer.init_state()
    outs = []
    for k in range(L // block):
        y, state = streamer(x[..., k * block : (k + 1) * block], state)
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)

    full = np.asarray(full)
    scale = np.abs(full).max() + 1e-9
    err = np.abs(streamed - full).max()
    assert err / scale < rtol, f"relative error {err / scale:.2e}"
    return err / scale


def test_stream_single_eq():
    procs = {"eq": ParametricEqualizer(num_filters=6, backend="exact")}
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "eq", "out"])
    _stream_vs_full(G, procs, 1, 8192, 1024)


def test_stream_step_many_matches_single_steps():
    """k blocks per dispatch (``step_many``, the multi-block serving
    mode that amortizes the per-dispatch tunnel floor) must equal k
    sequential single-block calls — same scan body, same state carry —
    and hence the one-shot render too."""
    procs = {
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "reverb": STFTMaskedNoiseReverb(ir_len=2000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    _, last = G.add_serial_chain(["in", "eq", "compressor"])
    rev = G.add("reverb")
    G.connect(last, rev)
    mix = G.add("mix")
    G.connect(rev, mix)
    G.connect(last, mix)
    G.connect(mix, G.add("out"))

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(11))
    params = jax.tree.map(lambda v: v * 30.0, params)

    L, block, k = 8192, 512, 4
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 2, L))
    streamer = StreamRenderer(procs, plan, params, block_len=block)

    # single-block reference walk
    state = streamer.init_state()
    singles = []
    for i in range(L // block):
        y, state = streamer(x[..., i * block : (i + 1) * block], state)
        singles.append(np.asarray(y))
    final_single = state

    # k-block batched walk
    state = streamer.init_state()
    many = []
    for g in range(L // block // k):
        xb = jnp.stack(
            [
                x[..., (g * k + i) * block : (g * k + i + 1) * block]
                for i in range(k)
            ]
        )
        yb, state = streamer.step_many(xb, state)
        many.extend(np.asarray(b) for b in yb)

    for i, (a, b) in enumerate(zip(singles, many)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6, err_msg=f"block {i}")
    # carried state converges to the same point
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        final_single,
        state,
    )

    # wrong trailing block length is rejected
    with pytest.raises(ValueError):
        streamer.step_many(x[None, ..., : block - 1], state)


def test_stream_console_graph():
    """Mini console: eq -> (geq) -> noisegate -> compressor -> gain ->
    dist chains, bus mix, reverb send, master — every stateful processor
    family the headline bench uses."""
    procs = {
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir_exact"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=3000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for i in range(3):
        chain = ["in", "eq", "compressor", "gain"]
        if i % 2 == 0:
            chain.insert(1, "geq")
        if i == 1:
            chain.insert(2, "noisegate")
        if i == 2:
            chain.append("dist")
        _, last = G.add_serial_chain(chain)
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    rev = G.add("reverb")
    G.connect(mix, rev)
    master = G.add("mix")
    G.connect(rev, master)
    G.connect(mix, master)
    out = G.add("out")
    G.connect(master, out)
    _stream_vs_full(G, procs, 3, 8192, 1024, rtol=5e-4)


def test_stream_delay_and_container():
    procs = {
        "delay": MultitapDelay(
            segment_len=500, num_segments=4, pre_delay=100,
            processor_channel="stereo",
        ),
        "fx": SerialChain(
            {
                "gain": StereoGain(),
                "drywet": DryWet(
                    ParametricEqualizer(num_filters=4, backend="exact"),
                    external_param=False,
                ),
            }
        ),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "delay", "fx", "out"])
    _stream_vs_full(G, procs, 1, 4096, 512, rtol=5e-4)


def test_stream_rejects_bad_block():
    procs = {"eq": ParametricEqualizer(num_filters=4, backend="exact")}
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "eq", "out"])
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G)
    with pytest.raises(ValueError, match="multiple"):
        StreamRenderer(procs, plan, params, block_len=1000)  # not /128
    streamer = StreamRenderer(procs, plan, params, block_len=1024)
    with pytest.raises(ValueError, match="block length"):
        streamer(jnp.zeros((1, 2, 512)), streamer.init_state())


def test_stream_fused_lti_chain():
    """A fused causal LTI run streams via the composed-IR tail carry;
    streamed == one-shot fused render."""
    from grafx_tpu.processors import MultitapDelay
    from grafx_tpu.render import fuse_serial_fir

    procs = {
        "gain": StereoGain(),
        "delay": MultitapDelay(
            segment_len=400, num_segments=3, processor_channel="stereo"
        ),
        "reverb": STFTMaskedNoiseReverb(ir_len=2500),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "gain", "delay", "reverb", "out"])
    G2, procs2 = fuse_serial_fir(G, procs)
    assert any(t.startswith("fused(") for t in procs2)
    _stream_vs_full(G2, procs2, 1, 8192, 1024, rtol=5e-4, seed=7)


def test_stream_fused_iir_graph():
    """A graph whose serial exact-cascade run was folded by
    fuse_serial_lti streams identically to the full-length render (the
    FusedBiquadChain carries the fused cascade's eigenbasis state)."""
    from grafx_tpu.processors import GraphicEqualizer, LowPassFilter
    from grafx_tpu.render import fuse_serial_lti

    procs = {
        "peq": ParametricEqualizer(num_filters=4, backend="exact"),
        "geq": GraphicEqualizer(backend="exact"),
        "lp": LowPassFilter(backend="exact"),
        "gain": StereoGain(),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(2):
        _, last = G.add_serial_chain(["in", "peq", "geq", "lp", "gain"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))

    G2, procs2 = fuse_serial_lti(G, procs)
    assert any(t.startswith("fused(") for t in procs2)
    _stream_vs_full(G2, procs2, 2, 2**13, 1024, seed=11)


def test_stream_stateful_stage_behind_fanin():
    """A stateful bus (ballistics compressor) fed by a mix fan-in of
    several chains — the realistic serving-console topology (VERDICT r3
    #7) — must stream to one-shot parity."""
    procs = {
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(3):
        _, last = G.add_serial_chain(["in", "eq"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    bus = G.add("comp")  # stateful node directly behind the fan-in
    G.connect(mix, bus)
    G.connect(bus, G.add("out"))
    _stream_vs_full(G, procs, 3, 8192, 1024, rtol=5e-4)


class _SidechainDucker:
    """Two-inlet stateful test processor: the KEY input's ballistics-
    smoothed energy ducks the MAIN input.  Exercises the multi-inlet
    streaming contract (stream_step(main, key, state, cache))."""

    def __init__(self):
        from grafx_tpu.processors.core.envelope import Ballistics

        self.smoother = Ballistics()

    def __call__(self, main, key, z_alpha, log_depth):
        e = jnp.mean(jnp.square(key), axis=-2)
        env = self.smoother(e, z_alpha=z_alpha)
        gain = jnp.exp(-jnp.exp(log_depth) * env)
        return gain[:, None, :] * main

    def parameter_size(self):
        return {"z_alpha": 2, "log_depth": 1}

    def stream_init(self, num_channels, block_len, z_alpha, log_depth):
        del num_channels, block_len
        state = self.smoother.stream_zero_state(z_alpha.shape[0])
        return state, {"z_alpha": z_alpha, "log_depth": log_depth}

    def stream_step(self, main, key, state, cache):
        e = jnp.mean(jnp.square(key), axis=-2)
        env, state = self.smoother.stream(e, state, z_alpha=cache["z_alpha"])
        gain = jnp.exp(-jnp.exp(cache["log_depth"]) * env)
        return gain[:, None, :] * main, state


def test_stream_multi_inlet_stateful():
    """A genuinely MIMO stateful node (sidechain ducker) streams when
    its stream_step takes one positional signal per inlet."""
    procs = {
        "duck": _SidechainDucker(),
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
    }
    config = NodeConfigs(
        {
            "duck": {"inlets": ["main", "key"], "outlets": ["main"]},
            "eq": {"inlets": ["main"], "outlets": ["main"]},
        }
    )
    G = GRAFX(config=config)
    src_a = G.add("in")
    src_b = G.add("in")
    eq = G.add("eq")
    G.connect(src_a, eq)
    duck = G.add("duck")
    G.connect(eq, duck, inlet="main")
    G.connect(src_b, duck, inlet="key")
    G.connect(duck, G.add("out"))
    _stream_vs_full(G, procs, 2, 8192, 1024, rtol=5e-4)


def test_stream_multi_inlet_stateful_bad_signature_raises():
    """A stateful processor whose stream_step does NOT accept one
    signal per inlet gets a clear error, not silent wrong audio."""

    class BadDucker(_SidechainDucker):
        def stream_step(self, main, state, cache):  # missing `key`
            return main, state

    procs = {"duck": BadDucker()}
    config = NodeConfigs(
        {"duck": {"inlets": ["main", "key"], "outlets": ["main"]}}
    )
    G = GRAFX(config=config)
    a, b = G.add("in"), G.add("in")
    duck = G.add("duck")
    G.connect(a, duck, inlet="main")
    G.connect(b, duck, inlet="key")
    G.connect(duck, G.add("out"))
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError, match="positional args"):
        StreamRenderer(procs, plan, params, block_len=512)

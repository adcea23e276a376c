"""AOT export / serving tests: a scheduled render round-trips through
`jax.export` serialization and replays without re-tracing."""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import Compressor, ParametricEqualizer, StereoGain
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.serving import export_render, load_render
from grafx_tpu.utils import create_empty_parameters


def _build():
    config = NodeConfigs(["gain", "eq", "comp"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(3):
        _, last = G.add_serial_chain(["in", "eq", "comp", "gain"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    G.connect(mix, G.add("out"))
    processors = {
        "gain": StereoGain(),
        "eq": ParametricEqualizer(num_filters=2, backend="exact"),
        "comp": Compressor(energy_smoother="iir", iir_len=256),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    return make_render_fn(processors, plan), params


def test_export_roundtrip_matches_live_render():
    render, params = _build()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 2**10))

    blob = export_render(render, x, params)
    assert isinstance(blob, bytes) and len(blob) > 0

    served = load_render(blob)
    out_served = served(x, params)
    out_live, _, _ = render(x, params)
    np.testing.assert_allclose(
        np.asarray(out_served), np.asarray(out_live), rtol=1e-5, atol=1e-6
    )

    # fresh parameter values replay through the same artifact
    params2 = jax.tree.map(lambda v: v + 0.01, params)
    out2 = served(x, params2)
    assert not np.allclose(np.asarray(out2), np.asarray(out_served))


def test_export_fused_graph_roundtrip():
    """Serving export works on a fused plan (the fused cascade's kernel
    build serializes into the StableHLO blob like any other program)."""
    from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
    from grafx_tpu.processors import LowPassFilter, PeakingFilter
    from grafx_tpu.render import (
        fuse_serial_lti,
        make_render_fn,
        prepare_render,
        reorder_for_fast_render,
    )
    from grafx_tpu.utils import create_empty_parameters

    procs = {
        "pk": PeakingFilter(backend="exact"),
        "lp": LowPassFilter(backend="exact"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "pk", "lp", "out"])
    G2, procs2 = fuse_serial_lti(G, procs)
    assert any(t.startswith("fused(") for t in procs2)

    G_t = reorder_for_fast_render(convert_to_tensor(G2), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs2, G2, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda v: v + 0.1, params)
    render = make_render_fn(procs2, plan)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**12))

    live, _, _ = render(x, params)
    blob = export_render(render, x, params)
    served = load_render(blob)
    out = served(x, params)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(live), rtol=1e-5, atol=1e-6
    )


def test_export_stream_step_roundtrip():
    """The exported streaming step must reproduce the live
    StreamRenderer block-for-block from the shipped initial state."""
    from grafx_tpu.render.streaming import StreamRenderer
    from grafx_tpu.serving import export_stream_step, load_stream_step

    config = NodeConfigs(["eq", "gain"])
    G = GRAFX(config=config)
    e = G.add_serial_chain(["in", "eq", "gain"])[1]
    o = G.add("out")
    G.connect(e, o)
    procs = {
        "eq": ParametricEqualizer(backend="exact"),
        "gain": StereoGain(),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(
        procs, G, key=jax.random.PRNGKey(3)
    )
    block = 1024
    live = StreamRenderer(procs, plan, params, block_len=block, num_channels=2)
    x_blocks = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 2, block))

    blob = export_stream_step(live, x_blocks[0])
    step, state = load_stream_step(blob)

    live_state = live.init_state()
    for xb in x_blocks:
        y_live, live_state = live(xb, live_state)
        y_exp, state = step(xb, state)
        np.testing.assert_array_equal(np.asarray(y_exp), np.asarray(y_live))


def test_export_stream_step_multiblock():
    """blocks_per_step=k exports the scanned multi-block step: one call
    == k live single-block calls (same outputs, same carried state)."""
    from grafx_tpu.render.streaming import StreamRenderer
    from grafx_tpu.serving import export_stream_step, load_stream_step

    config = NodeConfigs(["eq", "gain"])
    G = GRAFX(config=config)
    e = G.add_serial_chain(["in", "eq", "gain"])[1]
    G.connect(e, G.add("out"))
    procs = {
        "eq": ParametricEqualizer(backend="exact"),
        "gain": StereoGain(),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(5))
    block, k = 1024, 4
    live = StreamRenderer(procs, plan, params, block_len=block, num_channels=2)
    x_blocks = jax.random.normal(jax.random.PRNGKey(6), (k, 1, 2, block))

    blob = export_stream_step(live, x_blocks[0], blocks_per_step=k)
    step, state = load_stream_step(blob)
    y_many, _ = step(x_blocks, state)

    live_state = live.init_state()
    for i, xb in enumerate(x_blocks):
        y_live, live_state = live(xb, live_state)
        np.testing.assert_allclose(
            np.asarray(y_many[i]), np.asarray(y_live), rtol=2e-5, atol=2e-6
        )

"""End-to-end render tests.

Mirrors the reference integration fixture
(reference: tests/graph/test_render.py:13-37) using SISO gain chains, and
adds gradient and jit checks (the TPU build's core promise: the whole
graph render is one differentiable XLA program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import StereoGain, StereoToMidSide, MidSideToStereo
from grafx_tpu.render import (
    make_render_fn,
    prepare_render,
    render_grafx,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters


def build_gain_graph(num_sources=3):
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(num_sources):
        _, last = G.add_serial_chain(["in", "gain"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)
    return G


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_render_gain_graph(method):
    G = build_gain_graph()
    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method=method)
    render_data = prepare_render(G_t)
    parameters = create_empty_parameters(processors, G)

    x = jnp.ones((3, 2, 2**10))
    out, intermediates, buffer = render_grafx(
        processors, x, parameters, render_data
    )
    assert out.shape == (1, 2, 2**10)
    assert buffer.shape == (G_t.num_nodes, 2, 2**10)
    assert not jnp.isnan(out).any()

    # manual check: out = sum_i exp(g_i) * x_i
    gains = np.exp(np.asarray(parameters["gain"]["log_gain"]))
    expected = gains.sum(0)[:, None] * np.ones((2, 2**10))
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5)


def test_render_batched_4dim():
    G = build_gain_graph()
    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    render_data = prepare_render(G_t)
    parameters = create_empty_parameters(processors, G)

    B = 4
    x = jnp.ones((B, 3, 2, 2**9))
    out, _, buffer = render_grafx(processors, x, parameters, render_data)
    assert out.shape == (B, 1, 2, 2**9)
    # every batch row identical (same params)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_render_grad_and_jit():
    G = build_gain_graph()
    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    render_data = prepare_render(G_t)
    parameters = create_empty_parameters(processors, G)
    render_fn = make_render_fn(processors, render_data)

    x = jnp.ones((3, 2, 2**9))
    target = 2.0 * jnp.ones((1, 2, 2**9))

    def loss_fn(params):
        out, _, _ = render_fn(x, params)
        return jnp.mean((out - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(parameters)
    g = np.asarray(grads["gain"]["log_gain"])
    assert g.shape == (3, 2)
    assert (np.abs(g) > 0).all()

    # a couple of optimizer steps reduce the loss
    params = parameters
    for _ in range(50):
        l, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(lambda p, g: p - 0.5 * g, params, grads)
    assert loss_fn(params) < loss


def test_render_one_by_one_ragged_lengths():
    """One-by-one mode supports per-node signal lengths: the list buffer
    carries heterogeneous shapes through the graph (reference semantics:
    src/grafx/render/core.py:15-17).  A chain whose middle processors
    change the signal length must render (VERDICT round-1 item 7)."""

    class Upsample2x:
        def __call__(self, x, log_gain):
            y = jnp.exp(log_gain)[..., None] * x
            return jnp.repeat(y, 2, axis=-1)

        def parameter_size(self):
            return {"log_gain": 1}

    class CropHalf:
        def __call__(self, x, log_gain):
            y = jnp.exp(log_gain)[..., None] * x
            return y[..., : y.shape[-1] // 2]

        def parameter_size(self):
            return {"log_gain": 1}

    L = 2**8
    config = NodeConfigs(["up", "crop"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "up", "crop", "crop", "out"])
    processors = {"up": Upsample2x(), "crop": CropHalf()}
    params = create_empty_parameters(processors, G)
    # zero the gains for an exact value check
    params = jax.tree.map(jnp.zeros_like, params)

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="one-by-one")
    plan = prepare_render(G_t)
    x = jnp.arange(2 * L, dtype=jnp.float32).reshape(1, 2, L)
    out, _, buffer = render_grafx(processors, x, params, plan)

    # in (L) -> up (2L) -> crop (L) -> crop (L/2)
    assert out.shape == (1, 2, L // 2)
    assert buffer[1].shape == (1, 2, 2 * L)
    assert buffer[2].shape == (1, 2, L)
    assert buffer[3].shape == (1, 2, L // 2)
    expected = np.repeat(np.asarray(x[0]), 2, axis=-1)[:, : L // 2]
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-6)

    # gradients flow through the ragged list buffer
    def loss_fn(p):
        out, _, _ = render_grafx(processors, x, p, plan)
        return jnp.mean(out**2)

    grads = jax.grad(loss_fn)(params)
    for g in jax.tree.leaves(grads):
        assert jnp.isfinite(g).all()


def test_render_one_by_one_matches_batched():
    G = build_gain_graph()
    processors = {"gain": StereoGain()}
    parameters = create_empty_parameters(processors, G)
    x = jnp.ones((3, 2, 2**9))

    outs = {}
    for method in ["beam", "one-by-one"]:
        G_t = reorder_for_fast_render(convert_to_tensor(G), method=method)
        render_data = prepare_render(G_t)
        out, _, _ = render_grafx(processors, x, parameters, render_data)
        outs[method] = np.asarray(out).reshape(2, -1)
    np.testing.assert_allclose(outs["beam"], outs["one-by-one"], rtol=1e-5)


class _Splitter:
    """Two-outlet test processor: splits into complementary gain bands
    (each outlet keeps the full channel count, like a crossover)."""

    def __call__(self, input_signals):
        return [0.25 * input_signals, 0.75 * input_signals]

    def parameter_size(self):
        return {}


class _TwoInMixer:
    """Two-inlet test processor: weighted sum of its inlets."""

    def __call__(self, a, b):
        return a + b

    def parameter_size(self):
        return {}


def test_render_mimo_split_and_merge():
    config = NodeConfigs(
        {
            "split": {"inlets": ["main"], "outlets": ["low", "high"]},
            "merge": {"inlets": ["a", "b"], "outlets": ["main"]},
        }
    )
    G = GRAFX(config=config)
    i = G.add("in")
    a = G.add("split")
    b = G.add("merge")
    o = G.add("out")
    G.connect(i, a)
    G.connect(a, b, outlet="low", inlet="a")
    G.connect(a, b, outlet="high", inlet="b")
    G.connect(b, o)

    processors = {"split": _Splitter(), "merge": _TwoInMixer()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="greedy")
    render_data = prepare_render(G_t)
    assert not render_data.siso_only
    # buffer rows = total outlets: in(1) + split(2) + merge(1) + out(0)
    assert render_data.num_buffers == 4

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2, 2**9))
    out, _, _ = render_grafx(processors, x, {}, render_data)
    # split into 0.25x + 0.75x then summed back: identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_common_parameters_drywet():
    """DryWet with external_param: one shared drywet tensor indexed by
    node id via common_parameters (reference: container.py:10-82,
    render/graph.py:132-141)."""
    from grafx_tpu.processors import DryWet, TanhDistortion

    config = NodeConfigs(["dist"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "dist", "dist", "out"])
    processors = {"dist": DryWet(TanhDistortion(), external_param=True)}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="greedy")
    render_data = prepare_render(G_t)
    parameters = create_empty_parameters(processors, G)

    x = 2.0 * jnp.ones((1, 2, 256))
    num_nodes = G_t.num_nodes
    # drywet weight per node id; -20 => fully dry everywhere
    common = {"drywet_weight": jnp.full((num_nodes, 1), -20.0)}
    out_dry, _, _ = render_grafx(
        processors, x, parameters, render_data, common_parameters=common
    )
    np.testing.assert_allclose(np.asarray(out_dry), np.asarray(x), atol=1e-4)

    # fully wet: output passes through two tanh stages
    common_wet = {"drywet_weight": jnp.full((num_nodes, 1), 20.0)}
    out_wet, _, _ = render_grafx(
        processors, x, parameters, render_data, common_parameters=common_wet
    )
    assert float(jnp.abs(out_wet).max()) < 1.5  # tanh-compressed


def test_make_render_fn_caches_identical_plans():
    """Two graphs with the same topology share one compiled closure."""
    processors = {"gain": StereoGain()}
    fns = []
    for _ in range(2):
        G = build_gain_graph()
        G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
        plan = prepare_render(G_t)
        fns.append(make_render_fn(processors, plan))
    assert fns[0] is fns[1]


def test_precompute_hook_matches_direct_call():
    """The per-type precompute path (kernels built once, sliced per
    stage) renders identically to calling the processor per stage with
    raw parameters (VERDICT round-1 item 9).  The graph places the same
    'eq' type in two different stages (chains + master)."""
    from grafx_tpu.processors import ParametricEqualizer

    config = NodeConfigs(["eq", "gain"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(3):
        _, last = G.add_serial_chain(["in", "eq", "gain"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    master_first, master_end = G.add_serial_chain(["eq", "gain"])
    G.connect(mix, master_first)
    out = G.add("out")
    G.connect(master_end, out)

    eq = ParametricEqualizer(num_filters=4, backend="exact")
    assert hasattr(eq, "precompute")
    processors = {"eq": eq, "gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    # eq must appear in at least two stages for the test to bite
    eq_idx = G_t.config.node_type_to_index["eq"]
    eq_stages = sum(
        1 for s in plan.iter_list if s.node_type == "eq"
    )
    assert eq_stages >= 2, eq_stages

    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 2, 2**10))

    out_pre, _, _ = render_grafx(processors, x, params, plan)

    # oracle: same render with the hook hidden (per-stage raw params)
    class NoPrecomputeEq:
        def __init__(self, inner):
            self._inner = inner

        def __call__(self, *a, **kw):
            return self._inner(*a, **kw)

        def parameter_size(self):
            return self._inner.parameter_size()

    out_raw, _, _ = render_grafx(
        {"eq": NoPrecomputeEq(eq), "gain": StereoGain()}, x, params, plan
    )
    np.testing.assert_allclose(
        np.asarray(out_pre), np.asarray(out_raw), rtol=1e-5, atol=1e-6
    )

    # gradients flow through the cached kernels
    def loss(p):
        o, _, _ = render_grafx(processors, x, p, plan)
        return jnp.mean(o**2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert jnp.isfinite(leaf).all()
    assert float(jnp.abs(g["eq"]["w0"]).max()) > 0

    # 4-dim source batch goes through the expanded-cache path
    xb = jax.random.normal(jax.random.PRNGKey(9), (2, 3, 2, 2**10))
    out_b, _, _ = render_grafx(processors, xb, params, plan)
    out_b_raw, _, _ = render_grafx(
        {"eq": NoPrecomputeEq(eq), "gain": StereoGain()}, xb, params, plan
    )
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_b_raw), rtol=1e-5, atol=1e-6
    )


def test_make_render_fn_static_config_cache_key():
    """The cache keys on processor static config, not object identity:
    identically-configured processors share a closure, differently-
    configured ones (and distinct plain callables) never collide —
    the VERDICT round-1 id()-reuse hazard (render/graph.py cache)."""
    from grafx_tpu.processors import ParametricEqualizer

    G = GRAFX(config=NodeConfigs(["eq"]))
    G.add_serial_chain(["in", "eq", "out"])
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)

    fn_a = make_render_fn({"eq": ParametricEqualizer(num_filters=4)}, plan)
    fn_b = make_render_fn({"eq": ParametricEqualizer(num_filters=4)}, plan)
    assert fn_a is fn_b  # same config, different instances -> shared

    fn_c = make_render_fn({"eq": ParametricEqualizer(num_filters=6)}, plan)
    assert fn_c is not fn_a  # different config -> fresh closure

    # build / drop / rebuild cycle: the rebuilt processor with a new
    # config must never hit the stale closure of the dropped one
    import gc

    p1 = ParametricEqualizer(num_filters=8)
    fn_1 = make_render_fn({"eq": p1}, plan)
    del p1
    gc.collect()
    p2 = ParametricEqualizer(num_filters=12)
    fn_2 = make_render_fn({"eq": p2}, plan)
    assert fn_2 is not fn_1

    # arbitrary callables key by identity (held strongly by the cache)
    f1 = lambda x, **kw: x  # noqa: E731
    f2 = lambda x, **kw: x  # noqa: E731
    fn_f1 = make_render_fn({"eq": f1}, plan)
    fn_f2 = make_render_fn({"eq": f2}, plan)
    assert fn_f1 is not fn_f2


def test_batch_grafx_end_to_end():
    """Graph-level batching: a disconnected union renders all graphs in
    one program, matching per-graph renders."""
    from grafx_tpu.data import batch_grafx

    config = NodeConfigs(["gain"])
    graphs = []
    for _ in range(3):
        G = GRAFX(config=config)
        G.add_serial_chain(["in", "gain", "out"])
        graphs.append(G)
    GB = batch_grafx(graphs)

    processors = {"gain": StereoGain()}
    params = create_empty_parameters(processors, GB, key=jax.random.PRNGKey(2))
    GB_t = reorder_for_fast_render(convert_to_tensor(GB), method="beam")
    plan = prepare_render(GB_t)

    x = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 2**9))
    out, _, _ = render_grafx(processors, x, params, plan)
    assert out.shape == (3, 2, 2**9)

    # per-graph renders with the matching parameter rows agree
    for g in range(3):
        Gi_t = reorder_for_fast_render(
            convert_to_tensor(graphs[g]), method="beam"
        )
        plan_i = prepare_render(Gi_t)
        params_i = {"gain": {"log_gain": params["gain"]["log_gain"][g : g + 1]}}
        out_i, _, _ = render_grafx(
            processors, x[g : g + 1], params_i, plan_i
        )
        np.testing.assert_allclose(
            np.asarray(out[g]), np.asarray(out_i[0]), rtol=1e-5
        )


def test_buffer_modes_agree():
    """"stages" buffer mode (per-stage outputs + static-slice reads) must
    produce outputs, intermediates, and the assembled signal buffer
    identical to the reference-style threaded "array" buffer — including
    scatter fan-in (two mixes in one stage) and the 4-dim batch path."""
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(4):
        _, last = G.add_serial_chain(["in", "gain"])
        ends.append(last)
    # two mix nodes scheduled in the same stage -> scatter aggregation
    mix_a = G.add("mix")
    mix_b = G.add("mix")
    G.connect(ends[0], mix_a)
    G.connect(ends[2], mix_a)
    G.connect(ends[1], mix_b)
    G.connect(ends[3], mix_b)
    ga = G.add("gain")
    gb = G.add("gain")
    G.connect(mix_a, ga)
    G.connect(mix_b, gb)
    out_mix = G.add("mix")
    G.connect(ga, out_mix)
    G.connect(gb, out_mix)
    out = G.add("out")
    G.connect(out_mix, out)

    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(3))

    for shape in [(4, 2, 2**9), (3, 4, 2, 2**9)]:
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        out_a, _, buf_a = render_grafx(
            processors, x, params, plan, buffer_mode="array"
        )
        out_s, _, buf_s = render_grafx(
            processors, x, params, plan, buffer_mode="stages"
        )
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_s), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(buf_a), np.asarray(buf_s), rtol=1e-6, atol=1e-7
        )

    # gradients agree across modes
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2**9))

    def loss(p, mode):
        o, _, _ = render_grafx(processors, x, p, plan, buffer_mode=mode)
        return jnp.mean(o**2)

    g_a = jax.grad(lambda p: loss(p, "array"))(params)
    g_s = jax.grad(lambda p: loss(p, "stages"))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        g_a,
        g_s,
    )


def test_sorted_scatter_aggregation_matches_unsorted_fallback():
    """Sorted fan-in indices lower to slice-sums; the result must equal
    the generic .at[].add scatter (incl. an empty middle segment)."""
    from grafx_tpu.render.core import aggregate_tensor
    from grafx_tpu.render.prepare import Aggregation

    x = jnp.asarray(np.random.RandomState(0).randn(6, 2, 32).astype(np.float32))
    sorted_agg = Aggregation(method="scatter", idx=(0, 0, 2, 2, 2, 3), num_segments=4)
    got = aggregate_tensor(x, sorted_agg, dim=0)
    ref = (
        jnp.zeros((4, 2, 32))
        .at[jnp.array(sorted_agg.idx)]
        .add(x)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    unsorted = Aggregation(method="scatter", idx=(1, 0, 2, 0, 2, 3), num_segments=4)
    got_u = aggregate_tensor(x, unsorted, dim=0)
    ref_u = jnp.zeros((4, 2, 32)).at[jnp.array(unsorted.idx)].add(x)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_graph_schedules_and_modes_agree(seed):
    """Property test over random console-style DAGs: the rendered master
    output must be identical across scheduling methods (beam / greedy /
    one-by-one) and buffer modes — the schedule and the executor layout
    are implementation details, not semantics."""
    from grafx_tpu.processors import TanhDistortion

    rng = np.random.default_rng(seed)
    types = {"gain": StereoGain(), "dist": TanhDistortion()}
    config = NodeConfigs(list(types))
    G = GRAFX(config=config)
    ends = []
    num_chains = int(rng.integers(2, 5))
    for _ in range(num_chains):
        chain = ["in"] + [
            str(rng.choice(list(types))) for _ in range(int(rng.integers(1, 4)))
        ]
        _, last = G.add_serial_chain(chain)
        ends.append(last)
    # random extra cross edges into later mixes keep it a DAG
    mix_a = G.add("mix")
    for e in ends:
        G.connect(e, mix_a)
    post_first, post_last = G.add_serial_chain(["gain", "dist"])
    G.connect(mix_a, post_first)
    out = G.add("out")
    G.connect(post_last, out)

    params = create_empty_parameters(types, G, key=jax.random.PRNGKey(seed))
    # Schedules permute node ids, which permutes each type's parameter
    # rows; make every row of a type identical so the comparison is
    # permutation-invariant (schedule equivalence is what's under test).
    params = jax.tree.map(
        lambda v: jnp.broadcast_to(v[:1], v.shape), params
    )
    x = jax.random.normal(jax.random.PRNGKey(seed + 10), (num_chains, 2, 2**9))

    outs = []
    for method in ("beam", "greedy", "one-by-one"):
        G_t = reorder_for_fast_render(convert_to_tensor(G), method=method)
        plan = prepare_render(G_t)
        o, _, _ = render_grafx(types, x, params, plan)
        outs.append(np.asarray(o if not isinstance(o, list) else o[0]))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-5, atol=1e-6)

    # buffer modes on the beam schedule
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    o_arr, _, _ = render_grafx(types, x, params, plan, buffer_mode="array")
    np.testing.assert_allclose(np.asarray(o_arr), outs[0], rtol=1e-5, atol=1e-6)


def test_render_rng_threading():
    """rng= threads per-stage noise keys to stochastic processors
    (reference: reverb.py:101-114 resamples noise every forward; under
    jit the key must be threaded explicitly).  Same key => identical
    render; different keys => different reverb noise; rng=None =>
    trace-time-frozen noise, still deterministic."""
    from grafx_tpu.processors import STFTMaskedNoiseReverb

    config = NodeConfigs(["reverb"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "reverb", "out"])
    procs = {
        "reverb": STFTMaskedNoiseReverb(
            ir_len=2048, fixed_noise=False, processor_channel="stereo"
        )
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="greedy")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(procs, plan)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**12))
    k1, k2 = jax.random.PRNGKey(10), jax.random.PRNGKey(20)
    out_a, _, _ = render(x, params, rng=k1)
    out_b, _, _ = render(x, params, rng=k1)
    out_c, _, _ = render(x, params, rng=k2)
    out_none, _, _ = render(x, params)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 1e-7
    assert not np.isnan(np.asarray(out_none)).any()

    # gradients flow with a live rng
    def loss(p):
        o, _, _ = render(x, p, rng=k1)
        return jnp.mean(o**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_render_rng_through_containers():
    """Containers forward the per-stage key to wrapped stochastic
    processors, with distinct subkeys per chain position."""
    from grafx_tpu.processors import (
        FilteredNoiseShapingReverb,
        SerialChain,
        StereoGain,
    )

    chain = SerialChain(
        {
            "gain": StereoGain(),
            "rev": FilteredNoiseShapingReverb(
                ir_len=1500,
                num_bands=4,
                noise_randomness="pseudo-random",
                processor_channel="stereo",
            ),
        }
    )
    config = NodeConfigs(["fx"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "fx", "out"])
    procs = {"fx": chain}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="greedy")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(procs, plan)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**12))
    out_a, _, _ = render(x, params, rng=jax.random.PRNGKey(3))
    out_b, _, _ = render(x, params, rng=jax.random.PRNGKey(3))
    out_c, _, _ = render(x, params, rng=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 1e-7

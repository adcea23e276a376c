"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest forces ``xla_force_host_platform_device_count=8``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.parallel import batch_sharding, make_mesh, replicated
from grafx_tpu.processors import StereoGain, Compressor
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.utils import create_empty_parameters


@pytest.fixture(scope="module")
def setup():
    config = NodeConfigs(["gain", "compressor"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(3):
        _, last = G.add_serial_chain(["in", "gain", "compressor"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)
    processors = {
        "gain": StereoGain(),
        "compressor": Compressor(energy_smoother="iir", iir_len=512),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G)
    render = make_render_fn(processors, plan, jit=False)
    return render, params


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_data_parallel_render_matches_single_device(setup):
    render, params = setup
    mesh = make_mesh(8)
    B = 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 2, 2**10))

    x_sharded = jax.device_put(x, batch_sharding(mesh))
    params_rep = jax.device_put(params, replicated(mesh))

    def fwd(x, p):
        out, _, _ = render(x, p)
        return out

    out_sharded = jax.jit(fwd)(x_sharded, params_rep)
    out_single = jax.jit(fwd)(x, params)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=1e-5, atol=1e-6
    )


def test_data_parallel_grad_step(setup):
    render, params = setup
    mesh = make_mesh(8)
    B = 8
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, 3, 2, 2**10)),
        batch_sharding(mesh),
    )
    target = jax.device_put(
        jnp.zeros((B, 1, 2, 2**10)), batch_sharding(mesh)
    )
    params_rep = jax.device_put(params, replicated(mesh))

    @jax.jit
    def grad_step(p, x, t):
        def loss(p):
            out, _, _ = render(x, p)
            return jnp.mean((out - t) ** 2)

        return jax.value_and_grad(loss)(p)

    loss, grads = grad_step(params_rep, x, target)
    assert jnp.isfinite(loss)
    for g in jax.tree.leaves(grads):
        assert jnp.isfinite(g).all()
    # gradients are replicated over the mesh
    g0 = jax.tree.leaves(grads)[0]
    assert g0.sharding.is_fully_replicated


def test_dryrun_multichip_entrypoint():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_node_parallel_render_matches_single_device(setup):
    """Shard the node axis: per-stage node batches split across devices;
    XLA inserts collectives at mix fan-ins. Output must match."""
    from grafx_tpu.parallel import node_sharding

    render, params = setup
    mesh = make_mesh(8)
    # 8 sources -> 'in' stage has 8 nodes, divisible across the mesh
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(8):
        _, last = G.add_serial_chain(["in", "gain"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)
    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params8 = create_empty_parameters(processors, G)
    render8 = make_render_fn(processors, plan, jit=False)

    x = jax.random.normal(jax.random.PRNGKey(5), (8, 2, 2**10))
    x_sharded = jax.device_put(x, node_sharding(mesh))
    params_sharded = jax.device_put(params8, node_sharding(mesh))

    def fwd(x, p):
        out, _, _ = render8(x, p)
        return out

    out_sharded = jax.jit(fwd)(x_sharded, params_sharded)
    out_single = jax.jit(fwd)(x, params8)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=1e-5, atol=1e-6
    )


def test_2d_mesh_dp_tp_render_matches_single_device(setup):
    """(data x node) 2-D mesh: graph batch shards over data, node axis
    over node; outputs must match the unsharded render."""
    from grafx_tpu.parallel import batch_node_sharding, make_mesh_2d

    # 4 chains so the node axis divides the mesh's node dimension
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    ends = [G.add_serial_chain(["in", "gain"])[1] for _ in range(4)]
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    G.connect(mix, G.add("out"))
    processors = {"gain": StereoGain()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G)
    render = make_render_fn(processors, plan, jit=False)

    mesh2 = make_mesh_2d(4, 2)
    B = 8
    x = jax.random.normal(jax.random.PRNGKey(9), (B, 4, 2, 2**10))
    x_sharded = jax.device_put(x, batch_node_sharding(mesh2))
    params_rep = jax.device_put(
        params, jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec())
    )

    def fwd(x, p):
        out, _, _ = render(x, p)
        return out

    out_sharded = jax.jit(fwd)(x_sharded, params_rep)
    out_single = jax.jit(fwd)(x, params)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=1e-5, atol=1e-6
    )


def test_time_sharding_render_matches_single_device(setup):
    """Sequence-parallel layout compiles and matches (XLA inserts
    gathers around the FFT/recursion ops; elementwise stays local)."""
    from grafx_tpu.parallel import time_sharding

    render, params = setup
    mesh = make_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(10), (3, 2, 2**10))
    x_sharded = jax.device_put(x, time_sharding(mesh, ndim=3))

    def fwd(x, p):
        out, _, _ = render(x, p)
        return out

    out_sharded = jax.jit(fwd)(x_sharded, params)
    out_single = jax.jit(fwd)(x, params)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def exact_setup():
    """A heavier graph with the exact-path processors (blocked IIR +
    Pallas-or-scan ballistics), for gradient-parity gates: a wrong
    collective in a sharded layout shows up in the gradients even when
    the forward happens to agree."""
    from grafx_tpu.processors import ParametricEqualizer

    config = NodeConfigs(["gain", "eq", "comp"])
    G = GRAFX(config=config)
    ends = [G.add_serial_chain(["in", "eq", "comp", "gain"])[1] for _ in range(4)]
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))
    processors = {
        "gain": StereoGain(),
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(3))
    render = make_render_fn(processors, plan, jit=False)
    return render, params


def _grad_of(render, params, x, shard_x=None, shard_p=None):
    if shard_x is not None:
        x = jax.device_put(x, shard_x)
    if shard_p is not None:
        params = jax.device_put(params, shard_p)

    @jax.jit
    def g(p, x):
        def loss(p):
            out, _, _ = render(x, p)
            return jnp.mean(out**2)

        return jax.grad(loss)(p)

    return jax.tree.map(np.asarray, g(params, x))


def _assert_grads_close(ga, gb, rtol=2e-4, atol=1e-7):
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_2d_mesh_grad_matches_single_device(exact_setup):
    """dp x tp layout: GRADIENTS (not just outputs) must match the
    single-device run through the exact IIR + ballistics paths."""
    from grafx_tpu.parallel import batch_node_sharding, make_mesh_2d

    render, params = exact_setup
    mesh2 = make_mesh_2d(4, 2)
    x = jax.random.normal(jax.random.PRNGKey(11), (8, 4, 2, 2**10))
    g_ref = _grad_of(render, params, x)
    g_sh = _grad_of(
        render, params, x,
        shard_x=batch_node_sharding(mesh2),
        shard_p=jax.sharding.NamedSharding(mesh2, jax.sharding.PartitionSpec()),
    )
    _assert_grads_close(g_ref, g_sh)


def test_time_sharding_grad_matches_single_device(exact_setup):
    """Sequence-parallel layout: gradient parity through FFT convs and
    the sequential recursions (XLA must gather/scatter correctly in the
    transposed program too)."""
    from grafx_tpu.parallel import time_sharding

    render, params = exact_setup
    mesh = make_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 2, 2**10))
    g_ref = _grad_of(render, params, x)
    g_sh = _grad_of(render, params, x, shard_x=time_sharding(mesh, ndim=3))
    _assert_grads_close(g_ref, g_sh)

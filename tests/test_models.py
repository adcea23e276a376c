"""Model factory and optimizer-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.models import (
    GraphParameterOptimizer,
    mastering_chain,
    mixing_console,
    simple_chain,
)
from grafx_tpu.ops.losses import mse_loss, multi_resolution_stft_loss


def test_factories_build():
    for G, processors in [
        simple_chain(),
        mixing_console(num_tracks=3, ir_len=2000),
        mastering_chain(),
    ]:
        assert G.number_of_nodes() > 2
        for t in processors:
            assert t in G.config.node_types


def test_optimizer_fits_gain():
    G, processors = simple_chain(chain=("gain",))
    opt = GraphParameterOptimizer(
        G, processors, loss_fn=mse_loss, key=jax.random.PRNGKey(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**10))
    target = 0.5 * x
    history = opt.fit(x, target, num_steps=200)
    assert history[-1] < history[0] * 1e-2
    learned = np.exp(np.asarray(opt.params["gain"]["log_gain"]))
    np.testing.assert_allclose(learned, 0.5, rtol=0.05)


def test_mrstft_loss_sane():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 2**12))
    zero_loss = multi_resolution_stft_loss(x, x)
    nonzero_loss = multi_resolution_stft_loss(x, 0.3 * x)
    assert float(zero_loss) < 1e-5
    assert float(nonzero_loss) > float(zero_loss)


def test_parameter_predictor_end_to_end():
    """Neural parameter prediction trained through the graph render."""
    import optax

    from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
    from grafx_tpu.models import ParameterPredictor, audio_features
    from grafx_tpu.processors import StereoGain, TanhDistortion
    from grafx_tpu.render import (
        make_render_fn,
        prepare_render,
        reorder_for_fast_render,
    )

    config = NodeConfigs(["gain", "dist"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(3):
        _, last = G.add_serial_chain(["in", "dist", "gain"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    out = G.add("out")
    G.connect(mix, out)

    processors = {"gain": StereoGain(), "dist": TanhDistortion()}
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    render = make_render_fn(processors, plan, jit=False)

    x = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (3, 2, 2**11))
    target = 0.1 * x.sum(0, keepdims=True)

    feats = audio_features(x, n_fft=256, hop=128, num_bands=16)  # (3, 32)
    predictor = ParameterPredictor(processors, feature_dim=32, hidden=32)
    weights = predictor.init(jax.random.PRNGKey(1))
    # every gain/dist node conditions on its source's features
    features_per_type = {"gain": feats, "dist": feats}

    opt = optax.adam(3e-3)
    opt_state = opt.init(weights)

    @jax.jit
    def step(w, s):
        def loss_fn(w):
            p = predictor.apply(w, features_per_type)
            out, _, _ = render(x, p)
            return jnp.mean((out - target) ** 2)

        l, g = jax.value_and_grad(loss_fn)(w)
        updates, s = opt.update(g, s)
        return optax.apply_updates(w, updates), s, l

    losses = []
    for _ in range(60):
        weights, opt_state, l = step(weights, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_optimizer_fuse_option():
    """``GraphParameterOptimizer(fuse=True)`` rewrites the graph with
    the LTI fusion pass, creates fused-nested parameters, and trains."""
    G, processors = mastering_chain()
    opt = GraphParameterOptimizer(
        G, processors, fuse=True, key=jax.random.PRNGKey(0)
    )
    fused = [t for t in opt.processors if t.startswith("fused(")]
    assert fused == ["fused(eq+geq)"]
    assert "0_eq" in opt.params[fused[0]]

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**12))
    target = 0.5 * x
    history = opt.fit(x, target, num_steps=6)
    assert history[-1] < history[0]


def _partial_dynamics_graph():
    """One gate->comp chain plus one compressor-only chain: padding
    territory for ``fuse="pad"``."""
    from grafx_tpu.data import GRAFX, NodeConfigs
    from grafx_tpu.processors import Compressor, NoiseGate

    processors = {
        "gate": NoiseGate(energy_smoother="iir_exact"),
        "comp": Compressor(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(processors)))
    ends = [
        G.add_serial_chain(["in", "gate", "comp"])[1],
        G.add_serial_chain(["in", "comp"])[1],
    ]
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    G.connect(mix, G.add("out"))
    return G, processors


def test_optimizer_fuse_pad_identity_init():
    """``fuse="pad"`` must NOT change the user's graph at init: the
    padded lone node renders identically to the unfused graph because
    the absent member starts flagged (identity gain, zero-filled rows)
    — parameter init is routed through fuse_parameters (advisor r4
    high: a naive fused-graph init drew _absent ~ N(0, 1e-2) =
    all-present and trained the padding member from random init)."""
    G, processors = _partial_dynamics_graph()
    key = jax.random.PRNGKey(3)
    opt_ref = GraphParameterOptimizer(
        G, processors, loss_fn=mse_loss, key=key
    )
    opt_pad = GraphParameterOptimizer(
        G, processors, loss_fn=mse_loss, key=key, fuse="pad"
    )
    fused_t = [t for t in opt_pad.processors if t.startswith("fused(")]
    assert fused_t == ["fused(gate+comp)"]
    absent = np.asarray(opt_pad.params[fused_t[0]]["_absent"])
    assert absent.shape == (2, 2)
    # exactly one padded gate member, no padded comps
    assert absent[:, 0].sum() == 1.0 and absent[:, 1].sum() == 0.0

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 2**11))
    y_ref = np.asarray(opt_ref.render_current(x))
    y_pad = np.asarray(opt_pad.render_current(x))
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_pad - y_ref).max() / scale < 1e-5


def test_optimizer_fuse_pad_absent_survives_weight_decay():
    """_absent is structural: even under adamw (whose weight decay
    updates parameters without gradients) the mask must stay bitwise
    intact across steps — GraphParameterOptimizer auto-routes _absent
    leaves to set_to_zero (advisor r4 medium)."""
    import optax

    G, processors = _partial_dynamics_graph()
    opt = GraphParameterOptimizer(
        G,
        processors,
        loss_fn=mse_loss,
        optimizer=optax.adamw(1e-2, weight_decay=0.5),
        key=jax.random.PRNGKey(5),
        fuse="pad",
    )
    absent0 = np.asarray(opt.params["fused(gate+comp)"]["_absent"]).copy()
    comp0 = jax.tree.map(np.asarray, opt.params["fused(gate+comp)"]["1_comp"])
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 2, 2**10))
    opt.fit(x, 0.5 * x, num_steps=4)
    np.testing.assert_array_equal(
        np.asarray(opt.params["fused(gate+comp)"]["_absent"]), absent0
    )
    # ... while trainable leaves did move
    moved = any(
        np.abs(np.asarray(v) - comp0[k]).max() > 0
        for k, v in opt.params["fused(gate+comp)"]["1_comp"].items()
    )
    assert moved


def test_optimizer_trainable_mask():
    """Type-level freezing: frozen subtrees keep their initial values
    bitwise while trainable ones move (the torch requires_grad=False
    workflow via optax.masked)."""
    G, processors = simple_chain(chain=("eq", "gain"))
    opt = GraphParameterOptimizer(
        G,
        processors,
        loss_fn=mse_loss,
        trainable={"eq": False},
        key=jax.random.PRNGKey(0),
    )
    eq0 = jax.tree.map(np.asarray, opt.params["eq"])
    gain0 = jax.tree.map(np.asarray, opt.params["gain"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**10))
    opt.fit(x, 0.5 * x, num_steps=5)
    for k, v in opt.params["eq"].items():
        np.testing.assert_array_equal(np.asarray(v), eq0[k], err_msg=k)
    moved = any(
        np.abs(np.asarray(v) - gain0[k]).max() > 0
        for k, v in opt.params["gain"].items()
    )
    assert moved

    import pytest

    with pytest.raises(ValueError, match="unknown processor types"):
        GraphParameterOptimizer(
            G, processors, trainable={"nonexistent": False}
        )


def test_optimizer_save_restore_exact_resume(tmp_path):
    """Resumed fit (params + optimizer moments restored) must continue
    the uninterrupted trajectory exactly."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**10))
    target = 0.5 * x

    def fresh():
        G, processors = simple_chain(chain=("gain",))
        return GraphParameterOptimizer(
            G, processors, loss_fn=mse_loss, key=jax.random.PRNGKey(0)
        )

    ref = fresh()
    full = ref.fit(x, target, num_steps=10)

    a = fresh()
    a.fit(x, target, num_steps=4)
    a.save(str(tmp_path / "ckpt"), metadata={"step": 4})

    b = fresh()
    meta = b.restore(str(tmp_path / "ckpt"))
    assert meta == {"step": 4}
    resumed = b.fit(x, target, num_steps=6)
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full[4:]))

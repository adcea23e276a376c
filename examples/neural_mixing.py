"""End-to-end demo: neural parameter prediction through the render.

The amortized workflow behind the GRAFX companion papers (reverse
engineering / automatic mixing): a per-type MLP predicts every node's
processor parameters from audio features of the dry stems, and the whole
stack — feature extraction, prediction, graph render, multi-resolution
STFT loss — trains end to end with one `jax.grad`.

Run:  python examples/neural_mixing.py [--steps 150]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.models import mixing_console
from grafx_tpu.models.predictor import ParameterPredictor, audio_features
from grafx_tpu.ops.losses import multi_resolution_stft_loss
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.data import convert_to_tensor
from grafx_tpu.utils import (
    count_nodes_per_type,
    create_empty_parameters,
    enable_compilation_cache,
    get_node_ids_from_type,
)

SR = 44100


def synthetic_stems(num_tracks, length, key):
    keys = jax.random.split(key, num_tracks)
    t = jnp.arange(length) / SR
    stems = []
    for i, k in enumerate(keys):
        f0 = 110.0 * (2.0 ** (i / 3.0))
        tone = 0.3 * jnp.sin(2 * jnp.pi * f0 * t)
        noise = 0.05 * jax.random.normal(k, (length,))
        mono = tone + noise
        stems.append(jnp.stack([mono, jnp.roll(mono, 64)]))
    return jnp.stack(stems)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=0.8)
    args = ap.parse_args()

    enable_compilation_cache()
    length = int(args.seconds * SR)

    G, processors = mixing_console(num_tracks=args.tracks)
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    render = make_render_fn(processors, plan)

    key = jax.random.PRNGKey(0)
    stems = synthetic_stems(args.tracks, length, key)

    # ground-truth mix from a random parameter set
    gt_params = create_empty_parameters(
        processors, G, key=jax.random.PRNGKey(7), std=0.5
    )
    target, _, _ = render(stems, gt_params)

    # conditioning: every node of a type sees the features of the stems
    # (node-level conditioning would slice per-chain features; the demo
    # keeps one shared feature vector per node)
    feats = audio_features(stems, num_bands=32)  # (T, 2*bands)
    mean_feat = feats.mean(axis=0)
    predictor = ParameterPredictor(processors, feature_dim=mean_feat.shape[0])
    counts = count_nodes_per_type(G)
    features_per_type = {
        t: jnp.broadcast_to(mean_feat[None], (n, mean_feat.shape[0]))
        for t, n in counts.items()
        if t in processors and n > 0
    }

    weights = predictor.init(jax.random.PRNGKey(1))

    def loss_fn(w):
        params = predictor.apply(w, features_per_type)
        out, _, _ = render(stems, params)
        return multi_resolution_stft_loss(out, target)

    @jax.jit
    def step(w, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(w)
        # simple Adam-free SGD with momentum keeps the demo dependency-light
        new_state = jax.tree.map(
            lambda m, g: 0.9 * m + g, opt_state, grads
        )
        new_w = jax.tree.map(lambda p, m: p - 3e-3 * m, w, new_state)
        return new_w, new_state, loss

    opt_state = jax.tree.map(jnp.zeros_like, weights)
    loss0 = None
    t0 = time.time()
    for i in range(args.steps):
        weights, opt_state, loss = step(weights, opt_state)
        if i == 0:
            loss0 = float(loss)
        if i % 25 == 0:
            print(f"step {i:4d}  loss {float(loss):.4f}")
    final = float(loss)
    print(
        f"done: loss {loss0:.4f} -> {final:.4f} "
        f"({args.steps} steps, {time.time() - t0:.1f}s, "
        f"backend={jax.default_backend()})"
    )
    assert final < loss0, "training did not reduce the loss"


if __name__ == "__main__":
    main()

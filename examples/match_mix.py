"""End-to-end demo: gradient-match a target mix with a console graph.

Builds a mixing console, renders synthetic stems through a "ground
truth" parameter set to create a target mix, then recovers matching
parameters from scratch by gradient descent on a multi-resolution STFT
loss — the canonical GRAFX workflow (SURVEY.md §3.5), end to end on
whatever backend JAX picks (TPU if available).

Run:  python examples/match_mix.py [--steps 200]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.checkpoint import save_session
from grafx_tpu.models import GraphParameterOptimizer, mixing_console
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache

SR = 44100


def synthetic_stems(num_tracks, length, key):
    """Tonal + noisy synthetic stems with distinct spectra per track."""
    keys = jax.random.split(key, num_tracks)
    t = jnp.arange(length) / SR
    stems = []
    for i, k in enumerate(keys):
        f0 = 80.0 * (2.0 ** (i / 2.0))
        tone = 0.3 * jnp.sin(2 * jnp.pi * f0 * t) * jnp.exp(-((t % 0.5) * 4))
        noise = 0.05 * jax.random.normal(k, (length,))
        mono = tone + noise
        pan = i / max(num_tracks - 1, 1)
        stems.append(jnp.stack([mono * (1 - 0.5 * pan), mono * (0.5 + 0.5 * pan)]))
    return jnp.stack(stems)  # (T, 2, L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--tracks", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=1.5)
    ap.add_argument("--save", type=str, default=None)
    args = ap.parse_args()

    enable_compilation_cache()
    length = 1 << int(args.seconds * SR).bit_length()

    G, processors = mixing_console(
        num_tracks=args.tracks,
        track_chain=("eq", "compressor", "gain"),
        bus_chain=("geq",),
        reverb_send=True,
        ir_len=8000,
    )
    print(f"console: {G.number_of_nodes()} nodes, backend={jax.default_backend()}")

    stems = synthetic_stems(args.tracks, length, jax.random.PRNGKey(0))

    # ground-truth parameters -> target mix
    opt_gt = GraphParameterOptimizer(G, processors, key=jax.random.PRNGKey(7))
    gt_params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(8), p.shape),
        opt_gt.params,
    )
    opt_gt.params = gt_params
    target = opt_gt.render_current(stems)
    print("target rendered:", target.shape)

    # recover parameters from scratch
    opt = GraphParameterOptimizer(G, processors, key=jax.random.PRNGKey(1))
    t0 = time.time()
    history = opt.fit(stems, target, num_steps=args.steps, log_every=50)
    dt = time.time() - t0
    print(
        f"fit {args.steps} steps in {dt:.1f}s"
        f" ({dt / args.steps * 1000:.1f} ms/step);"
        f" loss {history[0]:.4f} -> {history[-1]:.4f}"
    )
    assert history[-1] < history[0], "optimization did not reduce the loss"

    if args.save:
        save_session(args.save, G, opt.params, metadata={"steps": args.steps})
        print(f"session saved to {args.save}")


if __name__ == "__main__":
    main()

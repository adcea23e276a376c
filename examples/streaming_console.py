"""Stream the 100-node mixing console block-by-block in real time.

Demonstrates the streaming renderer (grafx_tpu.render.StreamRenderer):
the same static render plan as the one-shot ``render_grafx`` path, but
executed one audio block at a time with carried per-node state — exact
IIR filter states, compressor/gate envelopes, reverb convolution tails.

Prints (a) parity of the streamed output against the one-shot render and
(b) the real-time factor (audio seconds processed per wall-clock second)
at the configured block size, i.e. the serving latency/throughput
trade-off.

Run: python examples/streaming_console.py [block_len]  (default 4096)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import NUM_CHAINS, SR, build_mix_graph
from grafx_tpu.data import convert_to_tensor
from grafx_tpu.processors import (
    Compressor,
    GraphicEqualizer,
    NoiseGate,
    ParametricEqualizer,
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
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache


def main():
    enable_compilation_cache()
    block_len = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    audio_len = 2**17

    G = build_mix_graph()
    processors = {
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir_exact"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=30000),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (NUM_CHAINS, 2, audio_len))

    # one-shot reference
    render = make_render_fn(processors, plan)
    full, _, _ = render(x, params)
    full = np.asarray(jax.block_until_ready(full))

    # streamed
    streamer = StreamRenderer(processors, plan, params, block_len=block_len)
    state = streamer.init_state()
    n_blocks = audio_len // block_len
    outs = []
    for k in range(n_blocks):  # includes compile on first block
        y, state = streamer(x[..., k * block_len : (k + 1) * block_len], state)
        outs.append(y)
    jax.block_until_ready(outs[-1])
    streamed = np.concatenate([np.asarray(o) for o in outs], axis=-1)

    scale = np.abs(full).max() + 1e-9
    err_db = 20 * np.log10(np.abs(streamed - full).max() / scale + 1e-12)
    print(f"streamed vs one-shot: max error {err_db:.1f} dB re peak")

    # timed streaming loop (steady state, post-compile)
    state = streamer.init_state()
    t0 = time.time()
    reps = 0
    for _ in range(3):
        for k in range(n_blocks):
            y, state = streamer(
                x[..., k * block_len : (k + 1) * block_len], state
            )
            reps += 1
    jax.block_until_ready(y)
    dt = time.time() - t0
    block_ms = dt / reps * 1000
    rtf = (reps * block_len / SR) / dt
    print(
        f"block {block_len} ({block_len / SR * 1000:.1f} ms of audio):"
        f" {block_ms:.2f} ms/block -> RTF {rtf:.1f}x real time"
        f" ({G.number_of_nodes()}-node console, {NUM_CHAINS} sources,"
        f" backend {jax.default_backend()})"
    )

    # multi-block serving mode: k blocks per dispatch (step_many) —
    # amortizes the ~2 ms per-dispatch tunnel floor that dominates the
    # per-block cost at 4096 (VERDICT r4 #5); latency rises to k blocks.
    for k_blocks in (4, 16):
        if n_blocks % k_blocks:
            continue
        xg = jnp.stack(
            [
                x[..., i * block_len : (i + 1) * block_len]
                for i in range(n_blocks)
            ]
        ).reshape(
            n_blocks // k_blocks, k_blocks, NUM_CHAINS, 2, block_len
        )
        state = streamer.init_state()
        outs = []
        for g in range(n_blocks // k_blocks):  # compile on first group
            yb, state = streamer.step_many(xg[g], state)
            outs.append(yb)
        jax.block_until_ready(outs[-1])
        many = np.concatenate(
            [np.asarray(o) for o in outs], axis=0
        ).transpose(1, 2, 0, 3).reshape(full.shape)
        err_db = 20 * np.log10(np.abs(many - full).max() / scale + 1e-12)

        state = streamer.init_state()
        t0 = time.time()
        reps = 0
        for _ in range(3):
            for g in range(n_blocks // k_blocks):
                yb, state = streamer.step_many(xg[g], state)
                reps += k_blocks
        jax.block_until_ready(yb)
        dt = time.time() - t0
        rtf = (reps * block_len / SR) / dt
        print(
            f"step_many k={k_blocks} ({k_blocks * block_len / SR * 1000:.0f}"
            f" ms latency): {dt / reps * 1000:.2f} ms/block -> RTF"
            f" {rtf:.1f}x real time (parity {err_db:.1f} dB)"
        )


if __name__ == "__main__":
    main()

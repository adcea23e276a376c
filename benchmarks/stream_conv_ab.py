"""Interleaved on-chip A/B: streaming-conv state representation.

Arms: ``upols`` (frequency-domain partitioned delay line — the last
``m-1`` segment spectra) vs ``tail`` (time-domain overlap-add tail) for
the streamed 100-node console's reverb (ir_len 30000) at a given block
size.  Each round builds BOTH streamers fresh (the ``GRAFX_TPU_STREAM_CONV``
knob is read at ``conv_stream_init`` time) and times the same block loop,
so arm comparisons are same-session and interleaved — the only
decision-grade protocol on the tunneled TPU (BASELINE.md: ~20% day
drift, ~1.5 ms run-to-run).

Run: python benchmarks/stream_conv_ab.py [block_len] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import SR, build_mix_graph
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
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache


def build():
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
    params = create_empty_parameters(processors, G)
    return processors, plan, params, G


def time_arm(mode, processors, plan, params, x, block_len, reps=3):
    os.environ["GRAFX_TPU_STREAM_CONV"] = mode
    streamer = StreamRenderer(
        processors, plan, params, block_len=block_len
    )
    n_blocks = x.shape[-1] // block_len
    state = streamer.init_state()
    # warmup / compile
    y, state = streamer(x[..., :block_len], state)
    jax.block_until_ready(y)
    times = []
    for _ in range(reps):
        state = streamer.init_state()
        t0 = time.perf_counter()
        for k in range(n_blocks):
            y, state = streamer(
                x[..., k * block_len : (k + 1) * block_len], state
            )
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / n_blocks * 1000)
    return times


def main():
    enable_compilation_cache()
    block_len = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    audio_len = 2**17

    processors, plan, params, G = build()
    num_sources = sum(
        1 for n in G.nodes if G.nodes[n]["node_type"] == "in"
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (num_sources, 2, audio_len)
    )

    results = {"upols": [], "tail": []}
    for r in range(rounds):
        for mode in ("upols", "tail"):
            ts = time_arm(mode, processors, plan, params, x, block_len)
            results[mode].extend(ts)
            print(
                f"round {r} {mode}: "
                + ", ".join(f"{t:.2f}" for t in ts)
                + " ms/block",
                flush=True,
            )
    summary = {}
    for mode, ts in results.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        summary[mode] = {
            "median_ms_per_block": round(med, 3),
            "min": round(ts[0], 3),
            "max": round(ts[-1], 3),
            "rtf": round((block_len / SR) / (med / 1000), 1),
        }
    print(json.dumps({"block_len": block_len, **summary}))


if __name__ == "__main__":
    main()

"""Low-latency serving demo: stream a WAV file through a processing
graph block-by-block and write the processed WAV.

The serving loop a live audio host would run: fixed parameters, a
StreamRenderer compiled once, one block in -> one block out with all
filter/envelope/reverb state carried between blocks.

Usage:
    python examples/serve_stream_wav.py [in.wav] [out.wav] [block]

Defaults: the reference checkout's drums sample (read-only) if present,
else a synthetic program; out = outputs/served.wav; block = 4096.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    Compressor,
    GraphicEqualizer,
    ParametricEqualizer,
    STFTMaskedNoiseReverb,
    StereoGain,
)
from grafx_tpu.render import (
    StreamRenderer,
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache

SR = 44100
REF_SAMPLE = "/root/reference/tests/samples/drums.wav"


def load_input(path):
    from scipy.io import wavfile

    if path and os.path.isfile(path):
        sr, x = wavfile.read(path)
        x = np.asarray(x, np.float32)
        if np.abs(x).max() > 2.0:
            x = x / 32768.0
        if x.ndim == 1:
            x = np.stack([x, x], 1)
        return sr, x.T  # (2, T)
    t = np.arange(SR * 4) / SR
    x = 0.4 * np.sin(2 * np.pi * (55 * t + 800 * t**2 / t[-1]))
    return SR, np.stack([x, x]).astype(np.float32)


def main():
    enable_compilation_cache()
    in_path = sys.argv[1] if len(sys.argv) > 1 else REF_SAMPLE
    out_path = sys.argv[2] if len(sys.argv) > 2 else "outputs/served.wav"
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    sr, audio = load_input(in_path)

    procs = {
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "comp": Compressor(energy_smoother="ballistics"),
        "gain": StereoGain(),
        "reverb": STFTMaskedNoiseReverb(ir_len=30000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "eq", "geq", "comp", "gain", "reverb", "out"])

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))

    streamer = StreamRenderer(procs, plan, params, block_len=block)

    # Ship the streaming step as a self-contained artifact (kernel
    # caches baked in, initial state inside) and serve from the loaded
    # copy — what a separate serving process would do.
    from grafx_tpu.serving import export_stream_step, load_stream_step

    example = jnp.zeros((1, 2, block), jnp.float32)
    blob = export_stream_step(streamer, example)
    step, state = load_stream_step(blob)
    print(f"exported streaming step: {len(blob) / 1e6:.1f} MB artifact")

    n_blocks = audio.shape[-1] // block
    out = np.zeros((2, n_blocks * block), np.float32)
    t0 = time.time()
    for k in range(n_blocks):
        blk = jnp.asarray(audio[None, :, k * block : (k + 1) * block])
        y, state = step(blk, state)
        out[:, k * block : (k + 1) * block] = np.asarray(y[0])
    dt = time.time() - t0
    audio_s = n_blocks * block / sr
    print(
        f"served {audio_s:.1f} s of audio in {dt:.2f} s"
        f" ({audio_s / dt:.1f}x real time incl. compile,"
        f" block {block} = {block / sr * 1000:.0f} ms latency,"
        f" backend {jax.default_backend()})"
    )

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    from scipy.io import wavfile

    peak = np.abs(out).max() + 1e-9
    wavfile.write(out_path, sr, (np.clip(out / peak, -1, 1) * 32767).astype(np.int16).T)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

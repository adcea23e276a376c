"""Count FFT ops in a compiled grad-step HLO, by kind and length.

Diagnostic for the config-2 (zero-phase EQ + 60k reverb) FFT budget:
the minimum for one fwd+bwd linear convolution is 6 transforms (3 fwd:
rfft(x), rfft(h), irfft; 3 bwd: rfft(dy), irfft for dx, irfft for dh).
Anything above that is recomputation the custom-VJP path should remove.

Usage: python benchmarks/count_ffts.py [audio_len] (CPU-safe; counts are
backend-independent since they come from the optimized HLO).
"""

import collections
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import NewZeroPhaseFIREqualizer, STFTMaskedNoiseReverb
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.utils import create_empty_parameters


def fft_counts(step_fn, *args):
    hlo = jax.jit(step_fn).lower(*args).compile().as_text()
    counts = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"fft\(", line)
        if m is None or "custom-call" in line and "fft" not in line:
            continue
        typ = re.search(r"fft_type=(\w+)", line)
        length = re.search(r"fft_length=\{(\d+)\}", line)
        if typ and length:
            counts[(typ.group(1), int(length.group(1)))] += 1
    return counts, hlo


def main():
    audio_len = int(sys.argv[1]) if len(sys.argv) > 1 else 5 * 44100
    procs = {
        "zpeq": NewZeroPhaseFIREqualizer(num_frequency_bins=1024),
        "reverb": STFTMaskedNoiseReverb(ir_len=60000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "zpeq", "reverb", "out"])
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(procs, plan, jit=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 2, audio_len))

    def step(p):
        def loss(p):
            out, _, _ = render(x, p)
            return jnp.mean(out**2)

        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree.map(lambda w, gg: w - 1e-3 * gg, p, g)

    counts, _ = fft_counts(step, params)
    total = 0
    for (typ, n), c in sorted(counts.items(), key=lambda kv: -kv[0][1]):
        print(f"{typ:5s} n={n:>8d}  x{c}")
        total += c
    print(f"total FFT ops: {total}")


if __name__ == "__main__":
    main()

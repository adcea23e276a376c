"""Per-type cost attribution on the headline bench graph.

For each processor type, replace it with StereoGain (approximately free)
and re-time the full grad step; the delta vs the full config is that
type's marginal cost.  Honest varied-input protocol (a real optimizer
loop), same as bench.py.

Usage: python benchmarks/ablate.py [BATCH]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
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
    make_render_fn,
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache


def full_processors():
    return {
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir_exact"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=30000),
    }


def time_config(G, processors, B, iters=15):
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(processors, plan)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (B, bench.NUM_CHAINS, 2, bench.AUDIO_LEN)
    )
    target = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 2, bench.AUDIO_LEN))

    @jax.jit
    def train_step(p):
        def loss_fn(p):
            out, _, _ = render(x, p)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return loss, jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)

    loss, params = train_step(params)
    jax.block_until_ready(params)
    t0 = time.time()
    for _ in range(iters):
        loss, params = train_step(params)
    jax.block_until_ready(params)
    return (time.time() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    enable_compilation_cache()
    G = bench.build_mix_graph()

    base = time_config(G, full_processors(), B)
    print(f"full: {base * 1e3:8.2f} ms/step")
    for drop in ("eq", "geq", "compressor", "noisegate", "dist", "reverb"):
        procs = full_processors()
        procs[drop] = StereoGain()
        t = time_config(G, procs, B)
        print(
            f"no-{drop:11s}: {t * 1e3:8.2f} ms/step"
            f"  (marginal {1e3 * (base - t):+7.2f} ms)"
        )


if __name__ == "__main__":
    main()

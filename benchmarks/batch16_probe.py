"""Root-cause probe for the batch-16 HTTP 413 (VERDICT r3 #5).

Round 3 found BENCH_BATCH=16 cannot compile through the tunnel: the
remote_compile request exceeds the tunnel's request-size cap (HTTP
413), while batch 12 fits.  Two candidate causes:

1. the HLO/StableHLO program itself grows with batch (accidental
   program growth — constants, unrolling);
2. the compile REQUEST carries example input buffers (batch 16 inputs
   are 16 x 17 x 2 x 2^17 f32 ~ 285 MB), i.e. payload, not program.

This probe measures (a) the StableHLO text size of the lowered
train_step at batch 4/8/12/16 (pure program size — lowering is local
and needs no tunnel round-trip with abstract inputs) and (b) attempts
an AOT compile at batch 16 (jit(...).lower(abstract).compile()), which
ships shapes instead of arrays.  If (a) is ~flat and (b) succeeds, the
413 is input-buffer payload and AOT lowering is the fix; if (b) still
413s, the cap binds on the program/output side.

Usage: python benchmarks/batch16_probe.py [batches...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import bench
from grafx_tpu.data import convert_to_tensor
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.utils import create_empty_parameters


def build(batch):
    G = bench.build_mix_graph()
    processors = {
        "eq": bench.ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": bench.GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": bench.Compressor(energy_smoother="ballistics"),
        "noisegate": bench.NoiseGate(energy_smoother="iir_exact"),
        "gain": bench.StereoGain(),
        "dist": bench.TanhDistortion(),
        "reverb": bench.STFTMaskedNoiseReverb(ir_len=30000),
    }
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(processors, plan)

    x_spec = jax.ShapeDtypeStruct(
        (batch, bench.NUM_CHAINS, 2, bench.AUDIO_LEN), jnp.float32
    )
    t_spec = jax.ShapeDtypeStruct((batch, 1, 2, bench.AUDIO_LEN), jnp.float32)

    def train_step(p, x, target):
        def loss_fn(p):
            out, _, _ = render(x, p)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)
        return loss, p

    return train_step, params, x_spec, t_spec


def main():
    batches = [int(b) for b in sys.argv[1:]] or [4, 8, 12, 16]
    for batch in batches:
        train_step, params, x_spec, t_spec = build(batch)
        t0 = time.time()
        lowered = jax.jit(train_step).lower(params, x_spec, t_spec)
        text = lowered.as_text()
        print(
            f"batch {batch:2d}: StableHLO text {len(text) / 1e6:7.2f} MB"
            f"  (lowered in {time.time() - t0:.1f}s)",
            flush=True,
        )
    # AOT compile attempt at the largest batch (shapes only — no input
    # buffers in the request)
    batch = batches[-1]
    train_step, params, x_spec, t_spec = build(batch)
    t0 = time.time()
    try:
        compiled = jax.jit(train_step).lower(params, x_spec, t_spec).compile()
        mem = compiled.memory_analysis()
        print(f"batch {batch}: AOT compile OK in {time.time() - t0:.1f}s")
        if mem is not None:
            print(
                f"  temp {getattr(mem, 'temp_size_in_bytes', 0) / 2**30:.2f} GiB,"
                f" args {getattr(mem, 'argument_size_in_bytes', 0) / 2**30:.2f} GiB,"
                f" output {getattr(mem, 'output_size_in_bytes', 0) / 2**30:.2f} GiB"
            )
        # execute one step with real (device-resident) inputs
        x = jax.random.normal(jax.random.PRNGKey(1), x_spec.shape)
        tgt = jax.random.normal(jax.random.PRNGKey(2), t_spec.shape)
        loss, params2 = compiled(params, x, tgt)
        jax.block_until_ready(params2)
        print(f"batch {batch}: one AOT step executed, loss={float(loss):.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"batch {batch}: AOT compile FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()

"""The six BASELINE.md benchmark configurations.

Each config builds a graph + processors, renders with a real optimizer
loop (inputs change every step — see MEMORY: the tunneled runtime caches
repeated identical calls), and reports audio-sec/sec/chip.

Run:  python benchmarks/configs.py [1-6|all]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    BiquadFilter,
    Compressor,
    NewZeroPhaseFIREqualizer,
    NoiseGate,
    ParametricEqualizer,
    STFTMaskedNoiseReverb,
    StateVariableFilter,
    StereoGain,
    SideGainImager,
)
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.utils import create_empty_parameters

SR = 44100


def _measure(G, processors, num_sources, audio_len, batch=None, iters=10):
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(processors, plan, jit=False)

    shape = (num_sources, 2, audio_len)
    if batch:
        shape = (batch,) + shape
    x = jax.random.normal(jax.random.PRNGKey(1), shape)

    @jax.jit
    def step(p):
        def loss(p):
            out, _, _ = render(x, p)
            return jnp.mean(out**2)

        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree.map(lambda w, gg: w - 1e-3 * gg, p, g)

    l, params = step(params)
    jax.block_until_ready(params)
    t0 = time.time()
    for _ in range(iters):
        l, params = step(params)
    jax.block_until_ready(params)
    dt = (time.time() - t0) / iters
    audio_sec = (batch or 1) * num_sources * audio_len / SR
    return dt, audio_sec / dt


def config1():
    """3-node mono-ish chain: gain -> imager -> parametric EQ, 1 s."""
    procs = {
        "gain": StereoGain(),
        "pan": SideGainImager(),
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "gain", "pan", "eq", "out"])
    return _measure(G, procs, 1, SR)


def config2():
    """Zero-phase EQ + FFT-convolution reverb graph, batch 16, 5 s.

    ``CONFIGS_FUSE=1`` applies the opt-in LTI-chain fusion pass
    (render/fuse.py) first — reported separately in BASELINE.md, the
    headline config-2 number stays unfused."""
    import os

    procs = {
        "zpeq": NewZeroPhaseFIREqualizer(num_frequency_bins=1024),
        "reverb": STFTMaskedNoiseReverb(ir_len=60000),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    G.add_serial_chain(["in", "zpeq", "reverb", "out"])
    if os.environ.get("CONFIGS_FUSE") == "1":
        from grafx_tpu.render import fuse_serial_lti

        G, procs = fuse_serial_lti(G, procs)
    return _measure(G, procs, 1, 5 * SR, batch=16)


def config3():
    """Biquad/SVF IIR filter-bank graph, exact backend.

    ``CONFIGS_FUSE=1`` applies IIR-cascade fusion (biquad+svf runs fold
    into one cascade per chain)."""
    import os

    procs = {
        "biquad": BiquadFilter(num_filters=4, backend="exact"),
        "svf": StateVariableFilter(num_filters=4, backend="exact"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(8):
        _, last = G.add_serial_chain(["in", "biquad", "svf"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    out = G.add("out")
    G.connect(mix, out)
    if os.environ.get("CONFIGS_FUSE") == "1":
        from grafx_tpu.render import fuse_serial_lti

        G, procs = fuse_serial_lti(G, procs)
    return _measure(G, procs, 8, 2**17)


def config4():
    """Dynamics graph: compressor + noisegate, ballistics smoothing.

    ``CONFIGS_FUSE=1`` applies dynamics fusion: each gate -> comp pair
    folds into one shared-energy node whose gains come from ONE Pallas
    pair walk (ballistics_gain_pair_core) instead of two kernels."""
    import os

    procs = {
        "comp": Compressor(energy_smoother="ballistics"),
        "gate": NoiseGate(energy_smoother="ballistics"),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = []
    for _ in range(8):
        _, last = G.add_serial_chain(["in", "gate", "comp"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    out = G.add("out")
    G.connect(mix, out)
    if os.environ.get("CONFIGS_FUSE") == "1":
        from grafx_tpu.render import fuse_serial_lti

        G, procs = fuse_serial_lti(G, procs)
    return _measure(G, procs, 8, 2**17)


def config5():
    """Full ~100-node mixing console (the bench.py headline)."""
    import bench

    bench.main()
    return None


def config6():
    """Mastering-style serial-filter workload: 17 chains of
    LowShelf -> Peaking -> HighShelf -> LowPass -> gain, batch 4, 2^17.

    The showcase for IIR-cascade fusion (``CONFIGS_FUSE=1``): the four
    serial exact-cascade applies per chain fold into one
    (BASELINE.md round 3: 7.5 -> 3.5 ms/step measured)."""
    import os

    from grafx_tpu.processors import (
        HighShelf,
        LowPassFilter,
        LowShelf,
        PeakingFilter,
    )

    procs = {
        "ls": LowShelf(backend="exact"),
        "pk": PeakingFilter(backend="exact"),
        "hs": HighShelf(backend="exact"),
        "lp": LowPassFilter(backend="exact"),
        "gain": StereoGain(),
    }
    G = GRAFX(config=NodeConfigs(list(procs)))
    ends = []
    for _ in range(17):
        _, last = G.add_serial_chain(["in", "ls", "pk", "hs", "lp", "gain"])
        ends.append(last)
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    out = G.add("out")
    G.connect(mix, out)
    if os.environ.get("CONFIGS_FUSE") == "1":
        from grafx_tpu.render import fuse_serial_lti

        G, procs = fuse_serial_lti(G, procs)
    return _measure(G, procs, 17, 2**17, batch=4)


CONFIGS = {
    "1": config1,
    "2": config2,
    "3": config3,
    "4": config4,
    "5": config5,
    "6": config6,
}


def main():
    from grafx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sorted(CONFIGS) if which == "all" else [which]
    for n in names:
        result = CONFIGS[n]()
        if result is not None:
            dt, aps = result
            print(
                json.dumps(
                    {
                        "config": int(n),
                        "grad_step_ms": round(dt * 1000, 2),
                        "audio_sec_per_sec_per_chip": round(aps, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Profile the headline bench step and print a device-time breakdown.

Captures a ``jax.profiler`` trace of a few optimizer steps on the real
TPU and aggregates device-stream op durations by category (ballistics
kernels, FFT, data movement, elementwise fusion, ...).  This is the tool
behind the breakdown tables in BASELINE.md.

Usage:
    python benchmarks/profile_bench.py [BATCH]
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def capture(step_fn, params, steps=3, log_dir=None):
    """Run ``params = step_fn(params)[1]`` under a profiler trace."""
    if log_dir is None:
        log_dir = tempfile.mkdtemp(prefix="grafx_prof_")
    # warmup/compile outside the trace
    loss, params = step_fn(params)
    jax.block_until_ready(params)
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        loss, params = step_fn(params)
    jax.block_until_ready(params)
    jax.profiler.stop_trace()
    return log_dir


CATEGORIES = (
    ("ballistics-kernel", ("ballistics", "_kernel", "_bwd_kernel", "pallas")),
    ("fft", ("fft",)),
    ("einsum/matmul", ("dot", "einsum", "conv")),
    ("data-movement", ("copy", "pad", "slice", "transpose", "concatenate",
                       "dynamic-update", "dynamic_update", "gather",
                       "scatter", "select-and-scatter", "reshape",
                       "broadcast", "iota")),
    ("reduce", ("reduce",)),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        for k in keys:
            if k in low:
                return cat
    return "elementwise/fusion"


def summarize(log_dir, top=25):
    paths = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # Only the leaf "XLA Ops" lane: the "XLA Modules" lane ALSO carries
    # device_duration_ps and its totals equal the sum of its ops, so a
    # presence-only filter double-counts exactly 2x (r5 dissection).
    from grafx_tpu.profiling import device_op_lanes

    ops_lanes = device_op_lanes(events)

    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_src = collections.Counter()
    dm_op = collections.Counter()   # data-movement ops, keyed (name, src)
    dm_src = collections.Counter()  # data-movement time per source line
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_lanes:
            continue
        if "args" not in e or "device_duration_ps" not in e.get("args", {}):
            continue
        name = e.get("name", "")
        if name.startswith("$") or name in ("", "unknown"):
            continue
        dur = float(e["args"]["device_duration_ps"]) / 1e12  # ps -> s
        per_op[name] += dur
        cat = categorize(name)
        per_cat[cat] += dur
        src = e["args"].get("source", "?")
        per_src[src] += dur
        if cat == "data-movement":
            dm_op[(name, src)] += dur
            dm_src[src] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device op time: {total * 1e3:.2f} ms (across trace)")
    print("\n-- by category --")
    for cat, t in per_cat.most_common():
        print(f"{t * 1e3:9.2f} ms  {100 * t / total:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for name, t in per_op.most_common(top):
        print(f"{t * 1e3:9.2f} ms  {name[:110]}")
    print(f"\n-- top {top} source lines --")
    for srcline, t in per_src.most_common(top):
        print(f"{t * 1e3:9.2f} ms  {srcline[:110]}")
    if os.environ.get("PROFILE_DM_DETAIL", "1") == "1":
        print(f"\n-- data movement: top {top + 15} ops (with source) --")
        for (name, src), t in dm_op.most_common(top + 15):
            print(f"{t * 1e3:9.2f} ms  {name[:60]:60s}  {src[-60:]}")
        print(f"\n-- data movement: by source line --")
        for src, t in dm_src.most_common(top):
            print(f"{t * 1e3:9.2f} ms  {src[:110]}")
    split_build_apply(per_src)
    return per_cat, per_op


# Exact-IIR engine: which ops/iir.py functions are parameter-dependent
# kernel BUILD vs signal-path APPLY (VERDICT r4 #4 — the eq/geq marginal
# attribution).  Resolved per trace source line via the enclosing def.
_IIR_BUILD_FNS = {
    "_compensated_disc", "_cum_powers", "_stage_eigen_kernels",
    "biquad_exact_build", "_cascade_kernels_doubling", "_tconv",
    "_causal_toeplitz", "_causal_toeplitz_nd", "_normalize",
}
_IIR_APPLY_FNS = {
    "_biquad_block_stage", "_biquad_block_stage_apply",
    "biquad_exact", "biquad_exact_apply", "_biquad_block_cascade",
    "_biquad_block_cascade_apply", "_doubling_flat", "_doubling_apply",
    "_propagate_states", "_propagate_states_fwd", "_propagate_states_bwd",
}


def _def_index(pyfile):
    """Sorted (lineno, name) for every top-level/nested def in a file."""
    import re

    idx = []
    with open(pyfile) as f:
        for i, line in enumerate(f, 1):
            m = re.match(r"\s*def\s+(\w+)", line)
            if m:
                idx.append((i, m.group(1)))
    return idx


def split_build_apply(per_src):
    """Aggregate ops/iir.py device time into kernel-build vs apply, and
    surface the coefficient-design share (geq.py / eq.py / filter.py)."""
    import bisect

    cache = {}
    buckets = collections.Counter()
    for src, t in per_src.items():
        if ":" not in src:
            continue
        path, _, lineno = src.rpartition(":")
        try:
            lineno = int(lineno)
        except ValueError:
            continue
        base = os.path.basename(path)
        if base == "iir.py" and "ops" in path:
            if path not in cache:
                try:
                    cache[path] = _def_index(path)
                except OSError:
                    cache[path] = []
            idx = cache[path]
            pos = bisect.bisect_right([l for l, _ in idx], lineno) - 1
            fn = idx[pos][1] if pos >= 0 else "?"
            if fn in _IIR_BUILD_FNS:
                buckets["iir kernel BUILD"] += t
            elif fn in _IIR_APPLY_FNS:
                buckets["iir APPLY"] += t
            else:
                buckets[f"iir other ({fn})"] += t
        elif base in ("geq.py", "eq.py", "filter.py", "fuse.py"):
            buckets[f"coef design ({base})"] += t
    if not buckets:
        return
    print("\n-- exact-IIR build vs apply (device ms across trace) --")
    for k, t in buckets.most_common():
        print(f"{t * 1e3:9.2f} ms  {k}")


def main_config2():
    """Profile BASELINE config 2 (zero-phase EQ + 60k reverb, batch 16)
    instead of the console: ``python benchmarks/profile_bench.py c2``."""
    import jax.numpy as jnp

    from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
    from grafx_tpu.processors import NewZeroPhaseFIREqualizer, STFTMaskedNoiseReverb
    from grafx_tpu.render import (
        make_render_fn,
        prepare_render,
        reorder_for_fast_render,
    )
    from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache

    enable_compilation_cache()
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
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 1, 2, 5 * 44100))

    @jax.jit
    def train_step(p):
        def loss_fn(p):
            out, _, _ = render(x, p)
            return jnp.mean(out**2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)
        return loss, p

    steps = 3
    log_dir = capture(train_step, params, steps=steps)
    per_cat, _ = summarize(log_dir)
    print(f"\nper-step by category (trace / {steps}):")
    for cat, t in per_cat.most_common():
        print(f"{t * 1e3 / steps:9.2f} ms  {cat}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "c2":
        return main_config2()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else None
    import bench

    if batch is not None:
        bench.BATCH = batch

    from grafx_tpu.data import convert_to_tensor
    from grafx_tpu.render import (
        make_render_fn,
        prepare_render,
        reorder_for_fast_render,
    )
    from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache

    enable_compilation_cache()
    G = bench.build_mix_graph()
    from grafx_tpu.processors import (
        Compressor,
        GraphicEqualizer,
        NoiseGate,
        ParametricEqualizer,
        STFTMaskedNoiseReverb,
        StereoGain,
        TanhDistortion,
    )

    processors = {
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir_exact"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=30000),
    }

    # Mirror bench.py's r5 fusion defaults (BENCH_FUSE / BENCH_FUSE_DYN)
    # so the profile reflects the actual headline program.
    fuse_kinds = []
    if os.environ.get("BENCH_FUSE", "1") == "1":
        fuse_kinds += ["fir", "iir"]
    dyn_mode = os.environ.get("BENCH_FUSE_DYN", "pad")
    if dyn_mode != "0":
        fuse_kinds += ["dynamics"]
    if fuse_kinds:
        from grafx_tpu.render import fuse_serial_lti

        G, processors = fuse_serial_lti(
            G,
            processors,
            kinds=tuple(fuse_kinds),
            dynamics_pad=(dyn_mode == "pad"),
        )

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(processors, plan)

    B = bench.BATCH
    shape = (B, bench.NUM_CHAINS, 2, bench.AUDIO_LEN)
    x = jax.random.normal(jax.random.PRNGKey(1), shape)
    target = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 2, bench.AUDIO_LEN))

    @jax.jit
    def train_step(p):
        def loss_fn(p):
            out, _, _ = render(x, p)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)
        return loss, p

    steps = 3
    log_dir = capture(train_step, params, steps=steps)
    per_cat, _ = summarize(log_dir)
    print(f"\nper-step by category (trace / {steps}):")
    for cat, t in per_cat.most_common():
        print(f"{t * 1e3 / steps:9.2f} ms  {cat}")


if __name__ == "__main__":
    main()

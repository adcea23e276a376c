"""Headline benchmark: 100-node mixing-console graph, fwd+bwd grad step.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

Workload (BASELINE.md config 5): a ~100-node heterogeneous music-mixing
graph — 17 source chains of (eq -> compressor -> gain, some with
noisegate/geq/dist), two bus chains, and a master chain — rendered on
44.1 kHz stereo, 2^17 samples per source, at graph-batch 4 (the
production-serving configuration: per-step fixed overheads amortize
across batched graphs; see BASELINE.md for the batch sweep), with a
full gradient step (forward + backward over all node parameters).

``vs_baseline`` is the speedup over the same-machine GRAFX-style
torch-CPU proxy (benchmarks/torch_proxy.py): the same 84-node graph and
schedule executed with the reference's default algorithms (FSM biquad
approximation, truncated-IIR smoothing, per-stage Python loop) in plain
torch on this host's CPU.  The real reference cannot run here (its
native deps are not installed); the proxy is the honest stand-in, and it
is *cheaper* than the reference default (no ballistics).
"""

import json
import time

import jax
import jax.numpy as jnp

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    Compressor,
    GraphicEqualizer,
    NoiseGate,
    ParametricEqualizer,
    STFTMaskedNoiseReverb,
    StereoGain,
    TanhDistortion,
)
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.utils import create_empty_parameters

SR = 44100
AUDIO_LEN = 2**17
NUM_CHAINS = 17
import os

BATCH = int(os.environ.get("BENCH_BATCH", "4"))  # graph-batch: production serving renders several mixes per step
# Same-machine GRAFX-style torch-CPU proxy on this exact graph
# (benchmarks/torch_proxy.py, measured 2026-08-16: 3677 ms/step).
TORCH_CPU_PROXY_BASELINE = 13.74  # audio-sec/sec


def build_mix_graph():
    """~100-node console: per-source chains + two buses + master."""
    config = NodeConfigs(
        ["eq", "geq", "compressor", "noisegate", "gain", "dist", "reverb"]
    )
    G = GRAFX(config=config)
    chain_ends = []
    for i in range(NUM_CHAINS):
        chain = ["in", "eq", "compressor", "gain"]
        if i % 3 == 0:
            chain.insert(2, "noisegate")
        if i % 4 == 0:
            chain.append("dist")
        if i % 2 == 0:
            chain.insert(2, "geq")
        _, last = G.add_serial_chain(chain)
        chain_ends.append(last)

    # two subgroup buses with processing, plus a shared reverb send
    bus_ends = []
    for half in (chain_ends[: NUM_CHAINS // 2], chain_ends[NUM_CHAINS // 2 :]):
        mix = G.add("mix")
        for e in half:
            G.connect(e, mix)
        bus_first, bus_end = G.add_serial_chain(["geq", "compressor"])
        G.connect(mix, bus_first)
        bus_ends.append(bus_end)

    send_mix = G.add("mix")
    for e in bus_ends:
        G.connect(e, send_mix)
    rev = G.add("reverb")
    G.connect(send_mix, rev)

    master = G.add("mix")
    for e in bus_ends:
        G.connect(e, master)
    G.connect(rev, master)
    master_first, master_end = G.add_serial_chain(["eq", "gain"])
    G.connect(master, master_first)
    out = G.add("out")
    G.connect(master_end, out)
    return G


def main():
    from grafx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # Automated on-device exactness gate for the PREC_APPLY relaxation
    # (ADVICE r2): CPU tests cannot see TPU MXU precision, so verify the
    # exact-cascade contract on THIS chip before timing; escalate to
    # HIGHEST precision (and disclose it in the metric) if violated.
    from grafx_tpu.ops import iir as iir_ops

    precision_note = ""
    exact_db = iir_ops.exactness_check_db()
    if exact_db > -60.0:
        iir_ops.set_exact_apply_precision("highest")
        retry_db = iir_ops.exactness_check_db()
        precision_note = (
            f"; apply-precision escalated to HIGHEST on-device"
            f" ({exact_db:.1f} dB -> {retry_db:.1f} dB)"
        )

    G = build_mix_graph()
    num_nodes = G.number_of_nodes()

    processors = {
        "eq": ParametricEqualizer(num_filters=6, backend="exact"),
        "geq": GraphicEqualizer(scale="bark", backend="exact"),
        "compressor": Compressor(energy_smoother="ballistics"),
        "noisegate": NoiseGate(energy_smoother="iir_exact"),
        "gain": StereoGain(),
        "dist": TanhDistortion(),
        "reverb": STFTMaskedNoiseReverb(ir_len=30000),
    }

    # Fusion defaults flipped ON in round 5: the interleaved device-time
    # matrix (outputs/evidence/ab_matrix/, BASELINE.md r5) measured
    # default 16.69 / dyn=pad 16.36 / fuse+dyn=pad 15.43 ms device per
    # step (bit-stable across rounds; wall medians 22.9/22.8/22.8 were
    # inside ~1.5 ms tunnel noise).  dyn default moved pad -> "auto"
    # later in r5: demoting the two bus compressors (which never
    # co-schedule with a genuine gate->comp pair) back to single walks
    # measured device 14.66 vs pad 15.43 ms/step same-day
    # (outputs/evidence/r5b/bench_dyn_auto.log).  BENCH_FUSE=0 /
    # BENCH_FUSE_DYN=0/pad recover the other arms for A/B.
    fuse_note = ""
    fuse_kinds = []
    if os.environ.get("BENCH_FUSE", "1") == "1":
        # Fold serial LTI runs (the eq->geq pairs on 9/17 chains)
        # before scheduling; disclosed in the metric string.
        fuse_kinds += ["fir", "iir"]
        fuse_note = ", LTI-fused"
    dyn_mode = os.environ.get("BENCH_FUSE_DYN", "auto")
    if dyn_mode != "0":
        # "1": dynamics family under the full-coverage guard (a no-op
        # on this console — only 6/17 chains have a gate).  "pad":
        # gate-less chains join the composite type with an absent
        # (identity) gate, so ALL noisegate+compressor work runs as ONE
        # Pallas pair walk per direction (r4).
        # "auto": like pad, but lone nodes that can't co-schedule with
        # any genuine pair (the two bus compressors) keep their plain
        # single-recursion walk instead of the costlier pair walk (r5).
        fuse_kinds += ["dynamics"]
        fuse_note += {
            "1": ", dyn-fused", "pad": ", dyn-padded",
            "auto": ", dyn-padded-auto",
        }.get(dyn_mode, ", dyn-padded")
    if fuse_kinds:
        from grafx_tpu.render import fuse_serial_lti

        G, processors = fuse_serial_lti(
            G,
            processors,
            kinds=tuple(fuse_kinds),
            dynamics_pad=(
                "auto" if dyn_mode == "auto" else (dyn_mode == "pad")
            ),
        )

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(processors, plan)

    x = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, NUM_CHAINS, 2, AUDIO_LEN)
    )
    target = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, 1, 2, AUDIO_LEN)
    )

    def train_step_fn(p, x, target):
        def loss_fn(p):
            out, _, _ = render(x, p)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # a real optimizer update: params change every step (also defeats
        # any same-args caching in the runtime)
        p = jax.tree.map(lambda w, g: w - 1e-3 * g, p, grads)
        return loss, p

    # The tunneled runtime's remote_compile request carries the example
    # input buffers under eager jit dispatch; past batch 12 the payload
    # (~285 MB of f32 at batch 16) exceeds the tunnel's request-size cap
    # (HTTP 413).  AOT lowering ships ShapeDtypeStructs instead of
    # arrays (program size is flat: 5.4 MB StableHLO at batch 4..16,
    # benchmarks/batch16_probe.py), so large batches compile fine.
    # Execution is unaffected either way: x/target/params live on device.
    use_aot = os.environ.get("BENCH_AOT", "1" if BATCH > 12 else "0") == "1"
    aot_note = ""
    if use_aot:
        specs = (
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(target.shape, target.dtype),
        )
        compiled = jax.jit(train_step_fn).lower(*specs).compile()
        train_step = lambda p: compiled(p, x, target)  # noqa: E731
        aot_note = ", AOT compile"
    else:
        jitted = jax.jit(train_step_fn)
        train_step = lambda p: jitted(p, x, target)  # noqa: E731

    # compile + warmup
    loss, params = train_step(params)
    jax.block_until_ready(params)

    # Variance-honest timing (VERDICT r3 #3): k measured windows, report
    # the median window as the headline and carry min/max in the JSON so
    # sub-millisecond A/B claims can be checked against the spread.
    windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    window_ms = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            loss, params = train_step(params)
        jax.block_until_ready(params)
        window_ms.append((time.time() - t0) / iters * 1000.0)
    window_ms.sort()
    step_ms = window_ms[len(window_ms) // 2]  # median window
    step_s = step_ms / 1000.0

    # Device time (VERDICT r4 #2): one profiled window per bench run.
    # Wall-clock through the tunnel drifts ~20% day-to-day and folds in
    # a ~2 ms dispatch floor; the summed XLA-op device time survives
    # both, so round-over-round progress is comparable.
    device_ms = None
    if os.environ.get("BENCH_DEVICE_TIME", "1") == "1":
        try:
            from grafx_tpu.profiling import device_time_ms

            prof_steps = 3
            state = {"p": params}

            def _profiled():
                for _ in range(prof_steps):
                    _, state["p"] = train_step(state["p"])
                jax.block_until_ready(state["p"])

            device_ms = device_time_ms(_profiled) / prof_steps
        except Exception:  # noqa: BLE001 — profiling must never kill the bench
            device_ms = None

    audio_sec = BATCH * NUM_CHAINS * AUDIO_LEN / SR
    value = audio_sec / step_s

    print(
        json.dumps(
            {
                "metric": (
                    f"audio-sec/sec/chip, fwd+bwd grad step, {num_nodes}-node"
                    f" mix graph (batch {BATCH} x {NUM_CHAINS} sources x"
                    f" stereo x 2^{AUDIO_LEN.bit_length() - 1} @ 44.1kHz); step time"
                    f" median {step_ms:.1f} ms over {windows}x{iters}-step"
                    f" windows [{window_ms[0]:.1f}, {window_ms[-1]:.1f}]"
                    f" ({step_ms / BATCH:.1f} ms/graph"
                    + (
                        f", device {device_ms:.1f} ms/step"
                        if device_ms is not None
                        else ""
                    )
                    + f"){fuse_note}{aot_note}{precision_note}"
                ),
                "value": round(value, 1),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(value / TORCH_CPU_PROXY_BASELINE, 1),
                "step_ms_median": round(step_ms, 2),
                "step_ms_min": round(window_ms[0], 2),
                "step_ms_max": round(window_ms[-1], 2),
                "device_ms_per_step": (
                    round(device_ms, 2) if device_ms is not None else None
                ),
                "windows": windows,
                "iters_per_window": iters,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # A transient "FAILED_PRECONDITION: TPU backend error" can appear
        # right after another TPU process exits (CLAUDE.md environment
        # notes); the driver runs this unattended, so retry once.
        msg = str(e)
        if "FAILED_PRECONDITION" in msg or "TPU backend" in msg:
            import sys

            print(f"transient TPU error, retrying once: {msg[:200]}",
                  file=sys.stderr)
            time.sleep(10)
            main()
        else:
            raise

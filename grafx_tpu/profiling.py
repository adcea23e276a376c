"""Profiling helpers.

The reference has no tracing/profiling subsystem (SURVEY.md §5 — only
commented ``@profile`` markers); on TPU the native tool is
``jax.profiler``. These helpers wrap it for the render workflow.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/grafx_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    XProf / TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def trace_device_total_ms(log_dir):
    """Sum the XLA-op device time (ms) in the newest trace under
    ``log_dir``.

    Counts only the leaf "XLA Ops" lane: the "XLA Modules" lane carries
    ``device_duration_ps`` too and its totals EQUAL the sum of its ops,
    so a presence-of-``device_duration_ps`` filter double-counts exactly
    2x (measured: /tmp trace dissection, r5).  Sums
    ``args.device_duration_ps`` (true device time) rather than the
    timeline span ``dur``."""
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]

    ops_lanes = device_op_lanes(events)
    total_ps = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_lanes:
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args:
            continue
        name = e.get("name", "")
        if name.startswith("$") or name in ("", "unknown"):
            continue
        total_ps += float(args["device_duration_ps"])
    return total_ps / 1e9


def device_op_lanes(events):
    """Return the set of ``(pid, tid)`` lanes holding leaf XLA ops on a
    device stream.

    Prefers threads literally named "XLA Ops" under a device-looking
    process; falls back to every device-process lane except ones whose
    thread name says Modules/Steps (which aggregate, not add)."""
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        p
        for p, n in pid_names.items()
        if any(k in n.lower() for k in ("tpu", "device", "xla", "axon"))
        and "host" not in n.lower()
    }
    ops = {
        (p, t)
        for (p, t), n in tid_names.items()
        if p in device_pids and n.strip().lower() == "xla ops"
    }
    if ops:
        return ops
    return {
        (p, t)
        for (p, t), n in tid_names.items()
        if p in device_pids
        and not any(k in n.lower() for k in ("module", "step"))
    }


def device_time_ms(run, log_dir=None):
    """Measure pure DEVICE time of ``run()`` (a no-arg callable that
    executes the work and blocks until ready) via a profiler trace.

    Wall-clock through the tunneled runtime carries a ~2 ms per-dispatch
    floor and ~20% day-scale drift (BASELINE.md); summed XLA-op device
    time is the drift-free number for round-over-round comparisons.

    Returns total device-op milliseconds across the traced block."""
    import tempfile

    if log_dir is None:
        log_dir = tempfile.mkdtemp(prefix="grafx_devtime_")
    jax.profiler.start_trace(log_dir)
    try:
        run()
    finally:
        jax.profiler.stop_trace()
    return trace_device_total_ms(log_dir)


def time_fn(fn, *args, iters=10, vary=True, **kwargs):
    """Wall-time a jitted function honestly.

    The tunneled TPU runtime caches repeated identical (executable, args)
    calls, so with ``vary=True`` a per-iteration scale factor is folded
    into the first array argument to force distinct executions.

    Returns:
        Mean seconds per call (after one warmup).
    """
    if vary:
        import jax.numpy as jnp

        base = fn

        def fn_v(s, *a, **k):
            a = (a[0] * s,) + a[1:]
            return base(*a, **k)

        fn_jit = jax.jit(fn_v)
        scales = [jnp.float32(1.0 + i * 1e-6) for i in range(iters + 1)]
        out = fn_jit(scales[0], *args, **kwargs)
        jax.block_until_ready(out)
        t0 = time.time()
        for s in scales[1:]:
            out = fn_jit(s, *args, **kwargs)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

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

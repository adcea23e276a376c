"""The render executor: run a static render plan as one XLA program.

Behavioral parity with the reference ``render_grafx``
(reference: src/grafx/render/graph.py:16-177), re-designed for TPU:

* The plan (:class:`RenderData`) is static — the Python loop over stages
  unrolls at trace time into a single XLA graph, so the per-stage host
  dispatch of the reference disappears entirely under ``jax.jit``.
* The signal buffer is functional; static-index updates lower to in-place
  dynamic-update-slices.
* ``parameters_grad`` / ``input_signal_grad`` flags are unnecessary: JAX
  differentiates whatever you ask it to (``jax.grad`` w.r.t. parameters
  and/or signals); they are accepted and ignored for API familiarity.

Use :func:`make_render_fn` for a cached, jitted closure over (processors,
plan) — the recommended hot-loop entry point.
"""

import functools

import jax
import jax.numpy as jnp

from grafx_tpu.data.configs import UTILITY_TYPES
from grafx_tpu.processors.core.utils import accepts_noise_key
from grafx_tpu.render.core import (
    aggregate_tensor,
    create_signal_buffer,
    expand_tensor_or_tensor_dict,
    flatten_batch_and_node,
    read_tensor_or_tensor_dict,
    write_tensor,
)


def _row_sources(render_data):
    """Static map buffer_row -> (stage index, row within that stage's
    output).  Every buffer row is written exactly once by a known stage,
    so reads can resolve directly into per-stage outputs ("stages"
    buffer mode) instead of going through one threaded buffer array."""
    row_src = {}
    for j, stage in enumerate(render_data.iter_list):
        dw = stage.dest_write
        if dw.method == "none":
            continue
        rows = range(dw.idx[0], dw.idx[1]) if dw.method == "slice" else dw.idx
        for p, r in enumerate(rows):
            if r in row_src:
                raise ValueError(
                    f"Render plan writes buffer row {r} twice (stages"
                    f" {row_src[r][0]} and {j}); 'stages' buffer mode"
                    " requires single-assignment rows — use"
                    " buffer_mode='array' for plans that reuse rows."
                )
            row_src[r] = (j, p)
    return row_src


def _read_rows_from_stages(stage_outputs, rows, row_src, dim,
                           channel_broadcast=False):
    """Gather buffer rows as slices of per-stage outputs.

    Consecutive rows from the same stage coalesce into one static slice
    (after ``reorder_for_fast_render`` most reads are exactly one slice,
    which XLA folds into the consumer — zero data movement).

    ``channel_broadcast`` broadcasts each part's channel dim to the
    common maximum before concatenating — used only for the API-parity
    signal-buffer assembly, where MIMO graphs mix single-channel rows
    (e.g. mid/side outlets) with stereo rows."""
    runs = []  # (stage, lo, hi)
    for r in rows:
        try:
            j, p = row_src[r]
        except KeyError:
            raise ValueError(
                f"Render plan reads buffer row {r} which no stage writes"
                " (malformed plan: an edge references a node output that"
                " is never produced)."
            ) from None
        if runs and runs[-1][0] == j and runs[-1][2] == p:
            runs[-1][2] = p + 1
        else:
            runs.append([j, p, p + 1])
    parts = []
    for j, lo, hi in runs:
        index = (slice(None),) * dim + (slice(lo, hi),)
        parts.append(stage_outputs[j][index])
    if len(parts) == 1:
        return parts[0]
    if channel_broadcast:
        c_max = max(p.shape[-2] for p in parts)
        parts = [
            jnp.broadcast_to(p, p.shape[:-2] + (c_max, p.shape[-1]))
            for p in parts
        ]
    return jnp.concatenate(parts, axis=dim)


def _access_rows(access):
    if access.method == "slice":
        return list(range(access.idx[0], access.idx[1]))
    return list(access.idx)


def render_grafx(
    processors,
    input_signals,
    per_type_parameters,
    render_data,
    common_parameters=None,
    parameters_grad=True,  # accepted for API parity; unused in JAX
    input_signal_grad=False,  # accepted for API parity; unused in JAX
    buffer_mode="auto",
    rng=None,
):
    """Render an audio graph.

    Args:
        processors: dict mapping node-type name to a processor callable
            ``f(*signals, **params) -> signals [, intermediates]``.
        input_signals: ``(|V_0|, C, L)`` or ``(B, |V_0|, C, L)`` array.
        per_type_parameters: nested dict pytree, type -> name -> array
            whose dim 0 is the node batch.
        render_data: the static :class:`RenderData` plan.
        common_parameters: optional tensor/dict with dim-0 size ``|V|``
            shared across all node types.
        rng: optional ``jax.random`` key.  Each stage whose processor
            declares a ``noise_key`` parameter receives a distinct key
            derived by ``fold_in(rng, stage)``, restoring the
            reference's per-call noise resampling (reference:
            reverb.py:101-114, :410-418 — free in eager torch, but
            under ``jit`` noise must be threaded explicitly).  With
            ``rng=None`` such processors fall back to their fixed
            trace-time noise.
        buffer_mode: ``"stages"`` keeps every stage's output as its own
            array and resolves reads as static slices into them (no
            threaded buffer array, no update-slice traffic);
            ``"array"`` threads one functional ``(.., num_buffers, C,
            L)`` buffer like the reference.  ``"auto"`` picks
            ``"stages"`` for scheduled plans, ``"array"`` for
            one-by-one.  Outputs are identical; the returned
            ``signal_buffer`` in stages mode is assembled on demand
            (XLA removes it when unused).

    Returns:
        ``(output_signals, intermediates_list, signal_buffer)``.
    """
    method = render_data.method
    ndim = input_signals.ndim
    if buffer_mode == "auto":
        buffer_mode = "array" if method == "one-by-one" else "stages"
    use_stages = buffer_mode == "stages" and method != "one-by-one"

    # Per-type precompute (processor-contract extension, see
    # docs/processors.md): a processor exposing ``precompute(**params)``
    # builds its parameter-dependent kernels ONCE for all nodes of the
    # type; each stage slices the cached arrays exactly like parameter
    # rows and receives the slice via ``_cache=``.  Types appearing in
    # several stages (console chains + buses + master) would otherwise
    # re-emit the whole kernel-build op stream per stage.
    rng_types = (
        {t for t, p in processors.items() if accepts_noise_key(p)}
        if rng is not None
        else set()
    )

    precomputed = {}
    for _type, _proc in processors.items():
        if hasattr(_proc, "precompute") and _type in per_type_parameters:
            cache = _proc.precompute(**per_type_parameters[_type])
            if cache is not None:
                precomputed[_type] = cache

    if ndim == 3:
        node_dim = 0
        postprocess = None
    elif ndim == 4:
        batch_size, _, channels, audio_len = input_signals.shape
        node_dim = 1
        postprocess = flatten_batch_and_node
        per_type_parameters = expand_tensor_or_tensor_dict(
            per_type_parameters, expand=batch_size, dim=0
        )
        precomputed = {
            k: expand_tensor_or_tensor_dict(v, expand=batch_size, dim=0)
            for k, v in precomputed.items()
        }
        if common_parameters is not None:
            common_parameters = expand_tensor_or_tensor_dict(
                common_parameters, expand=batch_size, dim=0
            )
    else:
        raise ValueError(
            f"input_signals has {ndim} dims; expected 3 or 4."
        )

    num_sources = render_data.iter_list[0].dest_write.num_rows
    if input_signals.shape[node_dim] != num_sources:
        raise ValueError(
            f"Expected {num_sources} input signals (the graph's 'in' nodes),"
            f" got {input_signals.shape[node_dim]}."
        )

    if use_stages:
        row_src = _row_sources(render_data)
        stage_outputs = [input_signals]
        signal_buffer = None
    else:
        signal_buffer = create_signal_buffer(
            method, render_data.num_buffers, input_signals
        )

    intermediates_list = []
    output_signals = None

    for i in range(1, render_data.max_order + 1):
        stage = render_data.iter_list[i]

        stage_inputs = []
        for read, aggregate in zip(stage.source_reads, stage.aggregations):
            if use_stages:
                sig = _read_rows_from_stages(
                    stage_outputs, _access_rows(read), row_src, node_dim
                )
            else:
                sig = read_tensor_or_tensor_dict(
                    signal_buffer, read, dim=node_dim
                )
            sig = aggregate_tensor(sig, aggregate, dim=node_dim)
            if ndim == 4 and not isinstance(signal_buffer, list):
                sig = flatten_batch_and_node(sig)
            stage_inputs.append(sig)

        node_type = stage.node_type
        if node_type in processors:
            parameters = read_tensor_or_tensor_dict(
                per_type_parameters.get(node_type, {}),
                stage.parameter_read,
                dim=node_dim,
                postprocess=postprocess,
            )
            if common_parameters is not None:
                common_i = read_tensor_or_tensor_dict(
                    common_parameters,
                    stage.dest_write,
                    dim=node_dim,
                    postprocess=postprocess,
                )
            else:
                common_i = {}
            if node_type in rng_types:
                common_i = dict(common_i)
                common_i["noise_key"] = jax.random.fold_in(rng, i)
            if node_type in precomputed:
                cache_i = read_tensor_or_tensor_dict(
                    precomputed[node_type],
                    stage.parameter_read,
                    dim=node_dim,
                    postprocess=postprocess,
                )
                output = processors[node_type](
                    *stage_inputs, **parameters, **common_i, _cache=cache_i
                )
            else:
                output = processors[node_type](*stage_inputs, **parameters, **common_i)
            if isinstance(output, tuple):
                output_signals, intermediates = output
                intermediates_list.append(intermediates)
            else:
                output_signals = output
        elif node_type in UTILITY_TYPES:
            output_signals = stage_inputs
        else:
            raise ValueError(f"Wrong node type given: {node_type}")

        if isinstance(output_signals, list):
            if len(output_signals) == 1:
                output_signals = output_signals[0]
            else:
                # per-node outlets become contiguous buffer rows
                stacked = jnp.stack(output_signals, axis=-3)
                output_signals = stacked.reshape(
                    (-1,) + stacked.shape[-2:]
                )

        if ndim == 4 and not isinstance(signal_buffer, list):
            output_signals = output_signals.reshape(
                (batch_size, -1, channels, audio_len)
            )

        if use_stages:
            stage_outputs.append(output_signals)
        else:
            signal_buffer = write_tensor(
                method, signal_buffer, output_signals, stage.dest_write,
                dim=node_dim,
            )

    if use_stages:
        # Assemble the API-parity signal buffer from the stage outputs
        # (a single concat in buffer-row order; XLA dead-code-eliminates
        # it when the caller ignores the third return value).
        all_rows = list(range(render_data.num_buffers))
        written = [r for r in all_rows if r in row_src]
        signal_buffer = _read_rows_from_stages(
            stage_outputs, written, row_src, node_dim, channel_broadcast=True
        )

    return output_signals, intermediates_list, signal_buffer


_RENDER_FN_CACHE = {}


def _processor_static_key(proc):
    """A hashable key describing a processor's static configuration.

    Library processors (anything exposing ``parameter_size``) are keyed
    by class + a recursive walk of their constructor-derived attributes,
    so two instances with identical config share one cached (and hence
    one compiled) render closure.  Arbitrary callables fall back to the
    object itself — hashable by identity, and because the cache key
    holds a strong reference the id stays valid for the life of the
    entry (no stale hits after garbage collection).
    """
    import hashlib

    import numpy as np

    def walk(obj):
        if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
            return obj
        if isinstance(obj, (np.ndarray, jax.Array)):
            arr = np.asarray(obj)
            digest = hashlib.sha1(arr.tobytes()).hexdigest()
            return ("__array__", arr.shape, str(arr.dtype), digest)
        if isinstance(obj, (list, tuple)):
            return (type(obj).__name__,) + tuple(walk(x) for x in obj)
        if isinstance(obj, dict):
            return tuple(sorted((k, walk(v)) for k, v in obj.items()))
        is_library_obj = type(obj).__module__.startswith("grafx_tpu") or (
            hasattr(obj, "parameter_size") and hasattr(obj, "__dict__")
        )
        if is_library_obj and hasattr(obj, "__dict__"):
            return (
                type(obj).__module__,
                type(obj).__qualname__,
                tuple(sorted((k, walk(v)) for k, v in vars(obj).items())),
            )
        return obj  # identity key; strong ref held by the cache key

    return walk(proc)


def make_render_fn(
    processors, render_data, jit=True, donate_buffer=False, buffer_mode="auto"
):
    """Build a render closure over static (processors, plan).

    The returned function has signature
    ``f(input_signals, per_type_parameters, common_parameters=None,
    rng=None)`` and is jit-compiled once per (plan, shapes) pair.  Closures are cached by
    (plan, processor static configs): two graphs with identical schedules
    and identically-configured processors share one compiled program
    (SURVEY.md §7 hard part 3 — every distinct plan is otherwise a
    recompile).
    """
    cache_key = (
        render_data,
        tuple(sorted((k, _processor_static_key(v)) for k, v in processors.items())),
        jit,
        buffer_mode,
    )
    cached = _RENDER_FN_CACHE.get(cache_key)
    if cached is not None:
        return cached

    def render_fn(
        input_signals, per_type_parameters, common_parameters=None, rng=None
    ):
        return render_grafx(
            processors,
            input_signals,
            per_type_parameters,
            render_data,
            common_parameters=common_parameters,
            buffer_mode=buffer_mode,
            rng=rng,
        )

    if jit and render_data.method != "one-by-one":
        render_fn = jax.jit(render_fn)
    _RENDER_FN_CACHE[cache_key] = render_fn
    return render_fn

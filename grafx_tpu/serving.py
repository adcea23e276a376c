"""Ahead-of-time export of compiled graph renders for serving.

The reference has no serving story (SURVEY.md §1: no CLI, no serving
layer); production deployment of an audio-processing graph on TPU wants
the opposite of a Python training loop: compile ONCE, ship the
StableHLO artifact, and replay it from any process (including non-JAX
runtimes via the XLA PJRT C API) without graph construction, scheduling,
or tracing at load time.

``export_render`` captures a scheduled render (or any jittable function
of ``(input_signals, params)``) as a serialized `jax.export` artifact;
``load_render`` restores a callable.  Verified on the real chip: an
exported render containing the fused Pallas compressor kernels
round-trips with 0 output difference (the Mosaic custom calls serialize
inside the StableHLO).  The artifact embeds the full
render plan — schedule, slices, kernels, Pallas custom calls — so the
serving side needs only the parameter pytree and audio buffers.

Typical flow::

    render = make_render_fn(processors, plan)
    blob = export_render(render, example_signals, example_params)
    Path("console.grafx").write_bytes(blob)
    # ... serving process ...
    render = load_render(Path("console.grafx").read_bytes())
    out = render(signals, params)
"""

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _only_output(result):
    # render_grafx returns (out, intermediates, buffer); exporting just
    # the master output keeps the artifact's output signature stable
    if isinstance(result, tuple) and len(result) == 3:
        return result[0]
    return result


def export_render(render_fn, example_signals, example_params,
                  platforms=None):
    """Serialize a compiled render as a portable StableHLO artifact.

    Args:
        render_fn: ``f(input_signals, params)`` — e.g. the closure from
            :func:`grafx_tpu.render.make_render_fn` (its
            ``(out, intermediates, buffer)`` return is narrowed to the
            master output for a stable serving signature).
        example_signals, example_params: arrays/pytrees fixing shapes
            and dtypes (values are ignored).
        platforms: optional lowering-platform list (e.g.
            ``["tpu", "cpu"]``); defaults to the current backend.

    Returns:
        ``bytes`` — the serialized artifact (StableHLO + calling
        convention), loadable with :func:`load_render` or any
        `jax.export`-compatible runtime.
    """

    def serve(signals, params):
        return _only_output(render_fn(signals, params))

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jax_export.export(jax.jit(serve), **kwargs)(
        jax.ShapeDtypeStruct(
            jnp.shape(example_signals), jnp.asarray(example_signals).dtype
        ),
        jax.tree.map(
            lambda v: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype),
            example_params,
        ),
    )
    return bytes(exp.serialize())


def export_stream_step(renderer, example_block, platforms=None,
                       blocks_per_step=1):
    """Serialize a :class:`~grafx_tpu.render.streaming.StreamRenderer`'s
    block step as a portable artifact for real-time serving.

    The exported function is ``step(x_block, state) -> (y_block,
    new_state)`` with the renderer's parameter-dependent kernel caches
    baked in as constants (the serving scenario: parameters are frozen
    at export).  The initial stream state ships inside the artifact, so
    the serving process needs nothing but audio blocks::

        step, state = load_stream_step(blob)
        while streaming:
            y, state = step(x, state)

    Args:
        renderer: a built ``StreamRenderer``.
        example_block: ``(C, block_len)`` (or batched) array fixing the
            block shape/dtype.
        platforms: optional lowering-platform list.
        blocks_per_step: serve this many consecutive blocks per call
            (``StreamRenderer.step_many``): the exported step takes
            ``(blocks_per_step, *block_shape)`` and returns outputs
            stacked the same way, amortizing per-dispatch overhead at
            the cost of ``blocks_per_step`` blocks of latency.

    Returns:
        ``bytes`` (pickle of the serialized `jax.export` function plus
        the initial-state pytree as numpy arrays).
    """
    import pickle

    import numpy as np

    # jax.export serialization requires string dict keys; the stream
    # state's top level is keyed by integer stage index — stringify at
    # the artifact boundary (the loaded step keeps string keys).
    state0 = {str(k): v for k, v in renderer.init_state().items()}

    impl = (
        renderer._step_impl
        if blocks_per_step == 1
        else renderer._step_many_impl
    )

    def step(x_block, state):
        y, new_state = impl(
            x_block,
            {int(k): v for k, v in state.items()},
            renderer._cache_arrays,
        )
        return y, {str(k): v for k, v in new_state.items()}

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    example_in = example_block
    if blocks_per_step != 1:
        example_in = jnp.broadcast_to(
            jnp.asarray(example_block)[None],
            (blocks_per_step,) + jnp.shape(example_block),
        )
    shapes = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype),
        (example_in, state0),
    )
    exp = jax_export.export(jax.jit(step), **kwargs)(*shapes)
    payload = {
        "fn": bytes(exp.serialize()),
        "state": jax.tree.map(lambda v: np.asarray(v), state0),
    }
    return pickle.dumps(payload)


def load_stream_step(blob):
    """Restore an exported streaming step; returns ``(step, state0)``
    with ``step(x_block, state) -> (y_block, new_state)``."""
    import pickle

    payload = pickle.loads(blob)
    exp = jax_export.deserialize(payload["fn"])

    def step(x_block, state):
        return exp.call(x_block, state)

    return step, payload["state"]


def load_render(blob):
    """Restore an exported render; returns ``f(signals, params) -> out``.

    The call re-traces nothing: the embedded StableHLO is compiled
    directly for the local backend (jit-cached after the first call).
    """
    exp = jax_export.deserialize(blob)

    def serve(signals, params):
        return exp.call(signals, params)

    return serve


__all__ = [
    "export_render",
    "load_render",
    "export_stream_step",
    "load_stream_step",
]

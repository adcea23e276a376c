"""Block-wise streaming renderer: low-latency graph processing with
carried per-node state.

A genuinely new capability over the reference (which renders full-length
signals only; see SURVEY.md §5 long-sequence mapping): the same static
render plan (:class:`~grafx_tpu.render.prepare.RenderData`) is executed
one audio block at a time, with every stateful processor carrying its
state across blocks —

* exact-IIR filters carry the blocked cascade's eigenbasis state
  (``ops/iir.py`` ``state_in``/``return_state``),
* ballistics / one-pole smoothers carry the last envelope sample,
* FIR convolutions (reverbs, delays) carry an overlap-add tail —

so the streamed output equals the one-shot :func:`render_grafx` output
to float round-off (gated by tests/graph/test_render_streaming.py).

Processor contract (in addition to the stateless ``__call__``):

* ``stream_init(num_channels, block_len, **params) -> (state, cache)``
  builds the per-stream carried state and a static cache (IRs, filter
  kernels) from that stage's parameter rows, once;
* ``stream_step(x_block, state, cache) -> (y_block, new_state)``.

Processors without these methods are assumed memoryless (gains, stereo
tools, distortions without DC removal) and are called through
``__call__`` on each block.  Aux losses (``intermediates``) are a
training-time concept and are not collected while streaming.

Typical use::

    streamer = StreamRenderer(processors, render_data, params, block_len=4096)
    state = streamer.init_state()
    for block in blocks:                      # (num_sources, C, block_len)
        y, state = streamer(block, state)     # jitted, one XLA program
"""

import inspect

import jax
import jax.numpy as jnp

from grafx_tpu.data.configs import UTILITY_TYPES
from grafx_tpu.render.core import aggregate_tensor, read_tensor_or_tensor_dict
from grafx_tpu.render.graph import (
    _access_rows,
    _read_rows_from_stages,
    _row_sources,
)


def _jit_stream_init(proc, num_channels, block_len, kwargs):
    """Run ``proc.stream_init`` under jit, routing non-array (static)
    pytree leaves around the jit boundary."""
    aux = {}

    def init_fn(kw):
        out = proc.stream_init(num_channels, block_len, **kw)
        arrays, aux["split"] = _partition_static(out)
        return arrays

    array_leaves = jax.jit(init_fn)(kwargs)
    return _combine_static(array_leaves, aux["split"])


def _is_static_leaf(l):
    import jax

    return not isinstance(l, (jax.Array, jnp.ndarray)) and not hasattr(
        l, "shape"
    )


def _partition_static(tree):
    """Split a pytree into (array_leaves, aux) where aux carries the
    treedef plus the non-array (static) leaves — strings, ints, bools —
    so the array part can cross a jit boundary."""
    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(tree)
    mask = [_is_static_leaf(l) for l in leaves]
    statics = [l if m else None for l, m in zip(leaves, mask)]
    arrays = [l for l, m in zip(leaves, mask) if not m]
    return arrays, (treedef, statics, mask)


def _combine_static(arrays, aux):
    import jax.tree_util as jtu

    treedef, statics, mask = aux
    it = iter(arrays)
    leaves = [s if m else next(it) for s, m in zip(statics, mask)]
    return jtu.tree_unflatten(treedef, leaves)


class StreamRenderer:
    """Stream a prepared render plan block by block.

    Args:
        processors: dict of node-type -> processor (same as
            :func:`render_grafx`).
        render_data: the static plan from :func:`prepare_render`.
        parameters: per-type parameter pytree (dim 0 = node batch).
            Parameters are frozen for the life of the stream (the
            serving scenario); rebuild the renderer to change them.
        block_len: audio samples per streaming block.  Must be a
            multiple of every exact-IIR backend's ``exact_block_size``
            (checked at build time).
        num_channels: audio channels (2 for stereo graphs).
        rng: optional key for stochastic processors (resampled-noise
            reverbs); their noise is drawn once at stream init.
        common_parameters: optional ``common_parameters`` pytree
            (e.g. external dry/wet weights), frozen like ``parameters``.
    """

    def __init__(
        self,
        processors,
        render_data,
        parameters,
        block_len=4096,
        num_channels=2,
        rng=None,
        common_parameters=None,
    ):
        if render_data.method == "one-by-one":
            raise ValueError(
                "streaming requires a scheduled plan (beam/greedy/fixed)."
            )
        self.processors = processors
        self.render_data = render_data
        self.block_len = block_len
        self.num_channels = num_channels
        self._row_src = _row_sources(render_data)

        # Build per-stage states and caches once, host-side.
        self._caches = {}
        self._init_states = {}
        for i in range(1, render_data.max_order + 1):
            stage = render_data.iter_list[i]
            node_type = stage.node_type
            if node_type not in processors:
                continue
            proc = processors[node_type]
            if getattr(proc, "remove_dc", False):
                raise ValueError(
                    f"processor {node_type!r} uses remove_dc=True (a"
                    " full-signal mean); streamed blocks would differ"
                    " from the one-shot render."
                )
            params_i = read_tensor_or_tensor_dict(
                parameters.get(node_type, {}), stage.parameter_read, dim=0
            )
            if common_parameters is not None:
                common_i = read_tensor_or_tensor_dict(
                    common_parameters, stage.dest_write, dim=0
                )
                if isinstance(common_i, dict):
                    params_i = {**params_i, **common_i}
                else:
                    params_i = {**params_i, "drywet_weight": common_i}
            if hasattr(proc, "stream_init"):
                if len(stage.source_reads) > 1:
                    # Multi-inlet stateful stages stream when the
                    # processor's stream_step accepts one positional
                    # signal per inlet (plus state and cache) — the
                    # step below already passes *stage_inputs.  Note a
                    # fan-IN (many edges into one inlet) aggregates
                    # before the processor and needs nothing special;
                    # this is for genuinely MIMO nodes (sidechains,
                    # crossovers).
                    n_pos = sum(
                        p.kind
                        in (
                            inspect.Parameter.POSITIONAL_ONLY,
                            inspect.Parameter.POSITIONAL_OR_KEYWORD,
                        )
                        for p in inspect.signature(
                            proc.stream_step
                        ).parameters.values()
                    )
                    if n_pos != len(stage.source_reads) + 2:
                        raise NotImplementedError(
                            f"stage {i} ({node_type!r}) has"
                            f" {len(stage.source_reads)} inlets but its"
                            f" stream_step takes {n_pos} positional args;"
                            " a multi-inlet stateful processor must"
                            " accept (sig_1, ..., sig_k, state, cache)."
                        )
                kwargs = dict(params_i)
                if rng is not None and "noise_key" in inspect.signature(
                    proc.stream_init
                ).parameters:
                    kwargs["noise_key"] = jax.random.fold_in(rng, i)
                # run the init computation under jit: eager complex ops
                # (e.g. the STFT-reverb IR build) are unimplemented on
                # the tunneled TPU backend, and jit also fuses the whole
                # kernel/IR build into one program.  Static leaves of
                # the returned pytrees (container dispatch tags, channel
                # flags) are split out around the jit boundary.
                state, cache = _jit_stream_init(
                    proc, num_channels, block_len, kwargs
                )
                self._init_states[i] = state
                self._caches[i] = ("stream", cache)
            else:
                # memoryless: call __call__ per block with the params
                self._caches[i] = ("call", params_i)

        # Caches enter the jitted step as ARGUMENTS, not closure
        # constants: constants must be materialized host-side when the
        # program is staged, and complex device->host transfers (the
        # partitioned-conv spectra) are unimplemented on the tunneled
        # TPU backend.  Static leaves (dispatch tags, partition sizes)
        # are split out and re-merged inside the trace.
        self._cache_arrays = {}
        self._cache_aux = {}
        for i, (kind, cache) in self._caches.items():
            arrays, aux = _partition_static(cache)
            self._cache_arrays[i] = arrays
            self._cache_aux[i] = (kind, aux)
        self._step = jax.jit(self._step_impl)
        self._step_many = jax.jit(self._step_many_impl)

    def init_state(self):
        """Fresh carried state for a new stream."""
        return dict(self._init_states)

    def _step_impl(self, x_block, stream_state, cache_arrays):
        rd = self.render_data
        stage_outputs = [x_block]
        new_state = {}
        output = None
        for i in range(1, rd.max_order + 1):
            stage = rd.iter_list[i]
            stage_inputs = []
            for read, aggregate in zip(stage.source_reads, stage.aggregations):
                sig = _read_rows_from_stages(
                    stage_outputs, _access_rows(read), self._row_src, 0
                )
                stage_inputs.append(aggregate_tensor(sig, aggregate, dim=0))

            node_type = stage.node_type
            if node_type in self.processors:
                kind, aux = self._cache_aux[i]
                cache = _combine_static(cache_arrays[i], aux)
                if kind == "stream":
                    output, s = self.processors[node_type].stream_step(
                        *stage_inputs, stream_state[i], cache
                    )
                    new_state[i] = s
                else:
                    output = self.processors[node_type](*stage_inputs, **cache)
                    if isinstance(output, tuple):  # drop aux while streaming
                        output = output[0]
            elif node_type in UTILITY_TYPES:
                output = stage_inputs
            else:
                raise ValueError(f"Wrong node type given: {node_type}")

            if isinstance(output, list):
                if len(output) == 1:
                    output = output[0]
                else:
                    stacked = jnp.stack(output, axis=-3)
                    output = stacked.reshape((-1,) + stacked.shape[-2:])
            stage_outputs.append(output)
        return output, new_state

    def _step_many_impl(self, x_blocks, stream_state, cache_arrays):
        def body(state, x):
            y, s = self._step_impl(x, state, cache_arrays)
            return s, y

        final_state, ys = jax.lax.scan(body, stream_state, x_blocks)
        return ys, final_state

    def __call__(self, x_block, stream_state):
        """Process one block ``(num_sources, C, block_len)``; returns
        ``(y_block, new_stream_state)``."""
        if x_block.shape[-1] != self.block_len:
            raise ValueError(
                f"block length {x_block.shape[-1]} != configured"
                f" {self.block_len}"
            )
        return self._step(x_block, stream_state, self._cache_arrays)

    def step_many(self, x_blocks, stream_state):
        """Process ``k`` consecutive blocks in ONE dispatch.

        ``x_blocks`` is ``(k, num_sources, C, block_len)`` — the single
        block step scanned over the leading axis inside one jitted
        program (``lax.scan``), so the per-dispatch host/tunnel overhead
        (~2 ms on the tunneled TPU, the dominant per-block cost at
        block_len 4096) is paid once per k blocks instead of per block.
        Latency trades accordingly: output arrives k blocks at a time.

        Returns ``(y_blocks, new_stream_state)`` with ``y_blocks``
        stacked on the leading axis.  Identical math to k calls of
        :meth:`__call__` (the scan body IS the single-block step).
        """
        if x_blocks.ndim < 2 or x_blocks.shape[-1] != self.block_len:
            raise ValueError(
                f"x_blocks must be (k, ..., {self.block_len}); got"
                f" {x_blocks.shape}"
            )
        return self._step_many(x_blocks, stream_state, self._cache_arrays)

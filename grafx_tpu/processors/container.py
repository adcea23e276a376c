"""Processor containers: dry/wet mixing, serial chains, parallel mixes,
and gain-staging regularization.

Behavioral parity with the reference
(reference: src/grafx/processors/container.py:10-299).  Aux losses travel
as the second element of a returned tuple (the render executor's
``intermediates`` side channel).
"""

import math

import jax
import jax.numpy as jnp

from grafx_tpu.processors.core.utils import accepts_noise_key, rms_difference


def _split_output(out):
    if isinstance(out, tuple):
        return out
    return out, None


def _maybe_key(processor, noise_key, i=0):
    """kwargs to forward a render-executor RNG key to a wrapped
    processor: containers declare ``noise_key`` themselves and split it
    per inner processor, so stochastic processors (e.g. resampled-noise
    reverbs) keep per-call noise inside any container nesting."""
    if noise_key is None or not accepts_noise_key(processor):
        return {}
    return {"noise_key": jax.random.fold_in(noise_key, i)}


def _inner_stream_init(processor, num_channels, block_len, params, noise_key, i):
    """Streaming-contract dispatch for a wrapped processor: stateful
    inners get ``stream_init``; memoryless inners are marked to be
    called through ``__call__`` per block (render/streaming.py)."""
    if hasattr(processor, "stream_init"):
        kwargs = dict(params)
        kwargs.update(_maybe_key(processor, noise_key, i))
        state, cache = processor.stream_init(num_channels, block_len, **kwargs)
        return state, ("stream", cache)
    return None, ("call", dict(params))


def _inner_stream_step(processor, x, state, tagged_cache):
    kind, cache = tagged_cache
    if kind == "stream":
        return processor.stream_step(x, state, cache)
    out, _ = _split_output(processor(x, **cache))
    return out, state


class DryWet:
    """Mix the wrapped processor's wet output with the dry input via a
    sigmoid weight (reference: container.py:10-82).

    Args:
        processor: any SISO processor.
        external_param: if ``True``, the dry/wet weight is expected via
            ``common_parameters`` and not added to ``parameter_size``.
    """

    def __init__(self, processor, external_param=True):
        self.processor = processor
        self.external_param = external_param

    def __call__(
        self, input_signals, drywet_weight, noise_key=None, **processor_kwargs
    ):
        out, intermediates = _split_output(
            self.processor(
                input_signals,
                **processor_kwargs,
                **_maybe_key(self.processor, noise_key),
            )
        )
        w = jax.nn.sigmoid(drywet_weight).reshape(-1, 1, 1)
        mixed = w * out + (1.0 - w) * input_signals
        if intermediates is not None:
            return mixed, intermediates
        return mixed

    def stream_init(
        self, num_channels, block_len, drywet_weight=None, noise_key=None,
        **processor_kwargs,
    ):
        state, cache = _inner_stream_init(
            self.processor, num_channels, block_len, processor_kwargs,
            noise_key, 0,
        )
        return state, {"inner": cache, "w": drywet_weight}

    def stream_step(self, x, state, cache):
        out, state = _inner_stream_step(self.processor, x, state, cache["inner"])
        w = jax.nn.sigmoid(cache["w"]).reshape(-1, 1, 1)
        return w * out + (1.0 - w) * x, state

    def parameter_size(self):
        size = dict(self.processor.parameter_size())
        if not self.external_param:
            size["drywet_weight"] = (1,)
        return size

    # -- LTI-chain fusion capability (render/fuse.py) -------------------

    @property
    def lti_kind(self):
        """A dry/wet mix of an FIR-LTI processor is FIR-LTI:
        ``h = w h_wet + (1-w) d_shift``.  Requires the weight in the
        node's own parameters (``external_param=False``) — with an
        external weight the fused composite could not route it to the
        member.  The IIR family has no parallel-sum form (a dry path
        beside a cascade is not a cascade)."""
        from grafx_tpu.processors.core.utils import lti_kind_of

        if self.external_param:
            return None
        return "fir" if lti_kind_of(self.processor) == "fir" else None

    def fir_kernel(self, drywet_weight, noise_key=None, **processor_kwargs):
        kw = dict(processor_kwargs)
        if noise_key is not None and accepts_noise_key(
            self.processor.fir_kernel
        ):
            kw["noise_key"] = noise_key
        h_wet, shift, aux = self.processor.fir_kernel(**kw)
        w = jax.nn.sigmoid(drywet_weight).reshape(-1, 1, 1)
        h = w * h_wet
        h = h.at[..., shift].add((1.0 - w[..., 0]) * jnp.ones_like(h[..., 0]))
        return h, shift, aux


class SerialChain:
    """Apply processors in order, nesting their parameters by name
    (reference: container.py:85-148)."""

    def __init__(self, processors):
        self.processors = dict(processors)

    def __call__(self, input_signals, noise_key=None, **processors_kwargs):
        out = input_signals
        intermediates = {}
        for i, (k, processor) in enumerate(self.processors.items()):
            result = processor(
                out,
                **processors_kwargs[k],
                **_maybe_key(processor, noise_key, i),
            )
            out, inter = _split_output(result)
            if inter is not None:
                intermediates[k] = inter
        return out, intermediates

    def stream_init(self, num_channels, block_len, noise_key=None, **kwargs):
        states, caches = {}, {}
        for i, (k, processor) in enumerate(self.processors.items()):
            states[k], caches[k] = _inner_stream_init(
                processor, num_channels, block_len, kwargs[k], noise_key, i
            )
        return states, caches

    def stream_step(self, x, state, cache):
        out = x
        new_state = {}
        for k, processor in self.processors.items():
            out, new_state[k] = _inner_stream_step(
                processor, out, state[k], cache[k]
            )
        return out, new_state

    def parameter_size(self):
        return {k: v.parameter_size() for k, v in self.processors.items()}

    # -- LTI-chain fusion capabilities (render/fuse.py) -----------------

    @property
    def lti_kind(self):
        """A serial chain whose members all share one LTI fusion family
        is itself a member of that family (IRs convolve / cascades
        concatenate); mixed or non-LTI members make it opaque."""
        from grafx_tpu.processors.core.utils import lti_kind_of

        kinds = {lti_kind_of(p) for p in self.processors.values()}
        if len(kinds) == 1:
            k = kinds.pop()
            if k in ("fir", "iir"):
                return k
        return None

    def fir_kernel(self, noise_key=None, **processors_kwargs):
        from grafx_tpu.render.fuse import compose_fir_kernels

        return compose_fir_kernels(
            list(self.processors.items()), processors_kwargs, noise_key
        )

    def biquad_kernel(self, **processors_kwargs):
        from grafx_tpu.render.fuse import compose_biquad_kernels

        return compose_biquad_kernels(
            list(self.processors.items()), processors_kwargs
        )


class ParallelMix:
    """Weighted sum of parallel processor outputs — DARTS-style processor
    selection (reference: container.py:151-222).

    Args:
        processors: name -> processor dict.
        activation: ``"softmax"`` (weights sum to 1) or ``"softplus"``
            (non-negative, ~1/K at zero).
    """

    def __init__(self, processors, activation="softmax"):
        self.processors = dict(processors)
        if activation not in ("softmax", "softplus"):
            raise ValueError(f"Unsupported activation: {activation}")
        self.activation = activation
        self.mult = 1.0 / (math.log(2) * len(self.processors))

    def __call__(
        self, input_signals, parallel_weights, noise_key=None, **processors_kwargs
    ):
        if self.activation == "softmax":
            weights = jax.nn.softmax(parallel_weights, axis=-1)
        else:
            weights = jax.nn.softplus(parallel_weights) * self.mult

        outputs = []
        intermediates = {}
        for i, (k, processor) in enumerate(self.processors.items()):
            out, inter = _split_output(
                processor(
                    input_signals,
                    **processors_kwargs[k],
                    **_maybe_key(processor, noise_key, i),
                )
            )
            if inter is not None:
                intermediates[k] = inter
            outputs.append(out * weights[..., i, None, None])
        return sum(outputs), intermediates

    def stream_init(
        self, num_channels, block_len, parallel_weights=None, noise_key=None,
        **kwargs,
    ):
        states, caches = {}, {}
        for i, (k, processor) in enumerate(self.processors.items()):
            states[k], caches[k] = _inner_stream_init(
                processor, num_channels, block_len, kwargs[k], noise_key, i
            )
        return states, {"inner": caches, "parallel_weights": parallel_weights}

    def stream_step(self, x, state, cache):
        pw = cache["parallel_weights"]
        if self.activation == "softmax":
            weights = jax.nn.softmax(pw, axis=-1)
        else:
            weights = jax.nn.softplus(pw) * self.mult
        outputs = []
        new_state = {}
        for i, (k, processor) in enumerate(self.processors.items()):
            out, new_state[k] = _inner_stream_step(
                processor, x, state[k], cache["inner"][k]
            )
            outputs.append(out * weights[..., i, None, None])
        return sum(outputs), new_state

    def parameter_size(self):
        size = {k: v.parameter_size() for k, v in self.processors.items()}
        size["parallel_weights"] = len(self.processors)
        return size

    # -- LTI-chain fusion capability (render/fuse.py) -------------------

    @property
    def lti_kind(self):
        """A weighted sum of FIR-LTI branches is FIR-LTI: the branch IRs
        shift-align and sum.  (No IIR form: a sum of cascades is not a
        cascade.)"""
        from grafx_tpu.processors.core.utils import lti_kind_of

        if all(
            lti_kind_of(p) == "fir" for p in self.processors.values()
        ):
            return "fir"
        return None

    def fir_kernel(self, parallel_weights, noise_key=None, **kwargs):
        from grafx_tpu.processors.core.utils import accepts_noise_key

        if self.activation == "softmax":
            weights = jax.nn.softmax(parallel_weights, axis=-1)
        else:
            weights = jax.nn.softplus(parallel_weights) * self.mult

        kernels = []
        intermediates = {}
        for i, (k, processor) in enumerate(self.processors.items()):
            kw = dict(kwargs[k])
            if noise_key is not None and accepts_noise_key(
                processor.fir_kernel
            ):
                kw["noise_key"] = jax.random.fold_in(noise_key, i)
            hi, si, aux = processor.fir_kernel(**kw)
            if aux:
                intermediates[k] = aux
            kernels.append((hi, si))

        # shift-align: a branch with shift s_i and total shift S is the
        # same operator as its IR delayed by S - s_i read at shift S
        shift = max(s for _, s in kernels)
        total_len = max(h.shape[-1] + shift - s for h, s in kernels)
        C = max(h.shape[-2] for h, _ in kernels)
        h_sum = None
        for i, (hi, si) in enumerate(kernels):
            pre = shift - si
            post = total_len - hi.shape[-1] - pre
            hi = jnp.pad(hi, [(0, 0)] * (hi.ndim - 1) + [(pre, post)])
            hi = jnp.broadcast_to(hi, hi.shape[:-2] + (C, hi.shape[-1]))
            hi = hi * weights[..., i, None, None]
            h_sum = hi if h_sum is None else h_sum + hi
        return h_sum, shift, intermediates or None


class GainStagingRegularization:
    """Wrap a processor and report |log-RMS in - log-RMS out| through the
    intermediates under ``key`` (reference: container.py:231-299)."""

    def __init__(self, processor, key="gain_reg"):
        self.processor = processor
        self.key = key

    def __call__(self, input_signals, noise_key=None, **processor_kwargs):
        out, intermediates = _split_output(
            self.processor(
                input_signals,
                **processor_kwargs,
                **_maybe_key(self.processor, noise_key),
            )
        )
        intermediates = {} if intermediates is None else dict(intermediates)
        assert self.key not in intermediates
        intermediates[self.key] = rms_difference(input_signals, out)
        return out, intermediates

    def stream_init(self, num_channels, block_len, noise_key=None, **kwargs):
        # the gain-staging aux loss is training-time only; streaming just
        # passes through the wrapped processor
        return _inner_stream_init(
            self.processor, num_channels, block_len, kwargs, noise_key, 0
        )

    def stream_step(self, x, state, cache):
        return _inner_stream_step(self.processor, x, state, cache)

    def parameter_size(self):
        return self.processor.parameter_size()

"""LTI-chain fusion: a graph-compiler pass that folds serial runs of
LTI processors into one operator.

A serial chain of linear-time-invariant processors is itself LTI, so
its members compose *before* touching the audio.  Two fusion families:

* **FIR** — impulse responses compose by convolution, which is *much*
  shorter than the audio.  Folding a run of k FIR-LTI nodes replaces k
  full-length signal convolutions (each several audio-length FFT
  passes) with one, plus k-1 cheap IR-length convolutions — on TPU,
  where long-FFT passes dominate such graphs (BASELINE.md round 3),
  this is a large win (e.g. the zero-phase-EQ -> reverb chain of
  BASELINE config 2: 16.9 -> 12.7 ms).
* **IIR** — exact-backend biquad cascades compose by concatenating
  their section stacks: k blocked-cascade applies (each a zero-state
  FFT/Toeplitz pass + a state-propagation scan + a kernel build)
  collapse into ONE with more sections, which the blocked algorithm
  absorbs almost for free (17 chains of 4 serial RBJ filters:
  7.5 -> 3.5 ms/step measured, BASELINE.md round 3).

This optimization has no counterpart in the reference (its executor
runs every node); it is the graph-level analog of XLA operator fusion,
applied where XLA cannot see the algebra.

Capability contract: a processor joins the ``"fir"`` family if it
implements

    fir_kernel(**params) -> (h, shift, aux_or_None)

meaning it equals ``y = crop(x * h, start=shift)`` with a causal
length-``L_h`` kernel ``h`` of shape ``(B, C_h, L_h)`` (``shift`` > 0
encodes zero-phase-style lookahead), and the ``"iir"`` family if it
implements

    biquad_kernel(**params) -> (Bs, As, post_gain_or_None)

with ``(B, C_h, K, 3)`` second-order-section stacks (exact backend
semantics).  A ``lti_kind`` property ("fir"/"iir"/None) arbitrates for
processors that could do either (fsm-backend cascades join "fir" with
their own FIR — exact; exact-backend cascades join "iir").
Channel-diagonal modes only — midside members report ``lti_kind =
None``.  Containers participate: a ``SerialChain`` of same-kind LTI
members, a ``DryWet`` wrapping an FIR member (internal weight:
``h = w h_wet + (1-w) d_shift``), and a ``ParallelMix`` of FIR branches
(weighted shift-aligned IR sum) are themselves LTI and join runs.

Use::

    G2, processors2 = fuse_serial_lti(G, processors)
    # then schedule / prepare / create parameters for G2 as usual

Fused nodes get a composite type named ``"fused(a+b+...)"`` whose
parameters nest per member position (``"0_a"``, ``"1_b"``, ...), like a
:class:`~grafx_tpu.processors.container.SerialChain`.

Semantics note (exactness): for **causal** members the fused render is
identical to the per-node render to float round-off.  For members with
zero-phase lookahead (``shift > 0``) the fused chain computes the
*ideal LTI composition*: it equals the per-node render of the signal
zero-padded at the start (gated to round-off by
tests/graph/test_fuse.py), whereas direct per-node rendering truncates
each zero-phase filter's pre-ring at the signal start — a finite-length
rendering artifact, worth ~1% worst-case on white noise and audibly
identical.
"""

from grafx_tpu.data.configs import UTILITY_TYPES
from grafx_tpu.data.graph import GRAFX
from grafx_tpu.data.configs import NodeConfigs


def compose_fir_kernels(members, nested_params, noise_key=None):
    """Compose ``[(name, processor), ...]`` FIR-LTI members into one
    ``(h, shift, intermediates)`` kernel: IRs convolve, shifts add, aux
    dicts nest by member name.  Shared by :class:`FusedFIRChain` and the
    LTI capabilities of the containers
    (:class:`~grafx_tpu.processors.container.SerialChain`...)."""
    import jax

    from grafx_tpu.ops.fftconv import fft_convolve
    from grafx_tpu.processors.core.utils import accepts_noise_key

    h = None
    h_len = 0
    shift = 0
    intermediates = {}
    for i, (name, proc) in enumerate(members):
        kw = dict(nested_params[name])
        if noise_key is not None and accepts_noise_key(proc.fir_kernel):
            kw["noise_key"] = jax.random.fold_in(noise_key, i)
        hi, si, aux = proc.fir_kernel(**kw)
        shift += si
        if aux:
            intermediates[name] = aux
        if h is None:
            h, h_len = hi, hi.shape[-1]
        else:
            h_len = h_len + hi.shape[-1] - 1
            h = fft_convolve(h, hi, mode="full")[..., :h_len]
    return h, shift, intermediates


def compose_biquad_kernels(members, nested_params):
    """Concatenate ``[(name, processor), ...]`` IIR-cascade members into
    one ``(Bs, As, post_gain)`` section stack (shared by
    :class:`FusedBiquadChain` and the containers' IIR capability)."""
    import jax.numpy as jnp

    Bs_list, As_list = [], []
    gain = None
    for name, proc in members:
        Bs, As, g = proc.biquad_kernel(**nested_params[name])
        Bs_list.append(Bs)
        As_list.append(As)
        if g is not None:
            gain = g if gain is None else gain * g
    B = Bs_list[0].shape[0]
    C = max(b.shape[1] for b in Bs_list)

    def cat(parts):
        return jnp.concatenate(
            [jnp.broadcast_to(p, (B, C) + p.shape[2:]) for p in parts],
            axis=2,
        )

    return cat(Bs_list), cat(As_list), gain


class FusedFIRChain:
    """The processor behind a fused serial FIR-LTI run.

    Composes the members' IRs (short convolutions), then applies ONE
    shift-cropped convolution to the audio.  Aux losses from members
    (e.g. a delay's ``radii_reg``) are merged and re-emitted.
    """

    def __init__(self, named_processors):
        self.members = list(named_processors)  # [(name, processor), ...]

    def __call__(self, input_signals, noise_key=None, **nested_params):
        from grafx_tpu.ops.fftconv import fft_convolve

        h, shift, intermediates = self._compose_ir(nested_params, noise_key)
        out = fft_convolve(input_signals, h, mode=("shift", shift))
        if intermediates:
            return out, intermediates
        return out

    def _compose_ir(self, nested_params, noise_key=None):
        return compose_fir_kernels(self.members, nested_params, noise_key)

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, noise_key=None, **nested):
        """Streaming contract: compose the chain IR once, stream the
        single convolution (partitioned delay line for long IRs, tail
        carry otherwise).  Chains with zero-phase members (``shift >
        0``) would need ``shift`` samples of lookahead and are rejected
        (stream the unfused graph or use causal members)."""
        from grafx_tpu.ops.fftconv import conv_stream_init

        h, shift, _ = self._compose_ir(nested, noise_key)
        if shift:
            raise NotImplementedError(
                f"fused chain has {shift} samples of zero-phase lookahead;"
                " block-wise streaming supports causal chains only."
            )
        state, conv = conv_stream_init(h, num_channels, block_len)
        return state, {"conv": conv}

    def stream_step(self, x, state, cache):
        from grafx_tpu.ops.fftconv import conv_stream_apply

        return conv_stream_apply(x, state, cache["conv"])

    def parameter_size(self):
        return {
            name: proc.parameter_size() for name, proc in self.members
        }


def _member_block_sizes(proc):
    """Exact-backend block sizes used inside ``proc`` (recurses into
    containers so a fused chain adopts the largest member block)."""
    bq = getattr(proc, "biquad", None)
    if bq is not None and getattr(bq, "exact_block_size", None):
        return [bq.exact_block_size]
    inner = getattr(proc, "processors", None)
    if isinstance(inner, dict):
        return [b for p in inner.values() for b in _member_block_sizes(p)]
    return []


class FusedBiquadChain:
    """The processor behind a fused serial run of exact-backend
    biquad-cascade processors (EQs, RBJ filters, pole-zero...).

    A serial chain of biquad cascades IS one longer cascade: the
    members' coefficient stacks concatenate along the section axis and
    the chain runs through ONE blocked exact-cascade apply
    (:func:`grafx_tpu.ops.iir.biquad_exact`) instead of one per member —
    one zero-state-response pass, one state-propagation scan, and one
    kernel build replace k of each.  Member post-gains (scalars per
    node, e.g. :class:`~grafx_tpu.processors.filter.PoleZeroFilter`'s)
    commute with the LTI chain and multiply into one output gain.

    Exactness: the fused cascade computes the same filter as the
    sequential application; both run the exact-class blocked algorithm,
    so outputs agree to the exact path's round-off (gated by
    tests/graph/test_fuse.py).  Precision scales with the cascade's
    cumulative gain dynamic range, which for real EQ/filter sections
    (bounded boost by construction) stays benign at any practical K —
    the K=34 unit-peak on-chip gate and the fused PEQ+GEQ chain (−86 dB,
    examples/fused_mastering.py) are the evidence; a cascade of many
    *unnormalized* random sections exceeds float32 end-to-end no matter
    the algorithm (BASELINE.md round 3, "Large-K precision floor").
    """

    def __init__(self, named_processors):
        self.members = list(named_processors)
        from grafx_tpu.processors.core.iir import IIRFilter

        blocks = [
            b for _, p in self.members for b in _member_block_sizes(p)
        ]
        self.biquad = IIRFilter(
            order=2,
            backend="exact",
            exact_block_size=max(blocks) if blocks else 128,
        )

    def _compose(self, nested_params):
        return compose_biquad_kernels(self.members, nested_params)

    def precompute(self, **nested_params):
        """``precompute`` hook: one kernel build for the whole chain."""
        Bs, As, gain = self._compose(nested_params)
        cache = dict(self.biquad.precompute(Bs, As))
        if gain is not None:
            cache["post_gain"] = gain
        return cache

    @staticmethod
    def _split(cache):
        return (
            {k: v for k, v in cache.items() if k != "post_gain"},
            cache.get("post_gain"),
        )

    def __call__(self, input_signals, _cache=None, **nested_params):
        if _cache is None:
            _cache = self.precompute(**nested_params)
        iir_cache, gain = self._split(_cache)
        y = self.biquad(input_signals, cache=iir_cache)
        if gain is not None:
            y = gain[..., None] * y
        return y

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, **nested_params):
        cache = self.precompute(**nested_params)
        iir_cache, _ = self._split(cache)
        state = self.biquad.stream_zero_state(
            iir_cache, num_channels, block_len
        )
        return state, cache

    def stream_step(self, x, state, cache):
        iir_cache, gain = self._split(cache)
        y, state = self.biquad.stream(x, state, iir_cache)
        if gain is not None:
            y = gain[..., None] * y
        return y, state

    def parameter_size(self):
        return {
            name: proc.parameter_size() for name, proc in self.members
        }


class FusedDynamicsChain:
    """The processor behind a fused serial run of dynamics processors
    (compressors / noise gates — the third fusion family, "dynamics").

    A dynamics node's whole effect is ``y = gain(mean(x^2, ch)) * x``
    where the gain depends only on the input's per-sample energy
    (reference: src/grafx/processors/dynamics.py:213-721).  Because
    ``mean((g x)^2, ch) == g^2 mean(x^2, ch)``, a serial run needs the
    channel energy computed ONCE; each member's input energy is the
    shared energy scaled by the squared product of the upstream gains,
    and the signal is touched a single time at the end with the product
    of all gains:

        e      = mean(x^2, ch)
        g_1    = gain_1(e)
        g_2    = gain_2(g_1^2 e)          # = gain_2(mean((g_1 x)^2))
        ...
        y      = (g_1 g_2 ...) * x

    vs the per-node render's k full-signal multiplies and k channel
    reductions.  This is algebraically identical to the sequential
    application (float round-off only: ``g^2 e`` vs ``mean(g^2 x^2)``).

    On TPU, a pair whose members use ballistics OR exact one-pole
    (``iir_exact``) energy smoothing with quadratic knees and no gain
    smoothing (the common gate -> compressor serving chain, e.g.
    BASELINE config 4, including the default
    ``NoiseGate(energy_smoother="iir_exact")``) runs as ONE Pallas
    kernel computing both data-dependent recursions in a single walk
    over time (:func:`grafx_tpu.ops.ballistics.
    ballistics_gain_pair_core`; a one-pole is the ``at == rt`` special
    case with init 0).  Other combinations use the composed path above.

    PADDING (``fuse_serial_lti(dynamics_pad=True)``): a lone dynamics
    node can join a 2-member composite type with the missing member
    marked ABSENT in the per-node ``_absent`` parameter (shape
    ``(N, k)``, >0.5 = absent; the default near-zero init means
    present).  An absent member's gain is the exact identity: on the
    pair-kernel path its knee coefficient is multiplied by the
    gradient-free presence indicator (``cf = 0`` makes
    ``gain = exp(0 * f) = 1`` bit-exactly and zeroes every member-A
    parameter gradient), and the composed/streaming paths select 1.0
    outright.  This lets a console whose chains only PARTLY share the
    gate -> compressor pair still run ALL its dynamics in one serial
    walk instead of splitting the stage (the round-4 coverage guard's
    measured +3.3 ms failure mode).
    """

    def __init__(self, named_processors):
        self.members = list(named_processors)

    def _pair_kernel_args(self, nested_params):
        """If the 2-member single-walk fast path applies, return the
        per-member knee/recursion constants; else ``None``.

        Eligible member smoothers: ballistics (native recursion, init
        1.0) and the exact one-pole (``iir_exact`` — the ``at == rt ==
        1 - alpha`` special case with init 0.0 and a no-op relu on
        nonnegative energy), so the default serving gate
        (``NoiseGate(energy_smoother="iir_exact")``) rides the same
        fused walk as a ballistics gate."""
        from grafx_tpu.ops.ballistics import fused_gain_available
        from grafx_tpu.processors.core.envelope import (
            Ballistics,
            TruncatedOnePoleIIRFilter,
        )

        if len(self.members) != 2 or not fused_gain_available():
            return None
        absent = nested_params.get("_absent")
        consts = []
        for idx, (name, proc) in enumerate(self.members):
            smoother = getattr(proc, "energy_smoother_module", None)
            is_ballistics = isinstance(smoother, Ballistics)
            is_onepole = (
                isinstance(smoother, TruncatedOnePoleIIRFilter)
                and smoother.exact
            )
            if (
                getattr(proc, "knee", None) != "quadratic"
                or not (is_ballistics or is_onepole)
                or proc.gain_smoother is not None
            ):
                return None
            import jax
            import jax.numpy as jnp

            p = nested_params[name]
            if is_ballistics:
                ts = jax.nn.sigmoid(p["z_alpha_pre"])
                at, rt = ts[..., 0], ts[..., 1]
                init = 1.0
            else:
                alpha = jnp.minimum(
                    jax.nn.sigmoid(p["z_alpha_pre"][..., 0]), 1.0 - 1e-5
                )
                at = rt = 1.0 - alpha
                init = 0.0
            ratio = 1.0 + jnp.exp(p["log_ratio"][..., 0])
            cf = (
                1.0 / ratio - 1.0
                if proc._fused_kind == "compressor"
                else ratio - 1.0
            )
            if absent is not None:
                # absent member -> cf = 0 -> gain = exp(0 * f) = 1
                # exactly; the comparison is gradient-free, so every
                # absent-row member parameter gets an exactly-zero grad
                cf = cf * (absent[..., idx] <= 0.5).astype(cf.dtype)
            consts.append(
                dict(
                    at=at,
                    rt=rt,
                    th=p["log_threshold"][..., 0] - 6.0,
                    cf=cf,
                    hk=jnp.exp(p["log_knee"][..., 0]) / 2.0,
                    kind=proc._fused_kind,
                    init=init,
                )
            )
        return consts

    def __call__(self, input_signals, **nested_params):
        import jax.numpy as jnp

        energy = jnp.mean(jnp.square(input_signals), axis=-2)
        pair = self._pair_kernel_args(nested_params)
        if pair is not None:
            from grafx_tpu.ops.ballistics import ballistics_gain_pair_core

            a, b = pair
            gain = ballistics_gain_pair_core(
                energy,
                a["at"], a["rt"], a["th"], a["cf"], a["hk"],
                b["at"], b["rt"], b["th"], b["cf"], b["hk"],
                (a["kind"], b["kind"]),
                (a["init"], b["init"]),
            )
            return gain[:, None, :] * input_signals
        absent = nested_params.get("_absent")
        gain = None
        for idx, (name, proc) in enumerate(self.members):
            e_i = energy if gain is None else jnp.square(gain) * energy
            g_i = proc.gain_from_energy(e_i, **nested_params[name])
            if absent is not None:
                g_i = jnp.where(absent[..., idx : idx + 1] > 0.5, 1.0, g_i)
            gain = g_i if gain is None else gain * g_i
        return gain[:, None, :] * input_signals

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, **nested_params):
        """Streaming contract: carry every member's smoother state; the
        block step threads gain products exactly like ``__call__``'s
        composed path (identical outputs)."""
        states, caches = {}, {}
        for name, proc in self.members:
            s, c = proc.stream_init(
                num_channels, block_len, **nested_params[name]
            )
            states[name] = s
            caches[name] = c
        if "_absent" in nested_params:
            caches["_absent"] = nested_params["_absent"]
        return states, caches

    def stream_step(self, x, state, cache):
        import jax.numpy as jnp

        energy = jnp.mean(jnp.square(x), axis=-2)
        absent = cache.get("_absent")
        gain = None
        new_state = {}
        for idx, (name, proc) in enumerate(self.members):
            e_i = energy if gain is None else jnp.square(gain) * energy
            g_i, new_state[name] = proc.gain_stream_from_energy(
                e_i, state[name], cache[name]
            )
            if absent is not None:
                g_i = jnp.where(absent[..., idx : idx + 1] > 0.5, 1.0, g_i)
            gain = g_i if gain is None else gain * g_i
        return gain[:, None, :] * x, new_state

    def parameter_size(self):
        sizes = {name: proc.parameter_size() for name, proc in self.members}
        # per-node member-presence mask (>0.5 = absent; the ~N(0, 1e-4)
        # default init means "present", i.e. plain pairs are unaffected).
        # STRUCTURAL, not trainable: render gradients are exactly zero,
        # but optimizers with gradient-free terms (adamw weight decay)
        # would still decay a 1.0 flag toward the 0.5 threshold and flip
        # an absent member to present mid-run — mask _absent out of any
        # such optimizer (GraphParameterOptimizer auto-freezes it via
        # its multi_transform routing).
        sizes["_absent"] = len(self.members)
        return sizes


_FUSED_CLASS = {
    "fir": FusedFIRChain,
    "iir": FusedBiquadChain,
    "dynamics": FusedDynamicsChain,
}


def _lti_kind(node_type, processors):
    """``"fir"`` / ``"iir"`` / ``"dynamics"`` / ``None`` for a node type
    (see :func:`grafx_tpu.processors.core.utils.lti_kind_of`; the
    dynamics family is marked by the ``dynamics_fusable`` attribute)."""
    from grafx_tpu.processors.core.utils import lti_kind_of

    if node_type in UTILITY_TYPES:
        return None
    proc = processors.get(node_type)
    k = lti_kind_of(proc)
    if k is None and getattr(proc, "dynamics_fusable", False):
        k = "dynamics"
    return k


def fuse_serial_fir(G, processors, min_run=2):
    """Fold maximal serial runs of FIR-LTI nodes (see
    :func:`fuse_serial_lti`; this is the ``kinds=("fir",)`` slice,
    kept as the original entry point)."""
    return fuse_serial_lti(G, processors, min_run=min_run, kinds=("fir",))


def fuse_serial_lti(
    G,
    processors,
    min_run=2,
    kinds=("fir", "iir", "dynamics"),
    dynamics_partial=False,
    dynamics_pad=False,
    _pad_exclude=frozenset(),
):
    """Rewrite ``G``, folding maximal serial runs of same-kind fusable
    nodes.

    A run is a path ``n_1 -> ... -> n_k`` where every node's processor
    has the same fusion kind (``"fir"``: implements ``fir_kernel``;
    ``"iir"``: exact-backend biquad cascade with ``biquad_kernel``;
    ``"dynamics"``: compressor/gate marked ``dynamics_fusable``),
    every interior edge is the single out-edge of its source and single
    in-edge of its target, and no node is an ``in``/``out``/``mix``
    utility.  FIR runs fold into one convolution
    (:class:`FusedFIRChain`); IIR runs fold into one longer exact
    cascade (:class:`FusedBiquadChain`); dynamics runs fold into a
    shared-energy gain product (:class:`FusedDynamicsChain`).

    Args:
        G: a :class:`GRAFX` graph (unscheduled).
        processors: node-type -> processor dict.
        min_run: minimum run length to fold (default 2).
        kinds: which fusion families to apply.
        dynamics_partial: by default dynamics runs fuse only when EVERY
            node of the member types sits in a run (partial fusion
            splits the type's serial-walk stage and adds a whole walk
            per direction — measured slower); pass ``True`` to fuse
            partial coverage anyway.
        dynamics_pad: rescue partial dynamics coverage by PADDING: a
            lone node of a member type of some 2-member dynamics
            pattern joins that composite type with the other member
            marked absent (``_absent`` parameter; an absent member's
            gain is the exact identity), so the whole family still
            collapses into one serial-walk stage.  The coverage guard
            then applies to what padding could not rescue.
            ``"auto"`` additionally DEMOTES useless padding: after
            fusing, the fused graph is scheduled and any composite
            stage consisting ONLY of padded lone nodes (no genuine
            run — e.g. bus compressors that depend on every source
            chain and so can never co-schedule with the source pairs)
            is re-fused with those nodes excluded, since for them the
            two-recursion pair walk costs strictly more serial time
            than the plain single-recursion walk and merges nothing.
        _pad_exclude: internal (used by ``dynamics_pad="auto"``):
            original-graph node ids never to pad; they keep their
            plain type and are treated as covered by the guard.

    Returns:
        ``(G_fused, processors_fused)`` — a NEW graph over a config
        extended with the composite types, and the processor dict
        extended with the fused-chain instances.  Build parameters for
        the fused graph (``create_empty_parameters`` on ``G_fused``);
        identical type-sequences share one composite type (so fused
        nodes still batch across chains).
    """
    if dynamics_pad == "auto":
        exclude = frozenset(_pad_exclude)
        for _ in range(1 + len(G.nodes)):  # fixed point; bounded
            G2, P2 = fuse_serial_lti(
                G,
                processors,
                min_run=min_run,
                kinds=kinds,
                dynamics_partial=dynamics_partial,
                dynamics_pad=True,
                _pad_exclude=exclude,
            )
            more = _padded_only_stage_nodes(G2)
            new = exclude | more
            if new == exclude:
                return G2, P2
            exclude = new
        return G2, P2

    # --- find runs ------------------------------------------------------
    def kind_of(node):
        k = _lti_kind(G.nodes[node]["node_type"], processors)
        return k if k in kinds else None

    in_run = set()
    runs = []  # [(kind, [nodes...]), ...]
    for n in sorted(G.nodes):
        if n in in_run:
            continue
        k = kind_of(n)
        if k is None:
            continue
        # start a run only at a node whose predecessor cannot extend it
        preds = list(G.predecessors(n))
        if (
            len(preds) == 1
            and G.out_degree(preds[0]) == 1
            and G.in_degree(n) == 1
            and kind_of(preds[0]) == k
        ):
            continue  # an earlier start will cover this node
        run = [n]
        cur = n
        while True:
            succs = list(G.successors(cur))
            if len(succs) != 1 or G.out_degree(cur) != 1:
                break
            nxt = succs[0]
            if G.in_degree(nxt) != 1 or kind_of(nxt) != k:
                break
            run.append(nxt)
            cur = nxt
        if len(run) >= min_run:
            seq = tuple(G.nodes[m]["node_type"] for m in run)
            runs.append((k, run, seq))
            in_run.update(run)

    if dynamics_pad:
        # Lone nodes of a member type of some 2-member dynamics pattern
        # join that composite type with the other member absent (runs
        # carry None at the absent position; the member's gain is the
        # exact identity via the _absent parameter).
        patterns = []
        for k, run, seq in runs:
            if k == "dynamics" and len(seq) == 2 and seq not in patterns:
                patterns.append(seq)
        pad_exempt = set()
        for seq in patterns:
            for pos, t in enumerate(seq):
                for n in sorted(G.nodes):
                    if (
                        n in in_run
                        or G.nodes[n]["node_type"] != t
                        or kind_of(n) != "dynamics"
                    ):
                        continue
                    if n in _pad_exclude:
                        pad_exempt.add(n)
                        continue
                    padded = [None, None]
                    padded[pos] = n
                    runs.append(("dynamics", padded, seq))
                    in_run.add(n)
    else:
        pad_exempt = set(_pad_exclude)

    if not dynamics_partial:
        # Dynamics-coverage guard: fusing SOME of a type's nodes moves
        # them to a composite type, splitting the type's render stage —
        # and a ballistics stage is a serial walk whose cost is
        # row-count-independent, so a split ADDS a whole walk per
        # direction (measured +3.3 ms on the headline console where
        # only 6/17 chains have a gate; BASELINE.md r4).  Keep dynamics
        # runs only when every node of every member type is inside a
        # run, i.e. fusion removes stages instead of splitting them.
        total = {}
        for n in G.nodes:
            t = G.nodes[n]["node_type"]
            total[t] = total.get(t, 0) + 1
        covered = {}
        for k, run, seq in runs:
            if k != "dynamics":
                continue
            for n in run:
                if n is None:
                    continue
                t = G.nodes[n]["node_type"]
                covered[t] = covered.get(t, 0) + 1
        # pad-exempt nodes (dynamics_pad="auto") are scheduling-proven
        # unable to merge with any fused stage: their plain-type stage
        # exists either way, so they don't split anything — covered.
        for n in pad_exempt:
            t = G.nodes[n]["node_type"]
            covered[t] = covered.get(t, 0) + 1
        kept = []
        for k, run, seq in runs:
            if k == "dynamics" and any(
                covered.get(t, 0) < total[t] for t in set(seq)
            ):
                in_run.difference_update(n for n in run if n is not None)
                continue
            kept.append((k, run, seq))
        runs = kept

    if not runs:
        return G, dict(processors)

    # --- composite types ------------------------------------------------
    processors_fused = dict(processors)
    run_type = {}
    for k, run, seq in runs:
        if seq not in run_type:
            fused_name = "fused(" + "+".join(seq) + ")"
            run_type[seq] = fused_name
            processors_fused[fused_name] = _FUSED_CLASS[k](
                [(f"{i}_{t}", processors[t]) for i, t in enumerate(seq)]
            )

    # --- rebuild the graph ---------------------------------------------
    # carry the ORIGINAL type definitions (incl. MIMO inlets/outlets)
    # and add the (SISO) composite types
    base_defs = {
        t: G.config.node_type_dict[t]
        for t in G.config.node_types
        if t not in UTILITY_TYPES
    }
    for fused_name in sorted(run_type.values()):
        base_defs[fused_name] = {"inlets": ["main"], "outlets": ["main"]}
    config = NodeConfigs(base_defs)
    G2 = GRAFX(config=config, invalid_op=G.invalid_op)

    node_map = {}  # old node -> new node carrying its output
    for _, run, seq in runs:
        fused = G2.add(run_type[seq])
        for n in run:
            if n is not None:
                node_map[n] = fused
    for n in sorted(G.nodes):
        if n not in node_map:
            node_map[n] = G2.add(G.nodes[n]["node_type"])

    interior = {
        (run[i], run[i + 1])
        for _, run, _seq in runs
        for i in range(len(run) - 1)
    }
    for u, v, data in G.edges(data=True):
        if (u, v) in interior:
            continue
        # preserve MIMO outlet/inlet names; edges at a fused boundary
        # connect to the composite node's single "main" port
        outlet = data.get("outlet", "main") if u not in in_run else "main"
        inlet = data.get("inlet", "main") if v not in in_run else "main"
        G2.connect(node_map[u], node_map[v], outlet=outlet, inlet=inlet)

    # node provenance for parameter migration (fuse_parameters):
    # new composite node -> its run's original nodes (member order);
    # new plain node -> [original node]
    fused_from = {}
    for _, run, _seq in runs:
        first = next(n for n in run if n is not None)
        fused_from[node_map[first]] = list(run)
    for n, n2 in node_map.items():
        if n2 not in fused_from:
            fused_from[n2] = [n]
    G2.graph["fused_from"] = fused_from

    return G2, processors_fused


def _padded_only_stage_nodes(G_fused, method="beam", **order_kwargs):
    """Original-graph node ids whose padded composite stage holds NO
    genuine run (``dynamics_pad="auto"`` demotion criterion).

    Schedules ``G_fused`` and inspects every scheduled stage of a
    composite dynamics type: if every node in a stage is a padded lone
    (its ``fused_from`` entry carries a ``None`` member), the pair walk
    there merges nothing — it only replaces the member's cheaper
    single-recursion walk — so those nodes should stay plain.  A stage
    with at least one genuine run keeps its padded peers (they merged
    into that walk).
    """
    from grafx_tpu.render.order.graph import compute_render_order

    fused_from = G_fused.graph.get("fused_from", {})
    _, render_order = compute_render_order(
        G_fused, method=method, **order_kwargs
    )
    nodes = sorted(G_fused.nodes)
    stages = {}
    for n, order in zip(nodes, render_order):
        t = G_fused.nodes[n]["node_type"]
        if t.startswith("fused("):
            stages.setdefault((int(order), t), []).append(n)
    demote = set()
    for (_order, _t), members in stages.items():
        srcs = [fused_from.get(m, [m]) for m in members]
        if all(any(s is None for s in src) for src in srcs):
            for src in srcs:
                demote.update(s for s in src if s is not None)
    return demote


def _scheduled_type_rows(G, method, **order_kwargs):
    """Within-type parameter row of every node of ``G`` under the
    scheduled (reorder_for_fast_render) node order.

    Parameter arrays bind to nodes through the ORDERED tensor's
    per-type indices, so the row of a node is its rank among same-type
    nodes after the render-order relabeling — schedule-dependent
    whenever a type spans several stages."""
    import numpy as np

    from grafx_tpu.render.order.graph import compute_render_order
    from grafx_tpu.render.order.tensor import node_id_from_render_order

    _, render_order = compute_render_order(G, method=method, **order_kwargs)
    new_id = np.asarray(node_id_from_render_order(render_order))
    nodes = sorted(G.nodes)  # convert_to_tensor's node enumeration
    rows = {}
    counts = {}
    for idx in np.argsort(new_id):
        n = nodes[idx]
        t = G.nodes[n]["node_type"]
        rows[n] = counts.get(t, 0)
        counts[t] = rows[n] + 1
    return rows


def fuse_parameters(
    params, G, G_fused, processors_fused, method="beam", **order_kwargs
):
    """Migrate per-type parameters from ``G`` to its fused rewrite.

    Per-type parameter arrays bind to nodes by their within-type order
    in the *scheduled* tensor; fusion reshuffles nodes across types (a
    run's members leave their original types and land, nested, under
    the composite type).  This helper re-gathers every leaf row
    accordingly, so parameters trained on the unfused graph (created
    with ``create_empty_parameters(processors, G)`` and used through
    ``reorder_for_fast_render(..., method=...)``) drop into the fused
    graph with identical render output.

    Args:
        params: type -> parameter dict for ``G`` (leading dim = nodes
            of the type, in scheduled within-type order).
        G: the original graph.
        G_fused: the graph returned by :func:`fuse_serial_lti`.
        processors_fused: the processor dict returned alongside it.
        method: the scheduling method used with BOTH graphs'
            ``reorder_for_fast_render`` (row binding is
            schedule-dependent when a type spans several stages).

    Returns:
        type -> parameter dict for ``G_fused``.
    """
    import numpy as np

    fused_from = G_fused.graph.get("fused_from")
    if fused_from is None:
        if G_fused is G:
            return params
        raise ValueError(
            "G_fused carries no fusion provenance; pass the graph"
            " returned by fuse_serial_lti."
        )

    orig_row = _scheduled_type_rows(G, method, **order_kwargs)
    fused_row = _scheduled_type_rows(G_fused, method, **order_kwargs)

    import jax
    import jax.numpy as jnp

    def gather(tree, rows):
        return jax.tree.map(lambda a: a[np.asarray(rows)], tree)

    out = {}
    for t2 in processors_fused:
        nodes2 = sorted(
            (n for n in G_fused.nodes
             if G_fused.nodes[n]["node_type"] == t2),
            key=lambda n: fused_row[n],
        )
        if not nodes2:
            continue
        proc = processors_fused[t2]
        if t2.startswith("fused(") and hasattr(proc, "members"):
            nested = {}
            absent = np.zeros((len(nodes2), len(proc.members)), np.float32)
            for i, (mname, _) in enumerate(proc.members):
                t_orig = mname.split("_", 1)[1]
                srcs = [fused_from[n2][i] for n2 in nodes2]
                # padded composite nodes (dynamics_pad) have no source
                # node for an absent member: zero-fill its rows and
                # flag them in the _absent mask
                rows = [orig_row[s] if s is not None else 0 for s in srcs]
                sub = gather(params[t_orig], rows)
                if any(s is None for s in srcs):
                    keep = np.array(
                        [0.0 if s is None else 1.0 for s in srcs],
                        np.float32,
                    )
                    sub = jax.tree_util.tree_map(
                        lambda a: a
                        * keep.reshape((-1,) + (1,) * (a.ndim - 1)),
                        sub,
                    )
                    absent[:, i] = 1.0 - keep
                nested[mname] = sub
            if "_absent" in proc.parameter_size():
                nested["_absent"] = jnp.asarray(absent)
            out[t2] = nested
        elif t2 in params:
            rows = [orig_row[fused_from[n2][0]] for n2 in nodes2]
            out[t2] = gather(params[t2], rows)
    return out

"""Gradient-based graph parameter estimation.

Packages the canonical GRAFX training loop (SURVEY.md §3.5: render ->
audio loss + aux losses -> backward -> step) as a single jitted update
function over an optax optimizer.  The whole update — graph render,
multi-resolution STFT loss, backward pass, and optimizer step — is one
XLA program.
"""

import jax
import jax.numpy as jnp
import optax

from grafx_tpu.ops.losses import (
    multi_resolution_stft_loss,
    multi_resolution_stft_loss_precomputed,
    precompute_stft_targets,
)
from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
from grafx_tpu.data import convert_to_tensor
from grafx_tpu.utils import create_empty_parameters


class GraphParameterOptimizer:
    """Fit a graph's processor parameters to match target audio.

    Args:
        G: a :class:`GRAFX` graph.
        processors: type -> processor mapping.
        loss_fn: ``f(output, target) -> scalar`` (default:
            multi-resolution STFT loss).
        optimizer: an optax optimizer (default: ``adam(1e-2)``).
        trainable: optional parameter-freezing spec — the torch
            workflow of setting ``requires_grad=False`` per module
            (reference docs train subsets this way) maps to an
            ``optax.multi_transform`` routing here.  Either a type-level dict
            ``{"eq": True, "reverb": False, ...}`` (missing types
            default to trainable) or a full boolean pytree matching the
            parameter structure.  Frozen leaves keep their initial
            values exactly; gradients for them are still computed but
            discarded by the optimizer mask.
        aux_weight: weight applied to the summed aux (intermediates)
            losses such as ``gain_reg`` / ``radii_reg``.
        method: scheduling method.
        fuse: apply the LTI-chain fusion pass
            (:func:`grafx_tpu.render.fuse_serial_lti`) before
            scheduling — serial FIR runs fold into one convolution and
            serial exact-cascade runs into one cascade.  Parameters are
            initialized on the ORIGINAL graph and migrated through
            :func:`grafx_tpu.render.fuse_parameters` (so the fused init
            distribution matches the unfused one exactly).  Pass
            ``"pad"`` to additionally pad lone dynamics nodes into the
            2-member composite type with an absent (identity) member
            (``dynamics_pad=True``); padded members start flagged
            absent with zero-filled rows, and every ``_absent`` mask is
            auto-frozen (see below) so gradient-free optimizer terms
            such as weight decay cannot flip a member present mid-run.
            ``"pad-auto"`` pads the same way but demotes lone nodes
            whose composite stage would hold no genuine run back to
            their plain (cheaper single-walk) type
            (``dynamics_pad="auto"``).
    """

    def __init__(
        self,
        G,
        processors,
        loss_fn=multi_resolution_stft_loss,
        optimizer=None,
        trainable=None,
        aux_weight=1.0,
        method="beam",
        key=None,
        fuse=False,
    ):
        G_unfused = processors_unfused = None
        if fuse:
            from grafx_tpu.render import fuse_serial_lti

            G_unfused, processors_unfused = G, processors
            G, processors = fuse_serial_lti(
                G,
                processors,
                dynamics_pad=(
                    "auto" if fuse == "pad-auto" else (fuse == "pad")
                ),
            )
        self.G = G
        self.processors = processors
        # With the default MR-STFT loss, the target's spectrograms are
        # loop-invariant: precompute them once per distinct target array
        # (outside jit) and evaluate the loss against the cached specs —
        # bit-identical loss value, half the per-step loss FFTs.
        self._precompute_target = loss_fn is multi_resolution_stft_loss
        if self._precompute_target:
            loss_fn = multi_resolution_stft_loss_precomputed
            self._target_cache = (None, None)  # (target ref, specs)
        self.loss_fn = loss_fn
        self.aux_weight = aux_weight
        self.optimizer = optimizer or optax.adam(1e-2)

        G_t = reorder_for_fast_render(convert_to_tensor(G), method=method)
        self.render_data = prepare_render(G_t)
        self.render = make_render_fn(processors, self.render_data, jit=False)
        key = key if key is not None else jax.random.PRNGKey(0)
        if G_unfused is not None:
            # Initialize on the ORIGINAL graph and migrate through the
            # schedule-aware fuse_parameters: padded composite nodes
            # (fuse="pad") then start with the missing member flagged
            # absent (_absent = 1) and its rows zero-filled — the exact
            # identity the docstring promises.  A naive
            # create_empty_parameters on the fused graph would draw
            # _absent ~ N(0, 1e-2) = "all members present" and TRAIN the
            # padding member from random init, silently changing the
            # user's graph.
            from grafx_tpu.render import fuse_parameters

            params_unfused = create_empty_parameters(
                processors_unfused, G_unfused, key=key
            )
            self.params = fuse_parameters(
                params_unfused, G_unfused, G, processors, method=method
            )
        else:
            self.params = create_empty_parameters(processors, G, key=key)
        mask = (
            self._trainable_mask(trainable, self.params)
            if trainable is not None
            else jax.tree.map(lambda _: True, self.params)
        )
        # _absent member-presence masks are STRUCTURAL, not trainable:
        # their render gradients are exactly zero, but gradient-free
        # optimizer terms (e.g. adamw weight decay) would still decay a
        # 1.0 flag toward the 0.5 threshold and flip an absent member to
        # present mid-run.  Always route them to set_to_zero.
        mask = self._freeze_absent(mask)
        if not all(jax.tree.leaves(mask)):
            # NOT optax.masked: it passes masked-out updates through
            # UNtransformed (i.e. raw gradients reach apply_updates),
            # which moves "frozen" parameters.  multi_transform routes
            # frozen leaves to set_to_zero so they stay bitwise intact.
            labels = jax.tree.map(
                lambda m: "train" if m else "freeze", mask
            )
            self.optimizer = optax.multi_transform(
                {"train": self.optimizer, "freeze": optax.set_to_zero()},
                labels,
            )
        self.opt_state = self.optimizer.init(self.params)

        @jax.jit
        def update(params, opt_state, input_signals, target):
            def total_loss(p):
                out, intermediates, _ = self.render(input_signals, p)
                loss = self.loss_fn(out, target)
                aux = sum(
                    jnp.sum(v)
                    for inter in intermediates
                    for v in jax.tree.leaves(inter)
                )
                return loss + self.aux_weight * aux, loss

            (total, audio_loss), grads = jax.value_and_grad(
                total_loss, has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, audio_loss

        self._update = update

    @staticmethod
    def _freeze_absent(mask):
        """Set every ``_absent`` subtree of a boolean trainable mask to
        ``False`` (see ``__init__``: presence masks are structural)."""

        def walk(m):
            if isinstance(m, dict):
                return {
                    k: (
                        jax.tree.map(lambda _: False, v)
                        if k == "_absent"
                        else walk(v)
                    )
                    for k, v in m.items()
                }
            return m

        return walk(mask)

    @staticmethod
    def _trainable_mask(trainable, params):
        """Expand a ``trainable`` spec to a boolean pytree over ``params``.

        Type-level dict: each processor type's whole subtree gets one
        flag (missing types default to True).  Anything else is assumed
        to be a full boolean pytree with the parameter structure.
        """
        if isinstance(trainable, dict) and all(
            isinstance(v, bool) for v in trainable.values()
        ):
            unknown = set(trainable) - set(params)
            if unknown:
                raise ValueError(
                    f"trainable names unknown processor types {sorted(unknown)};"
                    f" graph has {sorted(params)}"
                )
            return {
                t: jax.tree.map(lambda _: bool(trainable.get(t, True)), sub)
                for t, sub in params.items()
            }
        return trainable

    def step(self, input_signals, target):
        """One jitted optimization step; returns (total_loss, audio_loss)."""
        if self._precompute_target:
            cached, specs = self._target_cache
            if cached is not target:
                specs = precompute_stft_targets(target)
                self._target_cache = (target, specs)
            target = specs
        self.params, self.opt_state, total, audio = self._update(
            self.params, self.opt_state, input_signals, target
        )
        return total, audio

    def fit(self, input_signals, target, num_steps=100, log_every=0):
        """Run ``num_steps`` updates; returns the loss history."""
        history = []
        for i in range(num_steps):
            total, audio = self.step(input_signals, target)
            history.append(float(audio))
            if log_every and (i % log_every == 0):
                print(f"step {i}: audio_loss={float(audio):.6f}")
        return history

    def save(self, directory, metadata=None):
        """Checkpoint the full optimization state (graph, parameters,
        optimizer moments) for exact resume via :meth:`restore`."""
        import os

        from grafx_tpu import checkpoint as ckpt

        ckpt.save_session(directory, self.G, self.params, metadata)
        ckpt.save_parameters(
            os.path.join(directory, "opt_state"), self.opt_state
        )

    def restore(self, directory):
        """Load a checkpoint from :meth:`save` into this optimizer
        (which must be constructed with the same graph/processors/
        optimizer configuration).  Resumed ``fit`` continues the
        original trajectory exactly (parameters AND optimizer moments
        are restored).  Returns the saved metadata (or ``None``)."""
        import os

        from grafx_tpu import checkpoint as ckpt

        _, params, metadata = ckpt.load_session(directory, like=self.params)
        self.params = params
        self.opt_state = ckpt.load_parameters(
            os.path.join(directory, "opt_state"), like=self.opt_state
        )
        return metadata

    def render_current(self, input_signals):
        """Render with the current parameters."""
        if not hasattr(self, "_render_jit"):
            # one persistent jit wrapper — a fresh jax.jit(...) per call
            # would re-trace every time
            self._render_jit = jax.jit(self.render)
        out, intermediates, _ = self._render_jit(input_signals, self.params)
        return out

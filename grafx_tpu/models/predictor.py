"""Neural parameter prediction: audio features -> graph parameters.

The GRAFX paper's companion use-case (arXiv:2408.03204) trains neural
networks to predict processor parameters, differentiating through the
graph render.  This module packages that workflow without external NN
frameworks: a per-type MLP maps per-node audio features to every
parameter tensor of that type, producing the same nested pytree that
``render_grafx`` consumes — so ``loss(render(x, predict(theta, feats)))``
is one jitted program and ``jax.grad`` trains the network end-to-end
through the DSP.
"""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.ops.stft import hann_window, stft
from grafx_tpu.utils import _int_to_tuple


def audio_features(signals, n_fft=1024, hop=512, num_bands=32, sr=44100):
    """Per-item log-mel-band energy statistics: a compact, differentiable
    conditioning vector ``(B, 2 * num_bands)`` (mean and std over time).

    Args:
        signals: ``(B, C, L)``.
    """
    from grafx_tpu.processors.core.fft_filterbank import TriangularFilterBank

    window = jnp.asarray(hann_window(n_fft), dtype=signals.dtype)
    mono = signals.mean(axis=-2)
    spec = jnp.abs(stft(mono, n_fft, hop, window)) ** 2  # (B, F, T)
    fb = TriangularFilterBank(
        num_frequency_bins=n_fft // 2 + 1,
        num_filters=num_bands,
        scale="mel_htk",
        f_min=40,
        f_max=sr // 2,
        sr=sr,
    )
    bands = fb(jnp.swapaxes(spec, -1, -2), mode="analysis")  # (B, T, bands)
    log_bands = jnp.log(bands + 1e-6)
    return jnp.concatenate([log_bands.mean(-2), log_bands.std(-2)], axis=-1)


class ParameterPredictor:
    """Per-type MLPs from feature vectors to parameter pytrees.

    Args:
        processors: type -> processor mapping (defines output shapes via
            ``parameter_size()``).
        feature_dim: conditioning vector size.
        hidden: hidden layer width.
        output_scale: predictions are squashed to ``output_scale * tanh``
            (keeps early training in the well-behaved parameter region).
    """

    def __init__(self, processors, feature_dim=64, hidden=128, output_scale=2.0):
        self.feature_dim = feature_dim
        self.hidden = hidden
        self.output_scale = output_scale
        self.specs = {}
        for t, proc in processors.items():
            leaves = []

            def collect(prefix, shapes):
                for k, v in shapes.items():
                    if isinstance(v, dict):
                        collect(prefix + (k,), v)
                    else:
                        leaves.append((prefix + (k,), _int_to_tuple(v)))

            collect((), proc.parameter_size())
            self.specs[t] = leaves

    def init(self, key):
        """Initialize MLP weights: type -> {w1, b1, w2, b2}."""
        params = {}
        for t, leaves in self.specs.items():
            out_dim = sum(int(np.prod(s)) for _, s in leaves)
            key, k1, k2 = jax.random.split(key, 3)
            params[t] = {
                "w1": jax.random.normal(k1, (self.feature_dim, self.hidden))
                / np.sqrt(self.feature_dim),
                "b1": jnp.zeros((self.hidden,)),
                "w2": jax.random.normal(k2, (self.hidden, out_dim))
                / np.sqrt(self.hidden),
                "b2": jnp.zeros((out_dim,)),
            }
        return params

    def apply(self, params, features_per_type):
        """Predict the full per-type parameter pytree.

        Args:
            params: weights from :meth:`init`.
            features_per_type: type -> ``(num_nodes_of_type, feature_dim)``
                conditioning vectors (one row per node, in parameter-row
                order).

        Returns:
            Nested dict pytree compatible with ``render_grafx``.
        """
        out = {}
        for t, leaves in self.specs.items():
            w = params[t]
            h = jnp.tanh(features_per_type[t] @ w["w1"] + w["b1"])
            flat = self.output_scale * jnp.tanh(h @ w["w2"] + w["b2"])
            result = {}
            offset = 0
            for path, shape in leaves:
                size = int(np.prod(shape))
                piece = flat[:, offset : offset + size].reshape(
                    (flat.shape[0],) + shape
                )
                node = result
                for k in path[:-1]:
                    node = node.setdefault(k, {})
                node[path[-1]] = piece
                offset += size
            out[t] = result
        return out

"""Model factory and optimizer-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.models import (
    GraphParameterOptimizer,
    mastering_chain,
    mixing_console,
    simple_chain,
)
from grafx_tpu.ops.losses import mse_loss, multi_resolution_stft_loss


def test_factories_build():
    for G, processors in [
        simple_chain(),
        mixing_console(num_tracks=3, ir_len=2000),
        mastering_chain(),
    ]:
        assert G.number_of_nodes() > 2
        for t in processors:
            assert t in G.config.node_types


def test_optimizer_fits_gain():
    G, processors = simple_chain(chain=("gain",))
    opt = GraphParameterOptimizer(
        G, processors, loss_fn=mse_loss, key=jax.random.PRNGKey(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2**10))
    target = 0.5 * x
    history = opt.fit(x, target, num_steps=200)
    assert history[-1] < history[0] * 1e-2
    learned = np.exp(np.asarray(opt.params["gain"]["log_gain"]))
    np.testing.assert_allclose(learned, 0.5, rtol=0.05)


def test_mrstft_loss_sane():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 2**12))
    zero_loss = multi_resolution_stft_loss(x, x)
    nonzero_loss = multi_resolution_stft_loss(x, 0.3 * x)
    assert float(zero_loss) < 1e-5
    assert float(nonzero_loss) > float(zero_loss)

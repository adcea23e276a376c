"""Processor sanity harness.

Mirrors the reference's ``_test_single_processor``
(reference: tests/processors/utils.py:55-96): random parameters
(sigma=1e-2) + random input, asserting output shape / dtype / finiteness
— plus a gradient-flow check (every parameter receives a finite grad),
which the reference leaves to autograd.
"""

import jax
import jax.numpy as jnp

from grafx_tpu.utils import create_empty_parameters_from_shape_dict


def random_parameters(processor, batch_size, key, std=1e-2):
    shapes = processor.parameter_size()
    return create_empty_parameters_from_shape_dict(
        shapes, batch_size, key, std=std, root=False
    )


def _test_single_processor(
    processor,
    batch_size=4,
    num_channels=2,
    audio_len=2**13,
    std=1e-2,
    key=None,
    check_grad=True,
):
    key = jax.random.PRNGKey(0) if key is None else key
    k_param, k_sig = jax.random.split(key)
    parameters = random_parameters(processor, batch_size, k_param, std=std)
    input_signals = jax.random.normal(
        k_sig, (batch_size, num_channels, audio_len)
    )

    output = processor(input_signals, **parameters)
    if isinstance(output, tuple):
        output_signals, intermediates = output
        assert isinstance(intermediates, dict)
    else:
        output_signals = output

    assert output_signals.ndim == 3
    assert output_signals.shape[0] == batch_size
    assert output_signals.shape[-1] == audio_len
    assert output_signals.dtype == jnp.float32
    assert jnp.isfinite(output_signals).all(), "non-finite output"

    if check_grad and parameters:

        def loss_fn(p):
            out = processor(input_signals, **p)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean(jnp.square(out))

        grads = jax.grad(loss_fn)(parameters)
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            assert jnp.isfinite(g).all(), f"non-finite grad at {path}"

    return output_signals

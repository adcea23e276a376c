"""Utility functions: type counting, parameter init, tensor permutation.

Behavioral parity with the reference utils
(reference: src/grafx/utils.py:8-174), re-expressed for JAX: parameters
are plain nested-dict pytrees of ``jnp`` arrays (no ``nn.ParameterDict``),
initialized from an explicit ``jax.random`` key.
"""

import jax
import jax.numpy as jnp
import numpy as np


def get_node_ids_from_type(G, node_type):
    """Node ids of a specific type (reference: utils.py:8-26)."""
    return [i for i, d in G.nodes(data=True) if d["node_type"] == node_type]


def count_nodes_per_type(G, types_to_count=None):
    """Count nodes per type (reference: utils.py:28-57)."""
    if types_to_count is not None:
        counts = {k: 0 for k in types_to_count}
    elif G.config is not None:
        counts = {k: 0 for k in G.config.node_types}
    else:
        counts = {}
    for _, data in G.nodes(data=True):
        node_type = data["node_type"]
        if types_to_count is not None:
            if node_type in types_to_count:
                counts[node_type] += 1
        else:
            counts[node_type] = 1 + counts.get(node_type, 0)
    return counts


def _int_to_tuple(x):
    if isinstance(x, int):
        return (x,)
    if isinstance(x, tuple):
        return x
    raise TypeError(f"Parameter shape with type {type(x)} is not supported")


def create_empty_parameters_from_shape_dict(
    parameter_shapes, num_nodes, key, std=1e-2, root=True, dtype=jnp.float32
):
    """Build a nested parameter pytree from a shape spec
    (reference: utils.py:90-131).  Leaves are ``N(0, std^2)`` arrays with a
    leading node-batch dim of ``num_nodes``."""
    if isinstance(parameter_shapes, dict):
        keys = jax.random.split(key, max(len(parameter_shapes), 1))
        return {
            k: create_empty_parameters_from_shape_dict(
                v, num_nodes, keys[i], std=std, root=False, dtype=dtype
            )
            for i, (k, v) in enumerate(parameter_shapes.items())
        }
    shape = (num_nodes,) + _int_to_tuple(parameter_shapes)
    parameter = std * jax.random.normal(key, shape, dtype=dtype)
    if root:
        return {"parameter": parameter}
    return parameter


def create_empty_parameters(processors, G, std=1e-2, key=None, dtype=jnp.float32):
    """Initialize a full per-type parameter pytree for a graph
    (reference: utils.py:60-87).

    Args:
        processors: dict mapping node type to processor (each must expose
            ``parameter_size()``).
        G: the graph (used to count nodes per type).
        std: init standard deviation.
        key: ``jax.random`` key (default: ``PRNGKey(0)``).

    Returns:
        Nested dict pytree: type -> name -> array ``(num_nodes, *shape)``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    counts = count_nodes_per_type(G, list(processors))
    out = {}
    keys = jax.random.split(key, max(len(processors), 1))
    for i, processor_type in enumerate(processors):
        shapes = processors[processor_type].parameter_size()
        out[processor_type] = create_empty_parameters_from_shape_dict(
            shapes, counts[processor_type], keys[i], std=std, dtype=dtype
        )
    return out


def permute_grafx_tensor(
    G_t,
    node_id,
    node_attrs=("node_types", "rendering_orders"),
    id_attrs=("edge_indices",),
):
    """Permute node/edge attributes by a node-id permutation
    (reference: utils.py:134-174).

    ``node_id[i]`` is the new id of the node currently at position ``i``.
    """
    node_id = np.asarray(node_id)
    inverse = np.empty_like(node_id)
    inverse[node_id] = np.arange(len(node_id))

    new_dict = {}
    for k, v in G_t.__dict__.items():
        if v is None:
            new_dict[k] = None
        elif k in node_attrs:
            new_dict[k] = np.asarray(v)[inverse]
        elif k in id_attrs:
            new_dict[k] = node_id[np.asarray(v)]
        else:
            new_dict[k] = v
    return type(G_t)(**new_dict)


def enable_compilation_cache(directory="~/.cache/grafx_tpu_xla", min_compile_secs=1.0):
    """Enable JAX's persistent compilation cache.

    Large graph programs compile in minutes; with the cache, repeat runs
    of the same (plan, shapes) load the compiled executable from disk
    (measured 136.8 s -> 10.0 s for a representative program on the
    tunneled TPU).  Call once before building render functions.
    """
    import os

    directory = os.path.expanduser(directory)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)

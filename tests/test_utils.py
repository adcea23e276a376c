"""Utility-function tests (reference: src/grafx/utils.py)."""

import jax
import numpy as np

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.utils import (
    count_nodes_per_type,
    create_empty_parameters,
    get_node_ids_from_type,
    permute_grafx_tensor,
)


def _graph():
    config = NodeConfigs(["eq", "comp"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "eq", "comp", "eq", "out"])
    return G


def test_get_node_ids_from_type():
    G = _graph()
    assert get_node_ids_from_type(G, "eq") == [1, 3]
    assert get_node_ids_from_type(G, "out") == [4]


def test_count_nodes_per_type():
    G = _graph()
    counts = count_nodes_per_type(G)
    assert counts["eq"] == 2 and counts["comp"] == 1
    assert counts["mix"] == 0  # config types with zero nodes included
    only = count_nodes_per_type(G, ["eq"])
    assert only == {"eq": 2}


def test_create_empty_parameters_nested():
    class P:
        def parameter_size(self):
            return {"a": 3, "nested": {"b": (2, 4)}}

    G = _graph()

    class EQ(P):
        pass

    params = create_empty_parameters({"eq": EQ()}, G, key=jax.random.PRNGKey(0))
    assert params["eq"]["a"].shape == (2, 3)
    assert params["eq"]["nested"]["b"].shape == (2, 2, 4)
    # sigma = 1e-2 init
    assert float(abs(params["eq"]["a"]).max()) < 0.1


def test_permute_grafx_tensor_roundtrip():
    G = _graph()
    G_t = convert_to_tensor(G)
    n = G_t.num_nodes
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    G_p = permute_grafx_tensor(G_t, perm)
    # permuting back with the inverse restores the original
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    G_r = permute_grafx_tensor(G_p, inv)
    np.testing.assert_array_equal(G_r.node_types, G_t.node_types)
    np.testing.assert_array_equal(
        np.sort(G_r.edge_indices, axis=1), np.sort(G_t.edge_indices, axis=1)
    )
    # edges still reference the same node types after permutation
    types_by_edge_orig = G_t.node_types[G_t.edge_indices]
    types_by_edge_perm = G_p.node_types[G_p.edge_indices]
    np.testing.assert_array_equal(
        np.sort(types_by_edge_orig, axis=1).ravel(),
        np.sort(types_by_edge_perm, axis=1).ravel(),
    )

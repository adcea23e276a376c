"""Checkpoint / resume tests (new subsystem; the reference has none —
SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.checkpoint import (
    graph_from_json,
    graph_to_json,
    load_session,
    save_session,
)
from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import StereoGain
from grafx_tpu.utils import create_empty_parameters


def _graph():
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "gain", "gain", "out"])
    return G


def test_graph_json_roundtrip():
    G = _graph()
    s = graph_to_json(G)
    G2 = graph_from_json(s)
    assert G2.number_of_nodes() == G.number_of_nodes()
    assert G2.number_of_edges() == G.number_of_edges()
    t1, t2 = convert_to_tensor(G), convert_to_tensor(G2)
    np.testing.assert_array_equal(t1.node_types, t2.node_types)
    np.testing.assert_array_equal(t1.edge_indices, t2.edge_indices)


def test_session_roundtrip(tmp_path):
    G = _graph()
    processors = {"gain": StereoGain()}
    params = create_empty_parameters(processors, G, key=jax.random.PRNGKey(7))
    save_session(str(tmp_path / "sess"), G, params, metadata={"step": 42})
    G2, params2, meta = load_session(str(tmp_path / "sess"))
    assert meta["step"] == 42
    assert G2.number_of_nodes() == G.number_of_nodes()
    np.testing.assert_allclose(
        np.asarray(params["gain"]["log_gain"]),
        np.asarray(params2["gain"]["log_gain"]),
    )

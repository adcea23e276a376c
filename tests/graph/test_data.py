"""Graph data layer tests.

Mirrors the reference's graph-layer unit tests
(reference: tests/graph/test_graph.py, test_data_configs.py,
test_data_graph_with_configs.py).
"""

import numpy as np
import pytest

from grafx_tpu.data import (
    GRAFX,
    NodeConfigs,
    batch_grafx,
    convert_to_tensor,
)


def test_node_configs_list():
    config = NodeConfigs(["eq", "compressor"])
    # utility types auto-injected first
    assert config.node_types[:3] == ["in", "out", "mix"]
    assert config.node_type_to_index["in"] == 0
    assert config.node_type_to_index["out"] == 1
    assert config.siso_only
    assert config.num_inlets["in"] == 0
    assert config.num_outlets["out"] == 0
    assert config.num_inlets["eq"] == 1


def test_node_configs_dict_mimo():
    config = NodeConfigs(
        {
            "crossover": {"inlets": ["main"], "outlets": ["low", "high"]},
            "mixer": {"inlets": ["a", "b"], "outlets": ["main"]},
        }
    )
    assert not config.siso_only
    assert config.max_num_outlets == 2
    assert config.outlet_to_index["crossover"]["high"] == 1
    assert config.inlet_to_index["mixer"]["b"] == 1


def test_graph_add_connect_and_validation():
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config)
    i = G.add("in")
    g = G.add("gain")
    o = G.add("out")
    G.connect(i, g)
    G.connect(g, o)
    assert G.number_of_nodes() == 3
    assert G.number_of_edges() == 2
    assert G.counter == 3

    with pytest.raises(RuntimeError):
        G.add("nonexistent-type")
    with pytest.raises(RuntimeError):
        G.connect(g, g)  # self loop
    with pytest.raises(RuntimeError):
        G.connect(i, g)  # duplicate edge
    with pytest.raises(RuntimeError):
        G.connect(o, g, outlet="main")  # 'out' has no outlets


def test_graph_invalid_op_modes():
    config = NodeConfigs(["gain"])
    G = GRAFX(config=config, invalid_op="mute")
    assert G.add("bogus") is None
    G_warn = GRAFX(config=config, invalid_op="warn")
    with pytest.warns(UserWarning):
        G_warn.add("bogus")


def test_serial_chain_and_remove():
    config = NodeConfigs(["eq", "comp"])
    G = GRAFX(config=config)
    first, last = G.add_serial_chain(["in", "eq", "comp", "out"])
    assert (first, last) == (0, 3)
    assert G.number_of_edges() == 3
    incoming, outgoing = G.remove(1)
    assert len(incoming) == 1 and len(outgoing) == 1
    assert not G.consecutive_ids


def test_convert_to_tensor_siso():
    config = NodeConfigs(["eq"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "eq", "out"])
    G_t = convert_to_tensor(G)
    assert G_t.num_nodes == 3
    assert G_t.num_edges == 2
    np.testing.assert_array_equal(G_t.node_types, [0, 3, 1])
    np.testing.assert_array_equal(G_t.edge_indices, [[0, 1], [1, 2]])
    assert G_t.edge_types is None


def test_convert_to_tensor_mimo_edge_types():
    config = NodeConfigs(
        {"split": {"inlets": ["main"], "outlets": ["low", "high"]}}
    )
    G = GRAFX(config=config)
    i = G.add("in")
    s = G.add("split")
    m = G.add("mix")
    o = G.add("out")
    G.connect(i, s)
    G.connect(s, m, outlet="low")
    G.connect(s, m, outlet="high")
    G.connect(m, o)
    G_t = convert_to_tensor(G)
    assert G_t.edge_types is not None
    assert G_t.edge_types.shape == (4, 2)
    # the two split->mix edges carry outlet ids 0 and 1
    split_edges = G_t.edge_types[
        (G_t.edge_indices[0] == s) & (G_t.edge_indices[1] == m)
    ]
    assert sorted(split_edges[:, 0].tolist()) == [0, 1]


def test_batch_grafx():
    config = NodeConfigs(["eq"])
    graphs = []
    for _ in range(3):
        G = GRAFX(config=config)
        G.add_serial_chain(["in", "eq", "out"])
        graphs.append(G)
    GB = batch_grafx(graphs)
    assert GB.batch
    assert GB.number_of_nodes() == 9
    assert GB.counter == [3, 6, 9]
    # disconnected union: no cross-graph edges
    assert GB.number_of_edges() == 6

    with pytest.raises(ValueError):
        batch_grafx([GB])


def test_relabeling_after_remove():
    config = NodeConfigs(["eq"])
    G = GRAFX(config=config)
    G.add_serial_chain(["in", "eq", "eq", "out"])
    G.remove(1)
    G.connect(0, 2)
    G_t = convert_to_tensor(G)
    assert G_t.num_nodes == 3
    assert G_t.node_types.max() < len(config.node_types)

"""Scheduler tests: schedule validity properties on random graphs.

The reference has no dedicated scheduler unit tests; we assert the
documented invariants (reference: sphinx-doc/source/introduction/
render.rst:30-46): the stage sequence is a partition of V, causal, and
type-homogeneous, with V_0 = all "in" and V_N = all "out".
"""

import numpy as np
import pytest

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.render.order import (
    compute_render_order,
    reorder_for_fast_render,
)


def random_dag(rng, num_chains=4, chain_len=4, types=("eq", "comp", "rev")):
    """Mixing-console-style graph: per-chain serial processors, summed
    into a shared mix -> out."""
    config = NodeConfigs(list(types))
    G = GRAFX(config=config)
    mix = None
    ends = []
    for _ in range(num_chains):
        chain = ["in"] + [
            str(rng.choice(types)) for _ in range(int(rng.integers(1, chain_len)))
        ]
        _, last = G.add_serial_chain(chain)
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)
    return G


def check_schedule(G_t, type_sequence, render_order):
    N = G_t.num_nodes
    T = np.asarray(G_t.node_types)
    render_order = np.asarray(render_order)
    # partition: every node got exactly one stage
    assert (render_order >= 0).all()
    max_order = render_order.max()
    # type homogeneity: all nodes in a stage share the stage's type
    for i in range(max_order + 1):
        nodes = np.where(render_order == i)[0]
        if len(nodes):
            assert (T[nodes] == type_sequence[i]).all()
    # V_0 == all "in", V_N == all "out"
    assert set(np.where(render_order == 0)[0]) == set(np.where(T == 0)[0])
    assert set(np.where(render_order == max_order)[0]) == set(
        np.where(T == 1)[0]
    )
    # causality: every edge goes strictly forward in stage order
    E = np.asarray(G_t.edge_indices)
    assert (render_order[E[0]] < render_order[E[1]]).all()


@pytest.mark.parametrize("method", ["greedy", "beam", "one-by-one"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_schedule_validity(method, seed):
    rng = np.random.default_rng(seed)
    G = random_dag(rng)
    G_t = convert_to_tensor(G)
    type_sequence, render_order = compute_render_order(G_t, method=method)
    check_schedule(G_t, type_sequence, render_order)


def test_beam_compresses_stages():
    # 4 chains x (eq -> comp): beam should schedule all eqs together and
    # all comps together: stages = in, eq, comp, mix, out = 5
    config = NodeConfigs(["eq", "comp"])
    G = GRAFX(config=config)
    ends = []
    for _ in range(4):
        _, last = G.add_serial_chain(["in", "eq", "comp"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    out = G.add("out")
    G.connect(mix, out)

    G_t = convert_to_tensor(G)
    type_sequence, render_order = compute_render_order(G_t, method="beam")
    assert len(type_sequence) == 5
    assert np.asarray(render_order).max() == 4


def test_one_by_one_is_serial():
    config = NodeConfigs(["eq"])
    G = GRAFX(config=config)
    for _ in range(3):
        G.add_serial_chain(["in", "eq", "out"])
    G_t = convert_to_tensor(G)
    type_sequence, render_order = compute_render_order(G_t, method="one-by-one")
    # stage 0 = all ins together; then one node per stage
    orders = np.asarray(render_order)
    for i in range(1, orders.max() + 1):
        assert (orders == i).sum() == 1


def test_fixed_order():
    config = NodeConfigs(["eq", "comp"])
    G = GRAFX(config=config)
    _, last = G.add_serial_chain(["in", "eq", "comp"])
    out = G.add("out")
    G.connect(last, out)
    G_t = convert_to_tensor(G)
    eq_idx = config.node_type_to_index["eq"]
    comp_idx = config.node_type_to_index["comp"]
    type_sequence, render_order = compute_render_order(
        G_t, method="fixed", fixed_order=[0, eq_idx, comp_idx, 1]
    )
    check_schedule(G_t, type_sequence, render_order)


def test_reorder_for_fast_render_contiguous():
    rng = np.random.default_rng(3)
    G = random_dag(rng, num_chains=5)
    G_t = convert_to_tensor(G)
    G_t = reorder_for_fast_render(G_t, method="beam")
    orders = np.asarray(G_t.rendering_orders)
    # same-(order) nodes have contiguous ids after the permutation
    for i in range(orders.max() + 1):
        idxs = np.where(orders == i)[0]
        assert (np.diff(idxs) == 1).all() or len(idxs) <= 1
    # stage ids increase monotonically with node id
    assert (np.diff(orders) >= 0).all()
    check_schedule(
        G_t,
        [G_t.config.node_type_to_index[t] for t in G_t.type_sequence],
        orders,
    )


def test_native_beam_matches_numpy():
    """The C++ beam search must produce the same schedule as the numpy
    implementation on random graphs."""
    from grafx_tpu._native import beam_search_native, native_available
    from grafx_tpu.render.order.tensor import beam_search

    if not native_available():
        pytest.skip("native scheduler unavailable (no compiler)")

    for seed in range(5):
        rng = np.random.default_rng(seed)
        G = random_dag(rng, num_chains=5, chain_len=5)
        G_t = convert_to_tensor(G)
        seq_native, order_native = beam_search_native(
            np.asarray(G_t.node_types), np.asarray(G_t.edge_indices), width=8
        )
        seq_np, order_np = beam_search(G_t, width=8, use_native=False)
        check_schedule(G_t, seq_native, order_native)
        # same stage count (both are optimal-width searches with the same
        # scoring; tie-breaking may differ, so compare lengths)
        assert len(seq_native) == len(seq_np)


def test_native_beam_large_graph_fast():
    from grafx_tpu._native import beam_search_native, native_available

    if not native_available():
        pytest.skip("native scheduler unavailable")
    import time

    rng = np.random.default_rng(0)
    G = random_dag(rng, num_chains=100, chain_len=8)
    G_t = convert_to_tensor(G)
    t0 = time.time()
    seq, order = beam_search_native(
        np.asarray(G_t.node_types), np.asarray(G_t.edge_indices), width=16
    )
    dt = time.time() - t0
    check_schedule(G_t, seq, order)
    assert dt < 2.0, f"native beam too slow: {dt:.2f}s"


def test_native_beam_rejects_cycle():
    from grafx_tpu._native import beam_search_native, native_available

    if not native_available():
        pytest.skip("native scheduler unavailable")
    config = NodeConfigs(["a"])
    G = GRAFX(config=config, invalid_op="mute")
    i = G.add("in"); x = G.add("a"); y = G.add("a"); o = G.add("out")
    G.connect(i, x); G.connect(x, y); G.connect(y, x); G.connect(y, o)
    G_t = convert_to_tensor(G)
    assert beam_search_native(
        np.asarray(G_t.node_types), np.asarray(G_t.edge_indices)
    ) is None

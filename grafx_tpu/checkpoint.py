"""Checkpoint / resume utilities.

The reference has no checkpointing subsystem (SURVEY.md §5): parameters
are plain ``nn.ParameterDict``s saved with ``torch.save`` and graphs are
pickled downstream.  Here we provide the equivalent, TPU-native:
parameters are jnp pytrees saved with **orbax** (async-capable,
sharding-aware), and graphs serialize via pickle (full fidelity) or a
JSON node-link form (portable).
"""

import json
import os
import pickle

import jax
import numpy as np


def save_parameters(path, params):
    """Save a parameter pytree with orbax (directory checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_parameters(path, like=None):
    """Load a parameter pytree saved by :func:`save_parameters`.

    Args:
        like: optional pytree of arrays (or ShapeDtypeStructs) used to
            restore with matching structure/sharding.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, item=target)


def save_graph(path, G):
    """Pickle a :class:`GRAFX` graph (nodes, edges, graph attrs)."""
    with open(path, "wb") as f:
        pickle.dump(G, f)


def load_graph(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def graph_to_json(G):
    """Portable JSON node-link form (config is reduced to its
    node-type dict; rebuild a NodeConfigs from it on load)."""
    config = G.graph.get("config")
    return json.dumps(
        {
            "nodes": [
                {"id": i, **{k: v for k, v in d.items() if _is_jsonable(v)}}
                for i, d in G.nodes(data=True)
            ],
            "edges": [
                {"source": s, "dest": t, **d} for s, t, d in G.edges(data=True)
            ],
            "graph": {
                k: v
                for k, v in G.graph.items()
                if k != "config" and _is_jsonable(v)
            },
            "config": None if config is None else config.node_type_dict,
        }
    )


def graph_from_json(s):
    from grafx_tpu.data.configs import NodeConfigs
    from grafx_tpu.data.graph import GRAFX

    data = json.loads(s)
    config = None
    if data["config"] is not None:
        # strip the auto-injected utility types; NodeConfigs re-adds them
        user_cfg = {
            k: v
            for k, v in data["config"].items()
            if k not in ("in", "out", "mix")
        }
        config = NodeConfigs(user_cfg if user_cfg else list(user_cfg))
    G = GRAFX(config=config)
    for node in data["nodes"]:
        node = dict(node)
        node_id = node.pop("id")
        G.add_node(node_id, **node)
    for edge in data["edges"]:
        edge = dict(edge)
        s_, t_ = edge.pop("source"), edge.pop("dest")
        G.add_edge(s_, t_, **edge)
    for k, v in data["graph"].items():
        G.graph[k] = v
    return G


def _is_jsonable(v):
    return isinstance(v, (str, int, float, bool, list, dict, type(None)))


def save_session(directory, G, params, metadata=None):
    """Save a full optimization session: graph + parameters + metadata."""
    os.makedirs(directory, exist_ok=True)
    save_graph(os.path.join(directory, "graph.pkl"), G)
    save_parameters(os.path.join(directory, "params"), params)
    if metadata is not None:
        with open(os.path.join(directory, "metadata.json"), "w") as f:
            json.dump(metadata, f)


def load_session(directory, like=None):
    """Load a session saved by :func:`save_session`.

    Returns:
        ``(G, params, metadata)``.
    """
    G = load_graph(os.path.join(directory, "graph.pkl"))
    params = load_parameters(os.path.join(directory, "params"), like=like)
    meta_path = os.path.join(directory, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return G, params, metadata

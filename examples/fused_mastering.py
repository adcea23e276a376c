"""LTI-chain fusion demo: a mastering-style graph, fused vs unfused.

Seventeen parallel mastering chains (low-shelf -> peaking -> high-shelf
-> low-pass -> gain) are rewritten by the opt-in graph-compiler pass
``fuse_serial_lti`` (render/fuse.py): each chain's four serial
exact-cascade filters fold into ONE longer biquad cascade, collapsing
four blocked applies (zero-state pass + state scan + kernel build each)
into one.  The demo verifies output parity between the two graphs, then
times a full gradient step on each (BASELINE.md config 6: 10.7 -> 5.6
ms/step on the TPU).

Run:  python examples/fused_mastering.py [--audio-len 131072]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
from grafx_tpu.processors import (
    HighShelf,
    LowPassFilter,
    LowShelf,
    PeakingFilter,
    StereoGain,
)
from grafx_tpu.render import (
    fuse_serial_lti,
    make_render_fn,
    prepare_render,
    reorder_for_fast_render,
)
from grafx_tpu.utils import create_empty_parameters, enable_compilation_cache

NUM_CHAINS = 17


def build():
    procs = {
        "ls": LowShelf(backend="exact"),
        "pk": PeakingFilter(backend="exact"),
        "hs": HighShelf(backend="exact"),
        "lp": LowPassFilter(backend="exact"),
        "gain": StereoGain(),
    }
    G = GRAFX(config=NodeConfigs(list(procs)))
    ends = []
    for _ in range(NUM_CHAINS):
        _, last = G.add_serial_chain(["in", "ls", "pk", "hs", "lp", "gain"])
        ends.append(last)
    mix = G.add("mix")
    for e in ends:
        G.connect(e, mix)
    G.connect(mix, G.add("out"))
    return G, procs


def prepare(G, procs, audio_len, batch):
    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    params = jax.tree.map(lambda v: v + 0.1, params)
    render = make_render_fn(procs, plan)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, NUM_CHAINS, 2, audio_len)
    )

    @jax.jit
    def step(p):
        def loss(p):
            out, _, _ = render(x, p)
            return jnp.mean(out**2)

        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree.map(lambda w, gg: w - 1e-3 * gg, p, g)

    return render, step, params, x


def time_step(step, params, iters=20):
    l, params = step(params)
    jax.block_until_ready(params)
    t0 = time.time()
    for _ in range(iters):
        l, params = step(params)
    jax.block_until_ready(params)
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-len", type=int, default=2**17)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")

    G, procs = build()
    G2, procs2 = fuse_serial_lti(G, procs)
    fused_types = sorted(t for t in procs2 if t.startswith("fused("))
    print(
        f"graph: {G.number_of_nodes()} nodes -> {G2.number_of_nodes()}"
        f" after fusion; composite types: {fused_types}"
    )

    render_u, step_u, params_u, x = prepare(G, procs, args.audio_len, args.batch)
    render_f, step_f, _, _ = prepare(G2, procs2, args.audio_len, args.batch)

    # map the unfused per-type params into the fused nesting for parity
    fused_name = fused_types[0]
    members = procs2[fused_name].members
    params_f = {
        fused_name: {n: params_u[n.split("_", 1)[1]] for n, _ in members}
    }
    for t in procs2:
        if not t.startswith("fused(") and t in params_u:
            params_f[t] = params_u[t]

    y_u, _, _ = render_u(x, params_u)
    y_f, _, _ = render_f(x, params_f)
    rel = float(jnp.max(jnp.abs(y_f - y_u)) / (jnp.max(jnp.abs(y_u)) + 1e-9))
    print(f"fused-vs-unfused output relative error: {rel:.2e}")
    assert rel < 1e-4

    ms_u = time_step(step_u, params_u)
    ms_f = time_step(step_f, params_f)
    print(f"unfused grad step: {ms_u:.2f} ms")
    print(f"fused grad step:   {ms_f:.2f} ms  ({ms_u / ms_f:.2f}x)")


if __name__ == "__main__":
    main()

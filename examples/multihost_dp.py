"""Multi-host data-parallel training demonstration (2 processes x 4
virtual CPU devices), runnable on one box.

The reference is single-device (SURVEY.md §5); grafx-tpu's scale-out
story is SPMD over a mesh (grafx_tpu.parallel).  Beyond one host, the
same program runs across hosts with ``jax.distributed``: each process
holds its local shard of the graph batch, parameters replicate, and the
gradient mean rides the cross-host network (DCN on TPU pods, gloo/gRPC
in this CPU demonstration).

This script is BOTH the launcher and the worker:

    python examples/multihost_dp.py            # spawns 2 worker processes

Each worker:
  1. ``jax.distributed.initialize`` against a local coordinator,
  2. builds a small mixing console and a data-parallel mesh over all 8
     global devices (4 per process),
  3. assembles the globally-sharded batch from process-local data
     (``jax.make_array_from_process_local_data``),
  4. runs jitted grad steps; XLA inserts the cross-process psum,
  5. process 0 checks the resulting (replicated) gradients/params match
     a single-process run of the identical workload to float tolerance.

What this does and does not verify (honest scope): it verifies the full
jax.distributed program construction — multi-process mesh, local-shard
assembly, cross-process gradient reduction, replicated update — and
numerical parity with single-process training on CPU.  It cannot verify
TPU-pod DCN performance from this single-chip box; on a pod the same
code runs with the TPU backend and per-host local devices.
"""

import os
import subprocess
import sys

PORT = 12377
NUM_PROCESSES = 2
LOCAL_DEVICES = 4
BATCH_PER_PROC = 2


def worker(process_id):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{PORT}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from grafx_tpu.data import GRAFX, NodeConfigs, convert_to_tensor
    from grafx_tpu.parallel import make_mesh, replicated
    from grafx_tpu.processors import Compressor, ParametricEqualizer, StereoGain
    from grafx_tpu.render import make_render_fn, prepare_render, reorder_for_fast_render
    from grafx_tpu.utils import create_empty_parameters

    assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    # -- a small console ------------------------------------------------
    procs = {
        "eq": ParametricEqualizer(num_filters=4, backend="exact"),
        "comp": Compressor(energy_smoother="ballistics"),
        "gain": StereoGain(),
    }
    G = GRAFX(config=NodeConfigs(sorted(procs)))
    ends = [G.add_serial_chain(["in", "eq", "comp", "gain"])[1] for _ in range(4)]
    mix = G.add("mix")
    [G.connect(e, mix) for e in ends]
    out = G.add("out")
    G.connect(mix, out)

    G_t = reorder_for_fast_render(convert_to_tensor(G), method="beam")
    plan = prepare_render(G_t)
    params = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
    render = make_render_fn(procs, plan, jit=False)

    # -- global batch from process-local shards -------------------------
    L = 2**13
    B_global = NUM_PROCESSES * BATCH_PER_PROC * 2  # 2 graphs per device
    # every process can regenerate the full deterministic batch; each
    # keeps only its local rows (as a real data loader would)
    x_full = jax.random.normal(jax.random.PRNGKey(1), (B_global, 4, 2, L))
    rows = B_global // NUM_PROCESSES
    x_local = x_full[process_id * rows : (process_id + 1) * rows]

    mesh = make_mesh(axis_name="batch")
    x_global = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("batch")), np.asarray(x_local), x_full.shape
    )
    params = jax.device_put(params, replicated(mesh))

    @jax.jit
    def step(p, x):
        def loss_fn(p):
            y, _, _ = render(x, p)
            return jnp.mean(y**2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        return loss, jax.tree.map(lambda w, gg: w - 1e-2 * gg, p, g)

    loss = None
    for _ in range(3):
        loss, params = step(params, x_global)
    loss = float(loss)

    if process_id == 0:
        # single-process oracle on the identical full batch
        @jax.jit
        def step_local(p, x):
            def loss_fn(p):
                y, _, _ = render(x, p)
                return jnp.mean(y**2)

            loss, g = jax.value_and_grad(loss_fn)(p)
            return loss, jax.tree.map(lambda w, gg: w - 1e-2 * gg, p, g)

        p_ref = create_empty_parameters(procs, G, key=jax.random.PRNGKey(0))
        loss_ref = None
        for _ in range(3):
            loss_ref, p_ref = step_local(p_ref, x_full)
        loss_ref = float(loss_ref)

        rel = abs(loss - loss_ref) / (abs(loss_ref) + 1e-12)
        p_err = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p_ref))
        )
        print(
            f"[multihost] loss distributed {loss:.6f} vs single-process"
            f" {loss_ref:.6f} (rel {rel:.2e}); max param diff {p_err:.2e}",
            flush=True,
        )
        assert rel < 1e-5 and p_err < 1e-5
        print("[multihost] OK: 2-process data-parallel step matches", flush=True)

    jax.distributed.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        return worker(int(sys.argv[2]))
    ps = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)]
        )
        for i in range(NUM_PROCESSES)
    ]
    codes = [p.wait() for p in ps]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print("multihost_dp: all workers green")


if __name__ == "__main__":
    main()

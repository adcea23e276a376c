"""Batch sweep of the headline bench under the interleaved protocol.

Re-points the graph-batch sweep at the current kernels (VERDICT r4 #6):
runs ``BENCH_BATCH=N python bench.py`` for each batch in the sweep,
interleaved across rounds so tunnel drift cannot bias one batch, and
reports per-batch wall medians (with spread) plus the drift-immune
device time (bit-stable across runs — BASELINE.md r5).

Usage:  python benchmarks/batch_sweep.py [rounds] [batch ...]
        (default 2 rounds over 1 2 4 8 12 16; batch >12 uses the AOT
        compile path automatically — bench.py BENCH_AOT default)

One TPU process at a time: batches run sequentially.  Raw JSON lines go
to outputs/evidence/batch_sweep/b<N>_r<round>.json (tracked).
"""

import json
import os
import subprocess
import sys

DEFAULT_BATCHES = (1, 2, 4, 8, 12, 16)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batches = (
        tuple(int(a) for a in sys.argv[2:]) if len(sys.argv) > 2
        else DEFAULT_BATCHES
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "outputs", "evidence", "batch_sweep")
    os.makedirs(outdir, exist_ok=True)

    results = {b: [] for b in batches}
    for r in range(rounds):
        for b in batches:
            env = dict(os.environ)
            env["BENCH_BATCH"] = str(b)
            proc = subprocess.run(
                [sys.executable, "bench.py"],
                cwd=repo,
                env=env,
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = None
            for ln in proc.stdout.splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    line = ln
            with open(os.path.join(outdir, f"b{b}_r{r}.json"), "w") as f:
                f.write((line or "") + "\n")
                if proc.returncode != 0:
                    f.write(proc.stderr[-2000:])
            if line is None:
                print(f"[round {r}] batch {b}: FAILED (rc={proc.returncode})",
                      flush=True)
                print(proc.stderr[-500:], flush=True)
                continue
            d = json.loads(line)
            results[b].append(d)
            dev = d.get("device_ms_per_step")
            print(
                f"[round {r}] batch {b}: median {d['step_ms_median']} ms "
                f"[{d['step_ms_min']}, {d['step_ms_max']}]"
                + (f", device {dev} ms" if dev is not None else ""),
                flush=True,
            )

    print("\n| batch | wall median (runs, ms) | wall ms/graph | device ms"
          " (runs) | device ms/graph | a-s/s (best run) |")
    print("|---|---|---|---|---|---|")
    for b in batches:
        rs = results[b]
        if not rs:
            print(f"| {b} | FAILED | | | | |")
            continue
        meds = sorted(d["step_ms_median"] for d in rs)
        mid = meds[len(meds) // 2]
        devs = sorted(
            d["device_ms_per_step"] for d in rs
            if d.get("device_ms_per_step") is not None
        )
        dev_s = ", ".join(f"{d:.2f}" for d in devs) if devs else "-"
        dev_pg = f"{devs[0] / b:.2f}" if devs else "-"
        best_v = max(d["value"] for d in rs)
        print(
            f"| {b} | {', '.join(f'{m:.1f}' for m in meds)} "
            f"| {mid / b:.2f} | {dev_s} | {dev_pg} | {best_v:.0f} |"
        )


if __name__ == "__main__":
    main()

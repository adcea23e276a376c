"""Round-5 batch sweep at the current (fuse+dyn=pad) kernels — VERDICT r4 #6.

Runs ``BENCH_BATCH=N bench.py`` for each batch in PASSES interleaved
passes (batch order repeats each pass) so tunnel drift cannot bias one
point, and reports wall medians AND the bit-stable device ms/step —
the r5 decision metric.  Batch sizes past 12 go through bench.py's AOT
compile path automatically (the eager example-buffer payload trips the
tunnel's HTTP 413 cap — see BASELINE.md "Batch-16 root cause").

Usage:  python benchmarks/batch_sweep.py [passes] [batch ...]
Output: markdown table on stdout + raw bench JSON lines to
outputs/evidence/r5b/batch<N>_p<P>.json (tracked decision evidence).
"""

import json
import os
import subprocess
import sys

BATCHES = [1, 2, 4, 8, 12, 16]


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batches = [int(b) for b in sys.argv[2:]] or BATCHES
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "outputs", "evidence", "r5b")
    os.makedirs(outdir, exist_ok=True)

    results = {b: [] for b in batches}
    for p in range(passes):
        for b in batches:
            env = dict(os.environ)
            env["BENCH_BATCH"] = str(b)
            proc = subprocess.run(
                [sys.executable, "bench.py"],
                cwd=repo,
                env=env,
                capture_output=True,
                text=True,
                timeout=2400,
            )
            line = None
            for ln in proc.stdout.splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    line = ln
            with open(os.path.join(outdir, f"batch{b}_p{p}.json"), "w") as f:
                f.write((line or "") + "\n")
                if proc.returncode != 0:
                    f.write(proc.stderr[-2000:])
            if line is None:
                print(f"[pass {p}] batch {b}: FAILED (rc={proc.returncode})",
                      flush=True)
                print(proc.stderr[-500:], flush=True)
                continue
            d = json.loads(line)
            results[b].append(d)
            dev = d.get("device_ms_per_step")
            print(
                f"[pass {p}] batch {b}: median {d['step_ms_median']} ms "
                f"[{d['step_ms_min']}, {d['step_ms_max']}]"
                + (f", device {dev} ms" if dev is not None else ""),
                flush=True,
            )

    print("\n| batch | wall median (runs, ms) | device ms/step (runs) "
          "| device ms/graph | a-s/s (best run) |")
    print("|---|---|---|---|---|")
    for b in batches:
        rs = results[b]
        if not rs:
            print(f"| {b} | FAILED | | | |")
            continue
        walls = sorted(d["step_ms_median"] for d in rs)
        devs = sorted(
            d["device_ms_per_step"] for d in rs
            if d.get("device_ms_per_step") is not None
        )
        dev_s = ", ".join(f"{d:.2f}" for d in devs) if devs else "-"
        dev_pg = f"{devs[len(devs) // 2] / b:.2f}" if devs else "-"
        best_v = max(d["value"] for d in rs)
        print(
            f"| {b} | {', '.join(f'{w:.1f}' for w in walls)} | {dev_s} "
            f"| {dev_pg} | {best_v:.0f} |"
        )


if __name__ == "__main__":
    main()

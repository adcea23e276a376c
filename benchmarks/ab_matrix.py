"""Interleaved, variance-aware on-chip A/B matrix (VERDICT r3 #1).

Runs bench.py under each arm's env overrides, INTERLEAVED across rounds
(arm order repeats each round) so slow drift in the tunnel cannot bias
one arm.  Each bench.py invocation itself reports a median over 5
measured windows plus min/max; this driver aggregates the per-run
medians and prints a table with median-of-medians and the full spread.

Usage:  python benchmarks/ab_matrix.py [rounds] [arm ...]
        (default 3 rounds over the round-4 build-formulation arms;
        name arms to run a subset/other set, e.g.
        ``python benchmarks/ab_matrix.py 3 default dyn=pad``)

One TPU process at a time: this script runs the arms sequentially.
Output: a markdown table on stdout + raw JSON lines to
outputs/evidence/ab_matrix/<arm>_<round>.json (TRACKED — decision
evidence is committed, VERDICT r4 #3).
"""

import json
import os
import subprocess
import sys

ALL_ARMS = [
    # since r5 the bench default IS fuse=1 + dyn=pad (adjudicated:
    # device 15.43 vs 16.69/16.36 ms — see BASELINE.md r5)
    ("default", {}),
    ("powers=doubling", {"GRAFX_TPU_POWERS": "doubling"}),
    ("toeplitz=gather", {"GRAFX_TPU_TOEPLITZ_BUILD": "gather"}),
    ("cascade=toeplitz", {"GRAFX_TPU_CASCADE_COMPOSE": "toeplitz"}),
    # the pre-r5 arms, for continuity with the r4 matrix
    ("nofuse", {"BENCH_FUSE": "0", "BENCH_FUSE_DYN": "0"}),
    ("fuse=1", {"BENCH_FUSE": "1", "BENCH_FUSE_DYN": "0"}),
    ("dyn=pad", {"BENCH_FUSE": "0", "BENCH_FUSE_DYN": "pad"}),
    ("fuse+dyn=pad", {"BENCH_FUSE": "1", "BENCH_FUSE_DYN": "pad"}),
    # r5: pad, but demote pad-only stages (bus comps) to single walks
    ("dyn=auto", {"BENCH_FUSE": "1", "BENCH_FUSE_DYN": "auto"}),
]
ARMS = ALL_ARMS[:5]


def main():
    global ARMS
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if len(sys.argv) > 2:
        by_name = dict(ALL_ARMS)
        ARMS = [(n, by_name[n]) for n in sys.argv[2:]]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "outputs", "evidence", "ab_matrix")
    os.makedirs(outdir, exist_ok=True)

    results = {name: [] for name, _ in ARMS}
    for r in range(rounds):
        for name, env_over in ARMS:
            env = dict(os.environ)
            env.update(env_over)
            proc = subprocess.run(
                [sys.executable, "bench.py"],
                cwd=repo,
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = None
            for ln in proc.stdout.splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    line = ln
            tag = name.replace("=", "-")
            with open(os.path.join(outdir, f"{tag}_r{r}.json"), "w") as f:
                f.write((line or "") + "\n")
                if proc.returncode != 0:
                    f.write(proc.stderr[-2000:])
            if line is None:
                print(f"[round {r}] {name}: FAILED (rc={proc.returncode})",
                      flush=True)
                print(proc.stderr[-500:], flush=True)
                continue
            d = json.loads(line)
            results[name].append(
                (d["step_ms_median"], d["step_ms_min"], d["step_ms_max"],
                 d.get("device_ms_per_step"))
            )
            dev = d.get("device_ms_per_step")
            print(
                f"[round {r}] {name}: median {d['step_ms_median']} ms "
                f"[{d['step_ms_min']}, {d['step_ms_max']}]"
                + (f", device {dev} ms" if dev is not None else ""),
                flush=True,
            )

    print("\n| arm | median of run-medians (ms) | all run medians | min | max | device ms (runs) |")
    print("|---|---|---|---|---|---|")
    for name, _ in ARMS:
        rs = results[name]
        if not rs:
            print(f"| {name} | FAILED | | | | |")
            continue
        meds = sorted(m for m, _, _, _ in rs)
        mid = meds[len(meds) // 2]
        lo = min(mn for _, mn, _, _ in rs)
        hi = max(mx for _, _, mx, _ in rs)
        devs = [d for _, _, _, d in rs if d is not None]
        dev_s = ", ".join(f"{d:.1f}" for d in sorted(devs)) if devs else "-"
        print(
            f"| {name} | {mid:.1f} | {', '.join(f'{m:.1f}' for m in meds)} "
            f"| {lo:.1f} | {hi:.1f} | {dev_s} |"
        )


if __name__ == "__main__":
    main()

#!/bin/bash
# Sequential on-chip checklist (one TPU process at a time).
# Results land in /root/repo/outputs/postoutage/.
# Order: bench A/Bs FIRST (they decide build defaults), verify gates after
# (bench.py already self-gates exact-IIR dB on-device before measuring).
cd /root/repo
OUT=outputs/postoutage
mkdir -p "$OUT"
run() {  # run NAME -- CMD...
  name=$1; shift; shift
  echo "=== $name : $* ==="
  timeout 1200 "$@" > "$OUT/$name.log" 2>&1
  echo "exit=$? ($name)"
  tail -1 "$OUT/$name.log"
}
# A/B arms test the ALTERNATES against the shipped defaults
# (defaults: TOEPLITZ_BUILD=reshape, POWERS=scan, CASCADE_COMPOSE=fft).
# For a variance-aware interleaved matrix use benchmarks/ab_matrix.py.
run bench_default    -- python bench.py
run bench_toep_gather -- env GRAFX_TPU_TOEPLITZ_BUILD=gather python bench.py
run bench_powers_doubling -- env GRAFX_TPU_POWERS=doubling python bench.py
run bench_batch16 -- env BENCH_BATCH=16 python bench.py
run bench_fused -- env BENCH_FUSE=1 python bench.py
run bench_cascade_toep -- env GRAFX_TPU_CASCADE_COMPOSE=toeplitz python bench.py
run bench_T64  -- env GRAFX_TPU_EXACT_BLOCK_SIZE=64 python bench.py
run bench_T256 -- env GRAFX_TPU_EXACT_BLOCK_SIZE=256 python bench.py
run verify_ballistics -- python benchmarks/verify_ballistics_tpu.py
run verify_conv      -- python benchmarks/verify_conv_tpu.py
run verify_iir       -- python benchmarks/verify_iir_tpu.py
# Repeat default at the end to bound run-to-run noise on the A/B deltas
# (bench.py itself reports median + min/max over 5 windows).
run bench_default2   -- python bench.py
echo CHECKLIST_DONE

#!/bin/bash
# Round-5c unattended on-chip session (one TPU process at a time).
#
# Waits for the tunneled TPU to come back (client init hangs during
# outages — the probe is a tiny jitted program with a hard timeout),
# then runs, sequentially:
#   1. exactness gates (iir / ballistics / conv verify scripts),
#   2. a fresh headline point at the final r5 kernels,
#   3. the interleaved batch sweep (VERDICT r4 #6).
# Results land in outputs/evidence/r5c/ (tracked decision evidence).
cd /root/repo || exit 1
OUT=outputs/evidence/r5c
mkdir -p "$OUT"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())
" > /dev/null 2>&1
}

echo "probing tunnel..."
for i in $(seq 1 120); do   # up to ~4 h of 2-min probes
  if probe; then echo "tunnel up after probe $i"; break; fi
  if [ "$i" = 120 ]; then echo "TUNNEL_NEVER_RETURNED"; exit 2; fi
  sleep 60
done

run() {  # run NAME -- CMD...
  name=$1; shift; shift
  echo "=== $name : $* ==="
  timeout 1800 "$@" > "$OUT/$name.log" 2>&1
  echo "exit=$? ($name)"
  tail -1 "$OUT/$name.log"
}

run verify_iir        -- python benchmarks/verify_iir_tpu.py
run verify_ballistics -- python benchmarks/verify_ballistics_tpu.py
run verify_conv       -- python benchmarks/verify_conv_tpu.py
run bench_headline    -- python bench.py
# Interleaved 2-pass sweep; batch 16 rides bench.py's AOT path.
echo "=== batch_sweep ==="
timeout 7200 python benchmarks/batch_sweep.py 2 > "$OUT/batch_sweep.log" 2>&1
echo "exit=$? (batch_sweep)"
tail -20 "$OUT/batch_sweep.log"
echo R5C_ONCHIP_DONE

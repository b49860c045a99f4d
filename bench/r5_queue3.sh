#!/bin/bash
# Round-5 measurement queue 3: fasync batch retry (min warm), fasync round
# decomposition, fasync at realistic acceptance.
set -u
cd /root/repo

echo "=== qwen3 AR b=1: jnp-attention control (per-call-floor hypothesis) ==="
SSD_BENCH_MODE=ar SSD_BENCH_ARCH=qwen3 SSD_BENCH_PALLAS=0 \
  timeout 3600 python bench.py
echo "=== llama AR b=1: jnp-attention control ==="
SSD_BENCH_MODE=ar SSD_BENCH_PALLAS=0 SSD_BENCH_EXTRA=0 \
  timeout 3600 python bench.py

echo "=== prefill decomposition t=2048 rerun (params-as-arg fix) ==="
timeout 2400 python -m bench.prefill_diag --t 2048 --reps 5
timeout 2400 python -m bench.prefill_diag --t 512 --reps 5

echo "=== fasync_diag b=1 ==="
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 1

echo "=== fasync_diag b=8 ==="
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 8

echo "=== fasync at realistic acceptance (noise 0.2 / 1.0) ==="
SSD_BENCH_MODE=fasync SSD_BENCH_DRAFT_NOISE=0.2 timeout 3600 python bench.py
SSD_BENCH_MODE=fasync SSD_BENCH_DRAFT_NOISE=1.0 timeout 3600 python bench.py

echo "=== EAGLE acceptance refinement (item 2: bracket 0.9/0.6/0.3) ==="
for N in 0.015 0.02 0.04 0.05; do
  echo "--- feagle noise $N ---"
  SSD_BENCH_MODE=feagle SSD_BENCH_DRAFT_NOISE=$N timeout 3600 python bench.py
done
echo "=== async EAGLE at the mid-curve (item 2) ==="
SSD_BENCH_MODE=eagle SSD_BENCH_DRAFT_NOISE=0.03 timeout 3600 python bench.py

echo "=== QUEUE3 DONE ==="

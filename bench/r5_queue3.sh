#!/bin/bash
# Round-5 measurement queue 3: fasync batch retry (min warm), fasync round
# decomposition, fasync at realistic acceptance.
set -u
cd /root/repo

echo "=== fasync b=8 (min warm retry) ==="
SSD_BENCH_MODE=fasync SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 5400 python bench.py

echo "=== fasync_diag b=1 ==="
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 1

echo "=== fasync_diag b=8 ==="
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 8

echo "=== fasync at realistic acceptance (noise 0.2 / 1.0) ==="
SSD_BENCH_MODE=fasync SSD_BENCH_DRAFT_NOISE=0.2 timeout 3600 python bench.py
SSD_BENCH_MODE=fasync SSD_BENCH_DRAFT_NOISE=1.0 timeout 3600 python bench.py

echo "=== QUEUE3 DONE ==="

#!/bin/bash
# Round-5 queue 6: fasync frontier completions (FR-Spec draft vocab + int8
# weights through the fused async superstep).
set -u
cd /root/repo
echo "=== fasync + dv16384 b=1 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_DRAFT_VOCAB=16384 timeout 4800 python bench.py
echo "=== fasync + int8 b=1 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_QUANT=int8 timeout 4800 python bench.py
echo "=== fasync + int8 + dv16384 b=1 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_QUANT=int8 SSD_BENCH_DRAFT_VOCAB=16384 \
  timeout 4800 python bench.py
echo "=== fasync + int8 b=8 (min warm) ==="
SSD_BENCH_MODE=fasync SSD_BENCH_QUANT=int8 SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 5400 python bench.py
echo "=== QUEUE6 DONE ==="

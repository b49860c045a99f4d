#!/bin/bash
# Round-4 follow-up queue: post-fix re-measures + decompositions.
set -u
cd /root/repo

echo "=== sd_diag --eagle (fused EAGLE round decomposition) ==="
timeout 3000 python -m bench.sd_diag --eagle --k 3 --rounds 32 --reps 3

echo "=== feagle + int8 weights (target AND eagle draft quantized) ==="
SSD_BENCH_MODE=feagle SSD_BENCH_QUANT=int8 timeout 4000 python bench.py

echo "=== eagle re-measure with double-warm fix ==="
SSD_BENCH_MODE=eagle timeout 3000 python bench.py 2>&1 | \
  grep -E "Accepted: |Cache Hits|verify time|full step|^\{"

echo "=== ssd b=8 re-measure with double-warm fix ==="
SSD_BENCH_MODE=ssd SSD_BENCH_BATCH=8 timeout 3600 python bench.py 2>&1 | \
  grep -E "Accepted: |Cache Hits|^\{"

echo "=== int8_mxu e2e retry (tunnel error last time) ==="
SSD_BENCH_MODE=ar SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_KV_QUANT=int8_mxu \
  timeout 3000 python bench.py

echo "=== queue2 done ==="

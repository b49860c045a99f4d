#!/bin/bash
# Round-5 queue 8: deep-context fasync rerun after the boundary-clamp fix
# (host-side scheduler change only; no recompiles).
set -u
cd /root/repo
echo "=== fasync deep-context (prompt 1900) b=1 [post-fix] ==="
SSD_BENCH_MODE=fasync SSD_BENCH_PROMPT_LEN=1900 timeout 4800 python bench.py
echo "=== fasync deep-context + int8 KV b=1 [post-fix] ==="
SSD_BENCH_MODE=fasync SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_KV_QUANT=int8 \
  timeout 4800 python bench.py
echo "=== control: fused sync SD deep-context (same hour) ==="
SSD_BENCH_MODE=sd SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_EXTRA=0 \
  timeout 4800 python bench.py
echo "=== QUEUE8 DONE ==="

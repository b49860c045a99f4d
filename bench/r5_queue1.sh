#!/bin/bash
# Round-5 measurement queue 1: the fused-async modes (VERDICT r4 item 1).
# Each block prints its own JSON line + metrics; medians of SSD_BENCH_REPS=3
# at the standard o=128. First compiles populate the persistent XLA cache.
set -u
cd /root/repo

echo "=== fasync (R-round fused async superstep) b=1 ==="
SSD_BENCH_MODE=fasync timeout 5400 python bench.py

echo "=== fasync b=8 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_BATCH=8 timeout 5400 python bench.py

echo "=== ssd + fused exchange (async_exchange_packed) b=1 ==="
SSD_BENCH_MODE=ssd SSD_BENCH_ASYNC_FUSED=1 timeout 5400 python bench.py

echo "=== ssd + fused exchange b=8 ==="
SSD_BENCH_MODE=ssd SSD_BENCH_ASYNC_FUSED=1 SSD_BENCH_BATCH=8 \
  timeout 5400 python bench.py

echo "=== unfused ssd b=1 control (same hour) ==="
SSD_BENCH_MODE=ssd timeout 3600 python bench.py

echo "=== QUEUE1 DONE ==="

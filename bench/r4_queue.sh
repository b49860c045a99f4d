#!/bin/bash
# Round-4 measurement queue (run AFTER the eagle/feagle/ngram series).
# Each block prints its own JSON line + metrics; everything is median-of-3
# (SSD_BENCH_REPS default) at the standard o=128 unless noted.
set -u
cd /root/repo

echo "=== s8 probe (Mosaic int8 dot support) ==="
timeout 1200 python -m bench.s8_probe --iters 200

echo "=== kernel: decode ctx8192 bf16 / int8 / int8_mxu ==="
for KQ in "" int8 int8_mxu; do
  ARGS=""
  [ -n "$KQ" ] && ARGS="--kv-quant $KQ"
  timeout 2400 python -m bench.kernel_bench --impl pallas3 --ctx 8192 \
    --batch 8 --q 1 --heads 32 --kv-heads 8 --hd 64 --block 256 \
    --inloop --iters 400 --reps 3 $ARGS
done

echo "=== e2e int8_mxu long-context (prompt 1900) vs int8 ==="
SSD_BENCH_MODE=ar SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_KV_QUANT=int8_mxu \
  timeout 3000 python bench.py
SSD_BENCH_MODE=ar SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_KV_QUANT=int8 \
  timeout 3000 python bench.py

echo "=== async SSD b=8 median-of-3 (VERDICT item 3) ==="
SSD_BENCH_MODE=ssd SSD_BENCH_BATCH=8 timeout 3600 python bench.py

echo "=== acceptance tail as medians at o=128 (VERDICT item 7) ==="
for N in 0.05 0.2 1.0; do
  SSD_BENCH_MODE=sd SSD_BENCH_DRAFT_NOISE=$N timeout 3000 python bench.py
done

echo "=== K-sweep as medians at o=128 (VERDICT item 7) ==="
for K in 2 8; do
  SSD_BENCH_MODE=sd SSD_BENCH_K=$K timeout 3000 python bench.py
  SSD_BENCH_MODE=sd SSD_BENCH_K=$K SSD_BENCH_DRAFT_NOISE=0.02 \
    timeout 3000 python bench.py
done

echo "=== queue done ==="

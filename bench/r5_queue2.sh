#!/bin/bash
# Round-5 measurement queue 2: prefill roofline (VERDICT item 3), hd-128 gap
# (item 4), EAGLE acceptance curve calibration (item 2), int8 b=8 aggregates
# (item 6).
set -u
cd /root/repo

echo "=== prefill decomposition t=2048 / t=512 (item 3) ==="
timeout 2400 python -m bench.prefill_diag --t 2048 --reps 5
timeout 2400 python -m bench.prefill_diag --t 512 --reps 5

echo "=== hd-128 kernel sweep: block x batch (item 4) ==="
for BLK in 64 128 256; do
  for B in 1 8; do
    timeout 1800 python -m bench.kernel_bench --impl pallas3 --ctx 2048 \
      --batch $B --q 1 --heads 16 --kv-heads 8 --hd 128 --block $BLK \
      --inloop --iters 400 --reps 3
  done
done
echo "--- hd-64 control (llama geometry) ---"
timeout 1800 python -m bench.kernel_bench --impl pallas3 --ctx 2048 \
  --batch 8 --q 1 --heads 32 --kv-heads 8 --hd 64 --block 256 \
  --inloop --iters 400 --reps 3

echo "=== qwen3 AR b=1 vs no-qk-norm control (item 4) ==="
SSD_BENCH_MODE=ar SSD_BENCH_ARCH=qwen3 timeout 3600 python bench.py
SSD_BENCH_MODE=ar SSD_BENCH_ARCH=qwen3nq timeout 3600 python bench.py

echo "=== EAGLE acceptance-curve calibration (item 2) ==="
for N in 0.03 0.06 0.1 0.2; do
  echo "--- feagle noise $N ---"
  SSD_BENCH_MODE=feagle SSD_BENCH_DRAFT_NOISE=$N timeout 3600 python bench.py
done

echo "=== int8 flagship batch aggregates (item 6) ==="
SSD_BENCH_MODE=sd SSD_BENCH_QUANT=int8 SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 4800 python bench.py
SSD_BENCH_MODE=feagle SSD_BENCH_QUANT=int8 SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 4800 python bench.py
SSD_BENCH_MODE=ngram SSD_BENCH_QUANT=int8 timeout 4800 python bench.py
SSD_BENCH_MODE=ngram SSD_BENCH_QUANT=int8 SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 4800 python bench.py

echo "=== QUEUE2 DONE ==="

#!/bin/bash
# Round-5 queue 7: long-context fasync + a true continuous-batching serving
# run (numseqs > batch through bench/bench.py).
set -u
cd /root/repo
echo "=== fasync deep-context (prompt 1900) b=1 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_PROMPT_LEN=1900 timeout 4800 python bench.py
echo "=== fasync deep-context + int8 KV b=1 ==="
SSD_BENCH_MODE=fasync SSD_BENCH_PROMPT_LEN=1900 SSD_BENCH_KV_QUANT=int8 \
  timeout 4800 python bench.py
echo "=== serving regime: 32 requests through b=8 fasync (bench CLI) ==="
timeout 5400 python -m bench.bench \
  --model-path /tmp/ssd_bench_model_llama1b_spec_target \
  --draft /tmp/ssd_bench_model_llama1b_spec_draft \
  --random --spec --async-fused --rounds 32 --k 4 --f 2 --b 8 \
  --numseqs 32 --input_len 128 --output_len 128 --max_model_len 2048 \
  --block_sz 64
echo "=== QUEUE7 DONE ==="

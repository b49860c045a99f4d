#!/bin/bash
# Round-5 queue 9: serving-regime rerun (single ctx bucket + one warm pass).
set -u
cd /root/repo
echo "=== serving regime: 32 requests through b=8 fasync (warm) ==="
timeout 7200 python -m bench.bench \
  --model-path /tmp/ssd_bench_model_llama1b_spec_target \
  --draft /tmp/ssd_bench_model_llama1b_spec_draft \
  --random --spec --async-fused --rounds 32 --k 4 --f 2 --b 8 \
  --numseqs 32 --input_len 128 --output_len 128 --max_model_len 2048 \
  --block_sz 64 --ctx-bucket single --warm-passes 1
echo "=== serving control: same through fused sync SD ==="
timeout 7200 python -m bench.bench \
  --model-path /tmp/ssd_bench_model_llama1b_spec_target \
  --draft /tmp/ssd_bench_model_llama1b_spec_draft \
  --random --spec --rounds 32 --k 4 --b 8 \
  --numseqs 32 --input_len 128 --output_len 128 --max_model_len 2048 \
  --block_sz 64 --ctx-bucket single --warm-passes 1
echo "=== QUEUE9 DONE ==="

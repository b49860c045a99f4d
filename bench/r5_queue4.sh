#!/bin/bash
# Round-5 measurement queue 4: re-measure after the small-k fork fix
# (iterative-argmax replaces lax.top_k in the tree build), and the repaired
# prefill decomposition.
set -u
cd /root/repo

echo "=== prefill decomposition t=2048 / t=512 (row-live fix) ==="
timeout 2400 python -m bench.prefill_diag --t 2048 --reps 5
timeout 2400 python -m bench.prefill_diag --t 512 --reps 5

echo "=== fasync_diag after fork fix (b=8 then b=1) ==="
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 8
timeout 3600 python -m bench.fasync_diag --k 4 --rounds 32 --reps 3 --batch 1

echo "=== fasync e2e after fork fix (b=1 full warm, b=8 min warm) ==="
SSD_BENCH_MODE=fasync timeout 5400 python bench.py
SSD_BENCH_MODE=fasync SSD_BENCH_BATCH=8 SSD_BENCH_WARM=min \
  timeout 5400 python bench.py

echo "=== unfused ssd b=8 after fork fix (the thread build gets faster) ==="
SSD_BENCH_MODE=ssd SSD_BENCH_BATCH=8 timeout 5400 python bench.py

echo "=== EAGLE curve bisection (anchor acceptance 0.3-0.5) ==="
for N in 0.033 0.036; do
  echo "--- feagle noise $N ---"
  SSD_BENCH_MODE=feagle SSD_BENCH_DRAFT_NOISE=$N timeout 3600 python bench.py
done

echo "=== QUEUE4 DONE ==="

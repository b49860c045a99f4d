#!/bin/bash
# Round-5 measurement queue 5: final prefill decomposition (hoist-proof).
set -u
cd /root/repo
echo "=== prefill decomposition t=2048 / t=512 (hoist-proof) ==="
timeout 2400 python -m bench.prefill_diag --t 2048 --reps 5
timeout 2400 python -m bench.prefill_diag --t 512 --reps 5
echo "=== QUEUE5 DONE ==="

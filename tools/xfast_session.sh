#!/bin/bash
# Round-4 follow-up TPU queue: validate the x-fast warp tier on-chip, A/B it
# on the composed RIFE/FILM benches, probe the RAFT lookup formulations, and
# retry the atm bf16 PSNR row. Run AFTER tools/tpu_session.sh finishes.
set -u
cd "$(dirname "$0")/.."
LOG=tools/xfast_session.log
run() {
  echo "=== $1 $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v '^WARNING' | tail -40 | tee -a "$LOG"
}
run "warp exactness xfast=1" env CFI_WARP_XFAST=1 python -m pytest \
  tests/test_pallas_kernels.py -q -m "slow or not slow" -x
run "rife xfast=0 (control)" python bench.py
run "rife xfast=1" env CFI_WARP_XFAST=1 python bench.py
run "film xfast=1" env CFI_WARP_XFAST=1 python bench.py --metric film
run "raft lookup probe" python tools/probe_raft_lookup.py
run "atm bf16 psnr retry" python bench.py --metric psnr_torch --families atm
run "stmfnet 540p" python bench.py --metric stmfnet
echo "=== xfast session done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

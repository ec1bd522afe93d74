#!/bin/bash
# Turnkey TPU measurement battery for when the axon tunnel is up.
# Runs the round-3 measurement queue in priority order, tee-ing every JSON
# line to tools/tpu_session.log so partial progress survives a tunnel drop.
# Usage: bash tools/tpu_session.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
LOG=tools/tpu_session.log
# Deliverables first (committed artifacts: BENCH_MATRIX.md, PSNR_TORCH rows),
# exploratory probes after — tunnel time is scarce and rounds have died with
# only the probes run.
stages=${*:-matrix psnr rife film filmstages slowstages gridprobe warpshapes batchsweep}
for s in $stages; do
  echo "=== stage $s $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  case $s in
    gridprobe)  timeout 1200 python bench.py --metric gridprobe 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    warpshapes) timeout 2400 python bench.py --metric warpshapes 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    rife)       timeout 1200 python bench.py 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    film)       timeout 2400 python bench.py --metric film 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    filmstages) timeout 2400 python bench.py --metric filmstages 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    slowstages) timeout 3600 python bench.py --metric slowstages 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    batchsweep) timeout 3600 python bench.py --metric batchsweep 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    # keep WARNING lines here: CFI_COMPILE_DIAG's per-computation compile logs
    # (the m2m compile forensics) are emitted at WARNING level
    matrix)     timeout 7200 env CFI_COMPILE_DIAG=1 python bench.py --metric matrix 2>&1 | tee -a "$LOG" ;;
    psnr)       timeout 10800 python bench.py --metric psnr_torch 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    # single-family re-measures (post-optimization rows / transient-error retries)
    amt|xvfi|stmfnet|gmfss|eisai|m2m|momo|sepconv|flavr|cain|atm|ifunet|ifrnet)
                timeout 2400 python bench.py --metric "$s" 2>&1 | grep -v '^WARNING' | tee -a "$LOG" ;;
    *) echo "unknown stage $s" | tee -a "$LOG" ;;
  esac
done
echo "=== battery done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

#!/bin/bash
# Wait for the axon TPU tunnel to come up, then run the measurement battery.
# Safe to leave running in the background; logs to tools/tunnel_watch.log.
cd "$(dirname "$0")/.."
LOG=tools/tunnel_watch.log
echo "watch start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if ss -ltn 2>/dev/null | grep -qE ':(8083|8093) '; then
    echo "tunnel UP $(date -u +%FT%TZ)" >> "$LOG"
    # double-check a real device answers within 120s before starting the battery
    if timeout 120 python -c "import jax; d=jax.devices(); assert d and d[0].platform!='cpu', d; print(d)" >> "$LOG" 2>&1; then
      echo "device OK, launching battery $(date -u +%FT%TZ)" >> "$LOG"
      bash tools/tpu_session.sh >> "$LOG" 2>&1
      echo "battery exited $(date -u +%FT%TZ)" >> "$LOG"
      exit 0
    else
      echo "port open but device probe failed; retrying $(date -u +%FT%TZ)" >> "$LOG"
    fi
  fi
  sleep 60
done

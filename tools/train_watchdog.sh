#!/bin/bash
# Stall-watchdog wrapper for the TPU training run: the axon tunnel client
# occasionally wedges mid-RPC (all threads futex-wait, connection ESTAB,
# no progress; observed 2026-08-21 after ~6k steps). Training checkpoints
# every --save_every epochs and auto-resumes, so the cure is: kill the
# exact PID when the log stops advancing for STALL_SEC, relaunch, repeat.
#
#   bash tools/train_watchdog.sh <logfile> <python args...>
set -u
LOG="$1"; shift
STALL_SEC="${STALL_SEC:-420}"
while true; do
  python -u "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "[watchdog] launched pid $PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    last=$(stat -c %Y "$LOG")
    now=$(date +%s)
    if [ $((now - last)) -gt $STALL_SEC ]; then
      echo "[watchdog] stall >${STALL_SEC}s — killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[watchdog] training completed" >> "$LOG"
    break
  fi
  echo "[watchdog] exited rc=$rc — restarting in 10s" >> "$LOG"
  sleep 10
done

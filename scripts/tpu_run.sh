#!/bin/bash
# Watchdog runner for TPU scripts over the flaky axon tunnel.
#
# The tunnel sometimes wedges a fresh client forever (grant never claimed).
# Symptom: the process sleeps at 0% CPU and its output file stops growing.
# This runner kills and relaunches the script when its output has not grown
# for $STALL_S seconds, up to $TRIES attempts.
#
# Usage: scripts/tpu_run.sh OUTFILE TOTAL_TIMEOUT_S STALL_S TRIES -- python -u script.py args...

set -u
OUT=$1; TOTAL=$2; STALL=$3; TRIES=$4; shift 5

for attempt in $(seq 1 "$TRIES"); do
  echo "[tpu_run] attempt $attempt: $*" >> "$OUT"
  "$@" >> "$OUT" 2>&1 &
  pid=$!
  start=$(date +%s)
  last_size=$(stat -c %s "$OUT")
  last_change=$start
  ok=""
  while kill -0 "$pid" 2>/dev/null; do
    sleep 10
    now=$(date +%s)
    size=$(stat -c %s "$OUT")
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
    fi
    if [ $((now - start)) -gt "$TOTAL" ]; then
      echo "[tpu_run] total timeout, killing" >> "$OUT"
      kill "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      exit 124
    fi
    if [ $((now - last_change)) -gt "$STALL" ]; then
      echo "[tpu_run] stalled ${STALL}s, killing attempt $attempt" >> "$OUT"
      kill "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      ok="stalled"
      break
    fi
  done
  if [ -z "$ok" ]; then
    wait "$pid"
    rc=$?
    echo "[tpu_run] attempt $attempt exited rc=$rc" >> "$OUT"
    exit $rc
  fi
  sleep 240  # cooldown before relaunch (a wedged grant needs minutes of full idle to clear)
done
echo "[tpu_run] all attempts stalled" >> "$OUT"
exit 125

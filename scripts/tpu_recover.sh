#!/bin/bash
# TPU-outage recovery watchdog (round 4).
#
# Failure mode observed live at 03:02 UTC: the TPU tunnel backend went
# away mid-step; the trainer blocks forever inside a PJRT call (futex
# wait in C++, so Python signal handlers — including the SIGTERM
# checkpoint path — can never run).  Waiting is correct while the
# backend is down, but once it returns a wedged trainer must be
# SIGKILLed and relaunched: orbax auto-resume picks up the newest
# finalized checkpoint (cli/train.py:404-413).
#
# Logic, every 120 s:
#   metrics fresh (<5 min)        -> trainer healthy, do nothing
#   metrics stale                 -> probe the backend (90 s bounded)
#     probe hangs                 -> backend still down, keep waiting
#     probe ok                    -> give the trainer 180 s to resume on
#                                    its own; if still stale, SIGKILL +
#                                    relaunch with the original argv
#
# Usage: scripts/tpu_recover.sh RUN_DIR TRAIN_LOG PIDFILE
set -u
cd /root/repo
RUN_DIR="${1:-artifacts_synth/run_r4b}"
TRAIN_LOG="${2:-/tmp/train_r4b.log}"
PIDFILE="${3:-/tmp/train_r4.pid}"
LOG=/tmp/tpu_recover.log
exec >>"$LOG" 2>&1
echo "=== tpu_recover start $(date -u +%H:%M:%S) ==="

METRICS="$RUN_DIR/metrics.jsonl"

# liveness = newest of metrics.jsonl and the train log (the log also
# moves during checkpoint saves / export prints)
age() {
  local m l n
  m=$(stat -c %Y "$METRICS" 2>/dev/null || echo 0)
  l=$(stat -c %Y "$TRAIN_LOG" 2>/dev/null || echo 0)
  n=$m; [ "$l" -gt "$n" ] && n=$l
  echo $(( $(date +%s) - n ))
}

probe() {
  timeout 90 python -c "import jax; jax.numpy.ones(3).sum().block_until_ready()" \
    >/dev/null 2>&1
}

relaunch() {
  # original argv (cli/train.py auto-resumes from the newest orbax step)
  nohup python -m cli.train --out-dir artifacts_synth/run_r4b \
    --tokenizer-run-dir artifacts_synth/tok_r4 --batch-size 48 \
    --total-steps 15000 --lr 5e-5 --token-loss-weight 0.02 \
    --token-loss-objective logp --checkpoint-steps 2000 --log-steps 50 \
    --synth-render --drop-path 0.1 \
    --export-params artifacts_synth/flagship_r4.npz \
    >> "$TRAIN_LOG" 2>&1 &
  echo $! > "$PIDFILE"
  echo "relaunched trainer pid=$(cat "$PIDFILE") $(date -u +%H:%M:%S)"
}

while :; do
  # round4_post sets this sentinel before its deadline SIGTERM: from then
  # on a stale-metrics window is the trainer saving/exporting, not a hang
  if [ -f /tmp/train_sigterm.sent ]; then
    echo "SIGTERM sentinel seen; exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
  PID=$(cat "$PIDFILE" 2>/dev/null || echo 0)
  if ! kill -0 "$PID" 2>/dev/null; then
    # trainer exited (normal end or round4_post SIGTERM): we're done
    echo "trainer gone (pid $PID); exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
  if [ "$(age)" -gt 300 ]; then
    echo "metrics stale ($(age)s) $(date -u +%H:%M:%S); probing backend"
    if probe; then
      echo "backend is UP; giving trainer 180s to resume"
      sleep 180
      if [ "$(age)" -gt 300 ] && kill -0 "$PID" 2>/dev/null; then
        echo "trainer wedged with backend up: SIGKILL $PID"
        kill -9 "$PID"
        sleep 10
        relaunch
        # grace for resume + recompile before liveness checks resume
        sleep 1200
      else
        echo "trainer resumed on its own"
      fi
    else
      echo "backend still down"
    fi
  fi
  sleep 120
done

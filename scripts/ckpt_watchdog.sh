#!/bin/bash
# Checkpoint-commit watchdog (round 4).
#
# The r4 flagship run died at step 5850 in a session reset with ZERO
# checkpoints committed: orbax had written steps 2000/4000 to disk, but
# disk state outside git does not survive a reset, so the weights were
# lost (the exact failure VERDICT r3 weak-#1 describes for the r3 10k
# model).  This watchdog closes that hole: whenever orbax finalizes one
# of the insurance steps below, the step dir is committed to git
# immediately.  Git objects are permanent (~7.1 GB per flagship ckpt),
# so we commit a budgeted subset, not every save.
#
# Usage: scripts/ckpt_watchdog.sh RUN_DIR "2000 6000 10000 15000" &
set -u
cd /root/repo
RUN_DIR="${1:?run dir}"
STEPS="${2:?space-separated steps to commit}"
LOG=/tmp/ckpt_watchdog.log
exec >>"$LOG" 2>&1
echo "=== watchdog start $(date -u +%H:%M:%S) run=$RUN_DIR steps=$STEPS ==="

committed=""
while :; do
  for s in $STEPS; do
    case " $committed " in *" $s "*) continue;; esac
    d="$RUN_DIR/$s"
    if [ -f "$d/_CHECKPOINT_METADATA" ]; then
      # async finalize: metadata lands last, but give the rename a beat
      sleep 20
      git add -f "$d" "$RUN_DIR"/*.json* "$RUN_DIR"/*.txt 2>/dev/null
      git commit -q -m "Flagship r4b checkpoint at step $s (reset insurance)" \
        && echo "committed step $s $(date -u +%H:%M:%S)"
      committed="$committed $s"
    fi
  done
  # exit once the last insurance step is in
  last=$(echo $STEPS | awk '{print $NF}')
  case " $committed " in *" $last "*) echo "watchdog done"; exit 0;; esac
  # also exit if training died AND no more saves are coming
  if ! kill -0 "$(cat /tmp/train_r4.pid 2>/dev/null || echo 0)" 2>/dev/null; then
    sleep 60  # allow a final async save to finalize
    for s in $STEPS; do
      case " $committed " in *" $s "*) continue;; esac
      d="$RUN_DIR/$s"
      if [ -f "$d/_CHECKPOINT_METADATA" ]; then
        git add -f "$d" && git commit -q -m "Flagship r4b checkpoint at step $s (reset insurance)"
        echo "committed step $s post-exit"
      fi
    done
    # commit whatever newest finalized step exists, even off-schedule
    new=$(ls -d "$RUN_DIR"/[0-9]* 2>/dev/null | sort -t/ -k3 -n | tail -1)
    if [ -n "${new:-}" ] && [ -f "$new/_CHECKPOINT_METADATA" ] && \
       ! git ls-files --error-unmatch "$new/_CHECKPOINT_METADATA" >/dev/null 2>&1; then
      git add -f "$new" && git commit -q -m "Flagship r4b final checkpoint ($(basename "$new"))"
      echo "committed final $(basename "$new")"
    fi
    echo "watchdog exit: trainer gone"; exit 0
  fi
  sleep 120
done

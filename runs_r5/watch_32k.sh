#!/bin/bash
# Round-5 watcher: archive + commit the 32,768-scene scaling point the
# moment queue G3 produces it, and append the measured row to
# BASELINE.md (survives agent-session restarts).
#
# Deadline contingency: past DEADLINE_TS the fit cannot finish inside
# the round, so SIGTERM it — the learner checkpoints at the epoch
# boundary and exits cleanly (the §5.3 preemption contract), queue G3
# then runs its own held-out eval, and the row lands through the
# normal path with the true epoch count read from metrics.jsonl.
# If that eval hasn't appeared FALLBACK_S after the SIGTERM, fall back
# to a parallel best-checkpoint eval (chip is shared;
# XLA_PYTHON_CLIENT_PREALLOCATE=false on both sides).
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
D=/root/repo/runs_r5/ipdnet_scale_32768
A=/root/repo/runs_archive/ipdnet_scale_32768
DEADLINE_TS=${DEADLINE_TS:-1787198400}   # 2026-08-20 04:00 UTC
FALLBACK_S=${FALLBACK_S:-1500}
QUEUE_PID=$(cat /tmp/queue_g3.pid 2>/dev/null)
TEST="python -m fnssl_tpu.cli.main test --model ipdnet --best \
  --data-dir /root/data_r4/ipdnet/test --bz 8 --log-dir $D"

archive() {  # $1 = eval json, $2 = kind (full|partial)
  mkdir -p "$A"
  cp "$D/config.json" "$A/" 2>/dev/null
  cp "$D/metrics.jsonl" "$A/" 2>/dev/null
  cp "$1" "$A/eval.json"
  python runs_r5/append_32k_row.py "$1" "$2" || true
  git add "$A" BASELINE.md && git commit -q -m \
    "archive: 32,768-scene IPDnet scaling point (queue G3, $2 eval)" || true
}

sigterm_ts=0
while true; do
  if [ -f "$D.test.json" ]; then
    archive "$D.test.json" full
    break
  fi
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE_TS" ] && [ "$sigterm_ts" = 0 ]; then
    # SIGTERM only the fit child of the known queue pid (never kill by
    # pattern over all processes)
    for pid in $(ps -o pid= --ppid "$QUEUE_PID" 2>/dev/null); do
      if grep -qa "cli.main.fit" <(tr '\0' '.' </proc/$pid/cmdline 2>/dev/null); then
        kill -TERM "$pid" && sigterm_ts=$now
      fi
    done
    # if the fit has not started yet (generator late), sigterm_ts stays
    # 0 and we retry on the next tick
  fi
  if [ "$sigterm_ts" != 0 ] && [ $((now - sigterm_ts)) -ge "$FALLBACK_S" ] \
     && ls "$D"/ckpt/* >/dev/null 2>&1; then
    $TEST | tail -1 > "$D.test_partial.json" || true
    if [ -s "$D.test_partial.json" ]; then
      archive "$D.test_partial.json" partial
      break
    fi
  fi
  sleep 45
done
echo "=== WATCH 32K DONE $(date) ==="

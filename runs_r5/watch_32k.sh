#!/bin/bash
# Round-5 watcher: archive + commit the 32,768-scene scaling point the
# moment queue G3 produces it (survives agent-session restarts).
# Contingency: past DEADLINE_TS, if the fit is mid-flight but has a
# best checkpoint, eval best-so-far in parallel (the chip is shared;
# XLA_PYTHON_CLIENT_PREALLOCATE=false on both sides) so the round
# always ends with a measured 32k row, clearly marked partial.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
D=/root/repo/runs_r5/ipdnet_scale_32768
A=/root/repo/runs_archive/ipdnet_scale_32768
DEADLINE_TS=${DEADLINE_TS:-1787199000}   # 2026-08-20 04:10 UTC
TEST="python -m fnssl_tpu.cli.main test --model ipdnet --best \
  --data-dir /root/data_r4/ipdnet/test --bz 8 --log-dir $D"

partial_done=0
while true; do
  if [ -f "$D.test.json" ]; then break; fi
  if [ "$(date +%s)" -ge "$DEADLINE_TS" ] && [ "$partial_done" = 0 ] \
     && ls "$D"/ckpt/* >/dev/null 2>&1; then
    $TEST | tail -1 > "$D.test_partial.json" || true
    partial_done=1
    # archive the partial immediately; keep looping for the real one
    mkdir -p "$A"
    cp "$D/config.json" "$A/" 2>/dev/null
    cp "$D/metrics.jsonl" "$A/" 2>/dev/null
    cp "$D.test_partial.json" "$A/eval_partial.json"
    python runs_r5/append_32k_row.py "$D.test_partial.json" partial || true
    git add "$A" BASELINE.md && git commit -q -m "archive: 32k scaling point partial eval (best checkpoint mid-fit, deadline contingency)" || true
  fi
  sleep 45
done

mkdir -p "$A"
cp "$D/config.json" "$A/" 2>/dev/null
cp "$D/metrics.jsonl" "$A/" 2>/dev/null
cp "$D.test.json" "$A/eval.json"
python runs_r5/append_32k_row.py "$D.test.json" full || true
git add "$A" BASELINE.md && git commit -q -m "archive: 32,768-scene IPDnet scaling point at the 20,480-step equal budget (queue G3)" || true
echo "=== WATCH 32K DONE $(date) ==="

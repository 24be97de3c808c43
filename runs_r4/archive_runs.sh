#!/bin/bash
# Copy every run's reproducibility record from runs_r4/ (gitignored,
# holds checkpoints) into runs_archive/ (tracked — see its README):
# config + metrics trajectory + held-out eval, never checkpoints.
# Idempotent; run it whenever a run finishes, commit the result.
set -e
cd /root/repo
for d in runs_r4/*/; do
  name=$(basename "$d")
  [ -f "$d/metrics.jsonl" ] || continue
  out=runs_archive/$name
  mkdir -p "$out"
  cp "$d/metrics.jsonl" "$out/"
  [ -f "$d/config.json" ] && cp "$d/config.json" "$out/"
  [ -f "runs_r4/$name.test.json" ] && cp "runs_r4/$name.test.json" \
    "$out/eval.json"
done
for j in runs_r4/*.json runs_r4/*.log; do
  [ -f "$j" ] || continue
  case "$j" in *.test.json) continue;; esac
  cp "$j" runs_archive/
done
ls -R runs_archive | head -50

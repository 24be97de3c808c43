"""Append the measured 32,768-scene scaling row to BASELINE.md.

Called by runs_r5/watch_32k.sh the moment queue G3's eval lands (or the
deadline contingency's eval), so the number is documented even if no
agent session is alive. Idempotent: skips if the marker line is already
present. The epoch/step count is derived from the run's metrics.jsonl
(count of train/epoch_s rows), so a deadline-shortened run (SIGTERM ->
graceful checkpoint -> eval) is reported honestly.
"""
import json
import sys

eval_path, kind = sys.argv[1], sys.argv[2]  # kind: "full" | "partial"
with open(eval_path) as f:
    m = json.load(f)

run_dir = "/root/repo/runs_r5/ipdnet_scale_32768"
epochs = 0
try:
    with open(f"{run_dir}/metrics.jsonl") as f:
        for line in f:
            if '"train/epoch_s"' in line:
                epochs += 1
except OSError:
    pass
steps = epochs * 4096

marker = "<!-- 32k-row -->"
base = "/root/repo/BASELINE.md"
with open(base) as f:
    text = f.read()
if marker in text:
    sys.exit(0)

if epochs >= 5:
    budget = f"{steps:,} (= the full 5 ep x 4,096 equal-budget point)"
    note = ""
else:
    budget = f"{steps:,} ({epochs} ep x 4,096)"
    note = (
        "\nThe run was stopped at the round deadline (SIGTERM -> graceful "
        f"epoch-boundary checkpoint after {epochs} of the planned 5 epochs"
        + ("; eval is the parallel best-checkpoint contingency"
           if kind == "partial" else "")
        + "), so this row is at a SMALLER step budget than the 20,480-step "
        "comparison rows — read it as a lower bound for the 32k point.")

row = f"""
### The 32,768-scene scaling point at the 20,480-step equal budget (VERDICT r4 #1) {marker}

Third point of the fixed-budget data-scaling row (256 scenes: ACC 0.888,
16,384 scenes: 0.837, both at 20,480 optimizer steps, same gates / same
512-scene test split); lr decay matched per step (gamma 0.950625/epoch =
0.975^(4096/2048)). Corpus: the r4 compact corpus extended in place to
32,768 scenes (`runs_r5/gen32k.sh`, C++ ISM, ~2.1 scenes/s on the one
host core). Record: `runs_archive/ipdnet_scale_32768/`.

| Train scenes | Steps | Held-out ACC@10 | MAE | MDR | FAR |
|---|---|---|---|---|---|
| 32,768 | {budget} | **{m['ACC']:.3f}** | {m['MAE']:.2f} | {m['MDR']:.3f} | {m['FAR']:.3f} |
{note}
"""

anchor = "### Multi-process DP equivalence"
text = text.replace(anchor, row.strip() + "\n\n" + anchor, 1)
with open(base, "w") as f:
    f.write(text)
print(f"appended 32k {kind} row: ACC {m['ACC']:.3f} at {epochs} epochs")

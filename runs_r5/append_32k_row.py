"""Append the measured 32,768-scene scaling row to BASELINE.md.

Called by runs_r5/watch_32k.sh the moment queue G3's eval lands (or the
deadline contingency's partial eval), so the number is documented even
if no agent session is alive. Idempotent: skips if the marker line is
already present.
"""
import json
import sys

eval_path, kind = sys.argv[1], sys.argv[2]  # kind: "full" | "partial"
with open(eval_path) as f:
    m = json.load(f)

marker = f"<!-- 32k-row-{kind} -->"
base = "/root/repo/BASELINE.md"
with open(base) as f:
    text = f.read()
if marker in text:
    sys.exit(0)

steps = "20,480 (5 ep x 4,096)" if kind == "full" else \
    "partial (best checkpoint mid-fit, deadline contingency; see metrics.jsonl for the epoch reached)"
note = "" if kind == "full" else (
    "\nThis row is the deadline contingency: the fit was still running at "
    "the round boundary, so the best checkpoint so far was evaluated. The "
    "full 5-epoch row supersedes it if present below.")

row = f"""
### The 32,768-scene scaling point at the 20,480-step equal budget (VERDICT r4 #1) {marker}

Third point of the fixed-budget data-scaling row (256: ACC 0.888,
16,384: 0.837, both at 20,480 optimizer steps, same gates/test split);
lr decay matched per step (gamma 0.950625/epoch = 0.975^(4096/2048)).
Corpus: the r4 compact corpus extended in place to 32,768 scenes
(`runs_r5/gen32k.sh`, C++ ISM). Record:
`runs_archive/ipdnet_scale_32768/`.

| Train scenes | Steps | Held-out ACC@10 | MAE | MDR | FAR |
|---|---|---|---|---|---|
| 32,768 | {steps} | **{m['ACC']:.3f}** | {m['MAE']:.2f} | {m['MDR']:.3f} | {m['FAR']:.3f} |
{note}
"""

anchor = "### Multi-process DP equivalence"
text = text.replace(anchor, row.strip() + "\n\n" + anchor, 1)
with open(base, "w") as f:
    f.write(text)
print(f"appended 32k {kind} row: ACC {m['ACC']:.3f}")

#!/bin/bash
# Promote the round-4 CPU-hedge CRNN retrain (docs/EVAL.md "Round 4: the
# CPU-hedge CRNN retrain") into checkpoints/, with the evidence chain:
#   - requires the full-corpus eval artifact and a paired-covers recall
#     strictly above the best committed eval (same gate the chip chains use)
#   - copies the candidate + eval artifacts into the repo
# Usage: bash scripts/promote_cpu_hedge.sh <ckpt.npz> <full_eval.json> [covers_evals...]
set -e
cd /root/repo
CKPT=${1:?checkpoint path}
FULL=${2:?full-corpus eval json}

python3 - "$CKPT" "$FULL" <<'EOF'
import glob, json, shutil, sys

ckpt, full = sys.argv[1], sys.argv[2]

def rec(p):
    try:
        d = json.load(open(p))
        return d.get("tpu_mean_word_recall_on_paired"), d.get("tpu_mean_word_recall")
    except Exception:
        return None, None

base_cov, base_all = 0.112, 0.204
for p in ["data/evals/eval_r3_shipped.json"] + sorted(glob.glob("data/evals/eval_r4_cpu*.json")):
    c, a = rec(p)
    if c is not None and c > base_cov:
        base_cov, base_all = c, a

cov, allr = rec(full)
if cov is None or cov <= base_cov:
    sys.exit(f"NOT promoted: paired recall {cov} <= committed baseline {base_cov}")

shutil.copy(ckpt, "checkpoints/candidates/crnn_r4cpu_best_real.npz")
shutil.copy(full, "data/evals/eval_r4_cpu_hedge.json")
shutil.copy("checkpoints/crnn.npz", "checkpoints/crnn_prev.npz")
shutil.copy(ckpt, "checkpoints/crnn.npz")
print(f"PROMOTED {ckpt}: paired covers recall {cov} > {base_cov} (full-corpus {allr} vs {base_all})")
EOF

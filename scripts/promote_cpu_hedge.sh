#!/bin/bash
# Promote the round-4 CPU-hedge CRNN retrain (docs/EVAL.md "Round 4: the
# CPU-hedge CRNN retrain") into checkpoints/, with the evidence chain:
#   - requires the full-corpus eval artifact and a paired-covers recall
#     strictly above the best committed eval (same gate the chip chains use)
#   - copies the candidate + eval artifacts into the repo
# Usage: bash scripts/promote_cpu_hedge.sh <ckpt.npz> <full_eval.json> \
#          [eval_artifact_name] [candidate_name]
# eval_artifact_name defaults to eval_r4_cpu_hedge.json; later promotions
# pass their own name so earlier committed artifacts are never overwritten.
set -e
cd /root/repo
CKPT=${1:?checkpoint path}
FULL=${2:?full-corpus eval json}
EVNAME=${3:-eval_r4_cpu_hedge.json}
CANDNAME=${4:-crnn_r4cpu_best_real.npz}

python3 - "$CKPT" "$FULL" "$EVNAME" "$CANDNAME" <<'EOF'
import glob, json, shutil, sys

ckpt, full, evname, candname = sys.argv[1:5]

def rec(p):
    try:
        d = json.load(open(p))
        return d.get("tpu_mean_word_recall_on_paired"), d.get("tpu_mean_word_recall")
    except Exception:
        return None, None

base_cov, base_all = 0.112, 0.204
for p in ["data/evals/eval_r3_shipped.json"] + sorted(
        glob.glob("data/evals/eval_r[45]*cpu*.json")
        + glob.glob("data/evals/eval_r5_chip*.json")):
    c, a = rec(p)
    if c is not None and c > base_cov:
        base_cov, base_all = c, a

cov, allr = rec(full)
if cov is None or cov <= base_cov:
    sys.exit(f"NOT promoted: paired recall {cov} <= committed baseline {base_cov}")

shutil.copy(ckpt, f"checkpoints/candidates/{candname}")
shutil.copy(full, f"data/evals/{evname}")
shutil.copy("checkpoints/crnn.npz", "checkpoints/crnn_prev.npz")
shutil.copy(ckpt, "checkpoints/crnn.npz")
print(f"PROMOTED {ckpt}: paired covers recall {cov} > {base_cov} (full-corpus {allr} vs {base_all})")
EOF

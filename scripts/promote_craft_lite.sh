#!/bin/bash
# Promote a CRAFTLite detector candidate into checkpoints/craft.npz,
# with the same evidence discipline as promote_cpu_hedge.sh:
#   - requires a committed-quality full-corpus eval artifact produced
#     WITH the candidate detector (and the shipped recognizer)
#   - promotes only if real-corpus recall holds vs the best committed
#     full-corpus eval (tolerance 0.01 recall / +0.02 phrase CER), i.e.
#     the lite model must pay for its 9.5x FLOP cut with ~zero recall
#   - keeps the VGG checkpoint as checkpoints/craft_vgg.npz so the
#     engine's arch sniffing (runtime/engine.py:143) can always load
#     either
# Usage: bash scripts/promote_craft_lite.sh <lite_ckpt.npz> <full_eval.json> \
#          [eval_artifact_name]
set -e
cd /root/repo
CKPT=${1:?lite checkpoint path}
FULL=${2:?full-corpus eval json (run with --craft $CKPT)}
EVNAME=${3:-eval_r5_lite_full.json}

python3 - "$CKPT" "$FULL" "$EVNAME" <<'EOF'
import glob, json, os, shutil, sys

ckpt, full, evname = sys.argv[1:4]

def rec(p):
    try:
        d = json.load(open(p))
        return (d.get("tpu_mean_word_recall"),
                d.get("tpu_mean_phrase_cer"),
                d.get("tpu_mean_word_recall_on_paired"))
    except Exception:
        return None, None, None

# Baseline: best committed full-corpus recall (these were all measured
# with the VGG detector).
base_all, base_cer, base_cov = 0.204, 1.0, 0.112
for p in sorted(glob.glob("data/evals/eval_r*[0-9]*.json")):
    if os.path.basename(p) == evname:
        continue
    a, e, c = rec(p)
    if a is not None and a > base_all:
        base_all, base_cer = a, (e if e is not None else base_cer)
        base_cov = c if c is not None else base_cov

allr, cer, cov = rec(full)
if allr is None:
    sys.exit("NOT promoted: no full-corpus recall in the eval artifact")
ok = (allr >= base_all - 0.01
      and (cer is None or base_cer is None or cer <= base_cer + 0.02)
      and (cov is None or base_cov is None or cov >= base_cov - 0.01))
if not ok:
    sys.exit(f"NOT promoted: lite {allr}/{cer} covers {cov} vs committed "
             f"VGG baseline {base_all}/{base_cer} covers {base_cov}")

def place(src, dst):
    if not (os.path.exists(dst) and os.path.samefile(src, dst)):
        shutil.copy(src, dst)

place(ckpt, "checkpoints/candidates/craft_lite.npz")
place(full, f"data/evals/{evname}")
if not os.path.exists("checkpoints/craft_vgg.npz"):
    shutil.copy("checkpoints/craft.npz", "checkpoints/craft_vgg.npz")
shutil.copy(ckpt, "checkpoints/craft.npz")
print(f"PROMOTED {ckpt}: full {allr}/{cer} covers {cov} "
      f"(VGG baseline {base_all}/{base_cer} covers {base_cov})")
EOF

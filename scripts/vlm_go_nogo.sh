#!/bin/bash
# PageReader (BASELINE config 5) go/no-go — ROADMAP round-4 item 5.
# Launch MANUALLY only if >= 4h of chip time remain after chain_r4
# (check /tmp/CHAIN_R4_DONE). The decision metric was fixed BEFORE this
# run (docs/ROADMAP.md): GO iff teacher-forced token loss is clearly
# below the unconditional-entropy plateau AND vlm_eval synthetic
# exact-JSON >= 0.8 with nonzero real field accuracy. Otherwise the model
# is parked permanently and the negative result recorded.
#
# NOT the known-plateau recipe: this continues the r3 JSON + encoder-CTC
# (weight 1.0) leg from its 3.8k-step state — it was still learning
# (loss 2.80 -> 2.40, val_field_acc 0 -> ~0.11) when the tunnel dropped.
# TERM-first timeouts ONLY (a KILL mid-compile took the backend down for
# hours on 08-17).
cd /root/repo
T="timeout --signal=TERM --kill-after=180"
INIT=${1:-/tmp/ckpt_vlm_r3/vlm.npz}
mkdir -p /tmp/train_logs data/evals

$T 18000 python -u -m bbocr_tpu.cli.train --component vlm \
  --vlm-target json --vlm-ctc-weight 1.0 \
  --init-from "$INIT" \
  --steps 10000 --batch 64 --lr 1.5e-4 --schedule cosine --warmup 100 \
  --data-threads 8 --out /tmp/ckpt_vlm_r4 --save-every 1000 \
  --log-every 100 > /tmp/train_logs/vlm_r4.log 2>&1
cp /tmp/ckpt_vlm_r4/vlm.npz checkpoints/candidates/vlm_r4.npz 2>/dev/null

$T 2400 python -u -m bbocr_tpu.cli.vlm_eval \
  --ckpt /tmp/ckpt_vlm_r4/vlm.npz --synthetic --real \
  --out data/evals/vlm_eval_r4.json > /tmp/vlm_eval_r4.log 2>&1

python3 - <<'EOF'
import json

d = json.load(open("data/evals/vlm_eval_r4.json"))
syn = (d.get("synthetic") or {}).get("exact_json")
real = d.get("real") or {}
real_acc = real.get("fuzzy_acc") or real.get("field_acc") or real.get("exact_acc")
go = (syn or 0) >= 0.8 and (real_acc or 0) > 0
print(f"VLM {'GO' if go else 'NO-GO — park permanently'}: "
      f"synthetic exact-JSON={syn}, real field acc={real_acc}")
EOF

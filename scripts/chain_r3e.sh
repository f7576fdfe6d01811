#!/bin/bash
# Round-3 chain v10: replaces v9 (killed in its probe loop; nothing chip-bound
# had started). Changes vs v9:
#  - stage sentinels: touch /tmp/STOP_CHAIN to stop cleanly at the next boundary
#  - artifacts copied INTO the repo (checkpoints/candidates/, data/evals/) so
#    the round-end driver commit can never lose them
#  - evaluates BOTH the final and the best-real-CER CRNN checkpoints, picks the
#    winner on covers recall, and runs the wire A/B legs with the winner
#  - ends PAUSED after the CRAFT eval (touch /tmp/CHAIN_PAUSED) so the chip is
#    free for manual bench/commit/VLM decisions — v9 would have run a 3.3h VLM
#    leg straight into the round-end bench window
# All timeouts TERM-first (never KILL a client holding the chip mid-compile).
cd /root/repo
STOP=/tmp/STOP_CHAIN
LOG=/tmp/chain_v10.log
log(){ echo "$1 $(date)" >> $LOG; }
stage(){ if [ -f $STOP ]; then log "STOP before $1"; exit 0; fi; log "stage $1"; }
mkdir -p checkpoints/candidates data/evals /tmp/train_logs

# wait for the v9 parent (TERM pending behind its last probe) to die
while kill -0 1135 2>/dev/null; do sleep 10; done
log "v9 gone, probing"

while true; do
  [ -f $STOP ] && exit 0
  timeout 600 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" > /tmp/chain_v10_probe.log 2>&1 && break
  log "tpu still down"
  sleep 120
done
log "TPU BACK"
T="timeout --signal=TERM --kill-after=180"

stage crnn_r3e
$T 14400 python -u -m bbocr_tpu.cli.train --component crnn \
  --steps 8000 --batch 384 --width 64,128,256,384,512 --lr 2.5e-4 \
  --schedule cosine --warmup 100 --init-from checkpoints/crnn.npz \
  --pipeline-crops /tmp/pipeline_crops:0.2 --val-real data/real_crops \
  --data-threads 8 --out /tmp/ckpt_r3e --save-every 500 --log-every 50 \
  > /tmp/train_logs/crnn_r3e.log 2>&1
cp /tmp/ckpt_r3e/crnn.npz checkpoints/candidates/crnn_r3e.npz 2>/dev/null
cp /tmp/ckpt_r3e/crnn_best_real.npz checkpoints/candidates/crnn_r3e_best_real.npz 2>/dev/null

stage eval_final_ckpt
$T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
  --craft checkpoints/craft.npz --crnn /tmp/ckpt_r3e/crnn.npz \
  --out /tmp/eval_r3e.json > /tmp/eval_r3e.log 2>&1
cp /tmp/eval_r3e.json data/evals/eval_r3e.json 2>/dev/null

stage eval_best_real_ckpt
if [ -f /tmp/ckpt_r3e/crnn_best_real.npz ]; then
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --craft checkpoints/craft.npz --crnn /tmp/ckpt_r3e/crnn_best_real.npz \
    --out /tmp/eval_r3e_br.json > /tmp/eval_r3e_br.log 2>&1
  cp /tmp/eval_r3e_br.json data/evals/eval_r3e_br.json 2>/dev/null
fi

# pick the winner on covers word recall (fall back to the final ckpt)
CRNN_PICK=$(python3 - <<'EOF'
import json, os
def rec(p):
    try:
        d = json.load(open(p))
        # prefer the paired-covers recall (the EasyOCR-parity gate), tie-break CER
        return (d.get("tpu_mean_word_recall_on_paired", -1),
                -d.get("tpu_mean_phrase_cer_on_paired", 9))
    except Exception:
        return (-1, -9)
a = rec("/tmp/eval_r3e.json"); b = rec("/tmp/eval_r3e_br.json")
print("/tmp/ckpt_r3e/crnn_best_real.npz" if (b > a and os.path.exists("/tmp/ckpt_r3e/crnn_best_real.npz")) else "/tmp/ckpt_r3e/crnn.npz")
EOF
)
log "CRNN_PICK=$CRNN_PICK"

stage eval_w4hr
BB_OCR_HOST_RECTIFY=1 BB_OCR_WIRE_BITS=4 $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
  --craft checkpoints/craft.npz --crnn "$CRNN_PICK" \
  --out /tmp/eval_r3e_w4hr.json > /tmp/eval_r3e_w4hr.log 2>&1
cp /tmp/eval_r3e_w4hr.json data/evals/eval_r3e_w4hr.json 2>/dev/null

stage eval_w4hr_ds45
BB_OCR_HOST_RECTIFY=1 BB_OCR_WIRE_BITS=4 BB_OCR_DETAIL_SCALE=0.45 $T 2700 \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --craft checkpoints/craft.npz --crnn "$CRNN_PICK" \
  --out /tmp/eval_r3e_w4hr_ds45.json > /tmp/eval_r3e_w4hr_ds45.log 2>&1
cp /tmp/eval_r3e_w4hr_ds45.json data/evals/eval_r3e_w4hr_ds45.json 2>/dev/null

stage craft_r3e
$T 9000 python -u -m bbocr_tpu.cli.train --component craft \
  --steps 4000 --batch 16 --page-h 256,384 --page-w 192,256 --lr 2e-4 \
  --schedule cosine --warmup 100 --neg-ratio 4 \
  --init-from checkpoints/craft.npz \
  --data-threads 8 --out /tmp/ckpt_craft_r3e --save-every 500 --log-every 50 \
  > /tmp/train_logs/craft_r3e.log 2>&1
cp /tmp/ckpt_craft_r3e/craft.npz checkpoints/candidates/craft_r3e.npz 2>/dev/null

stage eval_new_craft
$T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
  --craft /tmp/ckpt_craft_r3e/craft.npz --crnn "$CRNN_PICK" \
  --out /tmp/eval_r3e2.json > /tmp/eval_r3e2.log 2>&1
cp /tmp/eval_r3e2.json data/evals/eval_r3e2.json 2>/dev/null

touch /tmp/CHAIN_PAUSED
log "CHAIN PAUSED (crnn+craft+evals done; chip free for bench/VLM decisions)"

#!/bin/bash
# Round-5 chip chain — post-reboot relaunch of the queued r3e->r4 work.
# The 08-19 09:30 VM reboot wiped /tmp (pipeline crops, chain PIDs, the
# cpu2 continuation trainer) and restarted the round-5 clock, so this
# chain is TIME-AWARE: the CRNN step count is computed from the wall
# clock left before the round-end guard's TERM time.
#
# Stage order is insurance-first (the chip has been down 35h+ and may
# flap): a valid TPU bench artifact lands BEFORE any long training leg.
#   0. probe loop (600s subprocess probes, 120s sleep)
#   1. manual on-chip bench -> data/evals/bench_r5_tpu.json (+side)
#   2. regen /tmp/pipeline_crops on chip if missing/small (<1500 crops)
#   3. CRNN retrain, steps = f(seconds left), init from promoted crnn.npz
#   4. covers screen of final+best_real; full-corpus eval of the winner;
#      promotion THROUGH scripts/promote_cpu_hedge.sh (never around it)
#   5. CRAFTLite distill + recall A/B only if >=7200s left at that point
#   6. re-bench with the promoted stack if >=1500s left
# touch /tmp/STOP_CHAIN_R5 to stop at the next boundary.
# All timeouts TERM-first (never KILL a client holding the chip).
cd /root/repo
STOP=/tmp/STOP_CHAIN_R5
LOG=/tmp/chain_r5.log
log(){ echo "$1 $(date)" >> $LOG; }
stage(){ if [ -f $STOP ]; then log "STOP before $1"; exit 0; fi; log "stage $1"; }
T="timeout --signal=TERM --kill-after=180"
# keep in sync with scripts/round_end_guard.sh T_TERM
T_TERM_EPOCH=$(date -u -d "2026-08-19 14:05" +%s)
left(){ echo $(( T_TERM_EPOCH - $(date -u +%s) )); }
mkdir -p data/evals checkpoints/candidates /tmp/train_logs

stage probe
while true; do
  [ -f $STOP ] && exit 0
  timeout 600 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" > /tmp/chain_r5_probe.log 2>&1 && break
  log "tpu still down (left $(left)s)"
  sleep 120
done
log "TPU BACK (left $(left)s)"
touch /tmp/TPU_BACK   # cpu_r5.sh watchdog yields on this

stage bench_insurance
if [ "$(left)" -gt 1800 ]; then
  $T 1700 python -u bench.py > /tmp/bench_r5_tpu.json 2> /tmp/bench_r5_tpu_side.json
  cp /tmp/bench_r5_tpu.json data/evals/bench_r5_tpu.json 2>/dev/null
  cp /tmp/bench_r5_tpu_side.json data/evals/bench_r5_tpu_side.json 2>/dev/null
  log "insurance bench done: $(cat /tmp/bench_r5_tpu.json 2>/dev/null | head -c 300)"
fi

stage pipeline_crops
NCROPS=$(python3 -c "import json;print(len(json.load(open('/tmp/pipeline_crops/labels.json'))))" 2>/dev/null || echo 0)
if [ "$NCROPS" -lt 1500 ] && [ "$(left)" -gt 3600 ]; then
  $T 1800 python -u -m bbocr_tpu.cli.make_pipeline_crops --pages 400 \
    --out /tmp/pipeline_crops > /tmp/train_logs/crops_chip.log 2>&1
  log "crops regen: $(tail -1 /tmp/train_logs/crops_chip.log)"
fi

stage crnn_r5
# reserve: covers screens 2x1200 + full eval 2700 + promote + slack = 5700s
# measured chip rate ~273 crops/s at batch 384 -> ~0.71 steps/s; keep 0.6
# as the planning rate so the TERM-save path is the backstop, not the plan.
TRAIN_S=$(( $(left) - 5700 ))
STEPS=$(python3 -c "print(max(500, min(8000, int($TRAIN_S * 0.6))))")
if [ "$TRAIN_S" -gt 900 ]; then
  log "crnn retrain: $STEPS steps in ${TRAIN_S}s budget"
  $T $TRAIN_S python -u -m bbocr_tpu.cli.train --component crnn \
    --steps $STEPS --batch 384 --width 64,128,256,384,512 --lr 2.5e-4 \
    --schedule cosine --warmup 100 --init-from checkpoints/crnn.npz \
    --pipeline-crops /tmp/pipeline_crops:0.2 --val-real data/real_crops \
    --data-threads 8 --out /tmp/ckpt_r5 --save-every 250 --log-every 50 \
    > /tmp/train_logs/crnn_r5.log 2>&1
  cp /tmp/ckpt_r5/crnn.npz checkpoints/candidates/crnn_r5.npz 2>/dev/null
  cp /tmp/ckpt_r5/crnn_best_real.npz checkpoints/candidates/crnn_r5_best_real.npz 2>/dev/null
else
  log "no time for crnn retrain (left $(left)s)"
fi

stage screen
COVERS="--books covers/book1 covers/book2 covers/book4 covers/book5 covers/book6"
for v in crnn crnn_best_real; do
  [ -f /tmp/ckpt_r5/$v.npz ] || continue
  [ -f $STOP ] && exit 0
  $T 1200 python -u -m bbocr_tpu.cli.evaluate_real $COVERS \
    --crnn /tmp/ckpt_r5/$v.npz --out /tmp/eval_r5_${v}_covers.json \
    > /tmp/eval_r5_${v}_covers.log 2>&1
  cp /tmp/eval_r5_${v}_covers.json data/evals/ 2>/dev/null
done
PICK=$(python3 - <<'EOF'
import json, os
def rec(p):
    try:
        d = json.load(open(p))
        return (d.get("tpu_mean_word_recall_on_paired", -1),
                -d.get("tpu_mean_phrase_cer_on_paired", 9))
    except Exception:
        return (-1, -9)
a = rec("/tmp/eval_r5_crnn_covers.json")
b = rec("/tmp/eval_r5_crnn_best_real_covers.json")
if max(a, b)[0] <= 0:
    print("")
elif b > a and os.path.exists("/tmp/ckpt_r5/crnn_best_real.npz"):
    print("/tmp/ckpt_r5/crnn_best_real.npz")
else:
    print("/tmp/ckpt_r5/crnn.npz")
EOF
)
log "PICK=$PICK"

stage full_eval_promote
if [ -n "$PICK" ] && [ "$(left)" -gt 2800 ]; then
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --crnn "$PICK" --out /tmp/eval_r5_full.json > /tmp/eval_r5_full.log 2>&1
  bash scripts/promote_cpu_hedge.sh "$PICK" /tmp/eval_r5_full.json \
    eval_r5_chip_full.json crnn_r5_winner.npz >> $LOG 2>&1 \
    || log "guard declined promotion"
fi

stage craft_lite
if [ "$(left)" -gt 7200 ]; then
  $T 5400 python -u -m bbocr_tpu.cli.train --component craft --arch lite \
    --steps 4000 --batch 16 --page-h 256,384 --page-w 192,256 --lr 2e-4 \
    --schedule cosine --warmup 100 --neg-ratio 4 \
    --distill-from checkpoints/craft.npz \
    --data-threads 8 --out /tmp/ckpt_craft_lite --save-every 500 --log-every 50 \
    > /tmp/train_logs/craft_lite.log 2>&1
  cp /tmp/ckpt_craft_lite/craft.npz checkpoints/candidates/craft_lite.npz 2>/dev/null
  stage craft_lite_ab
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --craft /tmp/ckpt_craft_lite/craft.npz --out /tmp/eval_r5_lite.json \
    > /tmp/eval_r5_lite.log 2>&1
  cp /tmp/eval_r5_lite.json data/evals/eval_r5_lite.json 2>/dev/null
fi

stage rebench
if [ "$(left)" -gt 1500 ]; then
  $T 1400 python -u bench.py > /tmp/bench_r5_tpu2.json 2> /tmp/bench_r5_tpu2_side.json
  cp /tmp/bench_r5_tpu2.json data/evals/bench_r5_tpu2.json 2>/dev/null
  cp /tmp/bench_r5_tpu2_side.json data/evals/bench_r5_tpu2_side.json 2>/dev/null
fi

touch /tmp/CHAIN_R5_DONE
log "CHAIN R5 DONE (left $(left)s)"

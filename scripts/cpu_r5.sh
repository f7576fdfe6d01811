#!/bin/bash
# Round-5 CPU-side chain (post-reboot): the reboot killed the cpu2
# continuation trainer and wiped /tmp/pipeline_crops. While the chip is
# down this keeps the lone host core working (round-4 VERDICT #1
# fallback: "run the next CPU-hedge increment ... don't idle"):
#   1. regenerate a small pipeline-crops corpus on CPU (120 pages —
#      enough for 0.2-frac mixing at CPU step counts; the chip chain
#      regenerates the full 400-page corpus if it gets the chip)
#   2. continuation fine-tune from the promoted hedge (checkpoints/
#      crnn.npz), best_real gating on data/real_crops; a watchdog TERMs
#      the trainer the moment the chip chain reports TPU BACK
#   3. covers screen -> full-corpus eval -> promotion THROUGH
#      scripts/promote_cpu_hedge.sh (baseline = best committed eval)
# touch /tmp/STOP_CHAIN_CPU_R5 to stop at the next boundary.
cd /root/repo
STOP=/tmp/STOP_CHAIN_CPU_R5
LOG=/tmp/chain_cpu_r5.log
log(){ echo "$1 $(date)" >> $LOG; }
stage(){ if [ -f $STOP ]; then log "STOP before $1"; exit 0; fi; log "stage $1"; }
export JAX_PLATFORMS=cpu
mkdir -p data/evals checkpoints/candidates /tmp/train_logs

stage crops_cpu
if [ ! -f /tmp/pipeline_crops/labels.json ]; then
  timeout --signal=TERM --kill-after=120 5400 \
    python -u -m bbocr_tpu.cli.make_pipeline_crops --pages 120 \
    --out /tmp/pipeline_crops > /tmp/train_logs/crops_cpu.log 2>&1
  log "crops: $(tail -1 /tmp/train_logs/crops_cpu.log)"
fi
[ -f /tmp/TPU_BACK ] && { log "chip returned during crops; yielding"; exit 0; }

stage train_cpu2
python -u -m bbocr_tpu.cli.train --component crnn \
  --steps 4000 --batch 64 --width 64,128,256,384 --lr 1.2e-4 \
  --schedule cosine --warmup 50 --init-from checkpoints/crnn.npz \
  --pipeline-crops /tmp/pipeline_crops:0.2 --val-real data/real_crops \
  --data-threads 2 --out /tmp/ckpt_crnn_cpu2 --save-every 250 --log-every 50 \
  > /tmp/train_logs/crnn_cpu2_r5.log 2>&1 &
TPID=$!
echo $TPID > /tmp/train_cpu2.pid
log "cpu2 trainer pid $TPID"
while kill -0 $TPID 2>/dev/null; do
  if [ -f /tmp/TPU_BACK ] || [ -f $STOP ]; then
    log "TERM cpu2 trainer (chip back or stop requested)"
    kill -TERM $TPID 2>/dev/null
    # trainer saves at the next step boundary; give it time
    for i in $(seq 60); do kill -0 $TPID 2>/dev/null || break; sleep 5; done
    break
  fi
  sleep 30
done
wait $TPID 2>/dev/null
cp /tmp/ckpt_crnn_cpu2/crnn_best_real.npz checkpoints/candidates/crnn_r5cpu2_best_real.npz 2>/dev/null
[ -f /tmp/TPU_BACK ] && { log "yield to chip chain after trainer save"; exit 0; }

stage screen
CAND=/tmp/ckpt_crnn_cpu2/crnn_best_real.npz
if [ ! -f "$CAND" ]; then log "no best_real candidate"; exit 0; fi
timeout --signal=TERM --kill-after=120 3600 \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --books covers/book1 covers/book2 covers/book4 covers/book5 covers/book6 \
  --crnn "$CAND" --out /tmp/eval_cpu2_covers.json > /tmp/eval_cpu2_covers.log 2>&1
cp /tmp/eval_cpu2_covers.json data/evals/eval_r5_cpu2_covers.json 2>/dev/null
COV=$(python3 -c "import json;print(json.load(open('/tmp/eval_cpu2_covers.json')).get('tpu_mean_word_recall_on_paired'))" 2>/dev/null)
BASE=$(python3 - <<'EOF'
import glob, json
best = 0.112
for p in ["data/evals/eval_r3_shipped.json"] + sorted(glob.glob("data/evals/eval_r[45]*cpu*.json")) + sorted(glob.glob("data/evals/eval_r5_chip*.json")):
    try:
        c = json.load(open(p)).get("tpu_mean_word_recall_on_paired")
    except Exception:
        continue
    if c is not None and c > best:
        best = c
print(best)
EOF
)
log "cpu2 covers paired recall=$COV vs committed baseline=$BASE"
BEATS=$(python3 -c "print(1 if float('${COV:-0}' or 0) > float('${BASE:-1}') else 0)" 2>/dev/null)
if [ "$BEATS" != "1" ]; then
  log "cpu2 candidate does not beat the baseline; keeping current crnn.npz"
  touch /tmp/CHAIN_CPU_R5_DONE
  exit 0
fi

stage full_eval_promote
timeout --signal=TERM --kill-after=120 7200 \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --crnn "$CAND" --out /tmp/eval_cpu2_full.json > /tmp/eval_cpu2_full.log 2>&1
bash scripts/promote_cpu_hedge.sh "$CAND" /tmp/eval_cpu2_full.json \
  eval_r5_cpu2_full.json crnn_r5cpu2_best_real.npz >> $LOG 2>&1 \
  || log "guard declined promotion"
touch /tmp/CHAIN_CPU_R5_DONE
log "CHAIN CPU R5 DONE"

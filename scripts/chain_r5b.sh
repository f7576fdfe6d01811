#!/bin/bash
# Round-5b chip chain — the fresh window after the 14:05 guard window
# closed. The r5 chain landed the insurance bench, the budget-boxed CRNN
# retrain (promoted, full-corpus 0.322/0.432), and the books-set latency
# number; its craft_lite stage was skipped under the 7200s floor. This
# chain runs lite-first:
#   1. CRAFTLite distill 4k steps (cap 5400s, TERM-saves at boundaries)
#   2. lite recall A/B: covers screen + full-corpus eval with the lite
#      detector; promotion THROUGH scripts/promote_craft_lite.sh
#   3. detect-latency evidence: bench with the promoted stack
#   4. CRNN continuation from the promoted crnn.npz, steps = f(left)
#   5. covers screen + full eval + guarded promote (eval_r5b names)
#   6. final rebench
# touch /tmp/STOP_CHAIN_R5B to stop at the next boundary.
cd /root/repo
STOP=/tmp/STOP_CHAIN_R5B
LOG=/tmp/chain_r5b.log
log(){ echo "$1 $(date)" >> $LOG; }
stage(){ if [ -f $STOP ]; then log "STOP before $1"; exit 0; fi; log "stage $1"; }
T="timeout --signal=TERM --kill-after=180"
# keep in sync with scripts/round_end_guard.sh T_TERM
T_TERM_EPOCH=$(date -u -d "2026-08-19 19:00" +%s)
left(){ echo $(( T_TERM_EPOCH - $(date -u +%s) )); }
mkdir -p data/evals checkpoints/candidates /tmp/train_logs

stage probe
timeout 600 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" > /tmp/chain_r5b_probe.log 2>&1 || { log "TPU DOWN at launch"; exit 1; }
log "TPU up (left $(left)s)"

stage craft_lite
if [ "$(left)" -gt 3000 ]; then
  CAP=$(( $(left) > 13000 ? 5400 : $(left) - 7600 ))
  [ "$CAP" -lt 900 ] && CAP=900
  log "craft lite distill: cap ${CAP}s"
  $T $CAP python -u -m bbocr_tpu.cli.train --component craft --arch lite \
    --steps 4000 --batch 16 --page-h 256,384 --page-w 192,256 --lr 2e-4 \
    --schedule cosine --warmup 100 --neg-ratio 4 \
    --distill-from checkpoints/craft.npz \
    --data-threads 8 --out /tmp/ckpt_craft_lite --save-every 250 --log-every 50 \
    > /tmp/train_logs/craft_lite.log 2>&1
  cp /tmp/ckpt_craft_lite/craft.npz checkpoints/candidates/craft_lite_raw.npz 2>/dev/null
  log "craft lite done: $(grep -c '^step' /tmp/train_logs/craft_lite.log 2>/dev/null) step lines"
fi

stage craft_lite_ab
COVERS="--books covers/book1 covers/book2 covers/book4 covers/book5 covers/book6"
if [ -f /tmp/ckpt_craft_lite/craft.npz ] && [ "$(left)" -gt 1500 ]; then
  $T 1200 python -u -m bbocr_tpu.cli.evaluate_real $COVERS \
    --craft /tmp/ckpt_craft_lite/craft.npz \
    --out /tmp/eval_r5_lite_covers.json > /tmp/eval_r5_lite_covers.log 2>&1
  cp /tmp/eval_r5_lite_covers.json data/evals/ 2>/dev/null
  log "lite covers: $(head -c 200 /tmp/eval_r5_lite_covers.json 2>/dev/null)"
fi
if [ -f /tmp/ckpt_craft_lite/craft.npz ] && [ "$(left)" -gt 3000 ]; then
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --craft /tmp/ckpt_craft_lite/craft.npz \
    --out /tmp/eval_r5_lite_full.json > /tmp/eval_r5_lite_full.log 2>&1
  bash scripts/promote_craft_lite.sh /tmp/ckpt_craft_lite/craft.npz \
    /tmp/eval_r5_lite_full.json eval_r5_lite_full.json >> $LOG 2>&1 \
    || log "lite guard declined promotion"
fi

stage lite_bench
if [ "$(left)" -gt 1600 ]; then
  $T 1500 python -u bench.py > /tmp/bench_r5b_lite.json 2> /tmp/bench_r5b_lite_side.json
  cp /tmp/bench_r5b_lite.json data/evals/bench_r5b_lite.json 2>/dev/null
  cp /tmp/bench_r5b_lite_side.json data/evals/bench_r5b_lite_side.json 2>/dev/null
  log "lite bench: $(head -c 300 /tmp/bench_r5b_lite.json 2>/dev/null)"
fi

stage pipeline_crops
NCROPS=$(python3 -c "import json;print(len(json.load(open('/tmp/pipeline_crops/labels.json'))))" 2>/dev/null || echo 0)
if [ "$NCROPS" -lt 1500 ] && [ "$(left)" -gt 7000 ]; then
  $T 1500 python -u -m bbocr_tpu.cli.make_pipeline_crops --pages 400 \
    --out /tmp/pipeline_crops > /tmp/train_logs/crops_chip_r5b.log 2>&1
  log "crops regen: $(tail -1 /tmp/train_logs/crops_chip_r5b.log)"
fi

stage crnn_cont
# reserve: covers screens 2x1200 + full eval 2700 + promote + rebench + slack
TRAIN_S=$(( $(left) - 7200 ))
STEPS=$(python3 -c "print(max(500, min(8000, int($TRAIN_S * 0.6))))")
if [ "$TRAIN_S" -gt 900 ]; then
  log "crnn continuation: $STEPS steps in ${TRAIN_S}s budget"
  $T $TRAIN_S python -u -m bbocr_tpu.cli.train --component crnn \
    --steps $STEPS --batch 384 --width 64,128,256,384,512 --lr 1.5e-4 \
    --schedule cosine --warmup 100 --init-from checkpoints/crnn.npz \
    --pipeline-crops /tmp/pipeline_crops:0.2 --val-real data/real_crops \
    --data-threads 8 --out /tmp/ckpt_r5b --save-every 250 --log-every 50 \
    > /tmp/train_logs/crnn_r5b.log 2>&1
  cp /tmp/ckpt_r5b/crnn.npz checkpoints/candidates/crnn_r5b.npz 2>/dev/null
  cp /tmp/ckpt_r5b/crnn_best_real.npz checkpoints/candidates/crnn_r5b_best_real.npz 2>/dev/null
else
  log "no time for crnn continuation (left $(left)s)"
fi

stage screen
for v in crnn crnn_best_real; do
  [ -f /tmp/ckpt_r5b/$v.npz ] || continue
  [ -f $STOP ] && exit 0
  $T 1200 python -u -m bbocr_tpu.cli.evaluate_real $COVERS \
    --crnn /tmp/ckpt_r5b/$v.npz --out /tmp/eval_r5b_${v}_covers.json \
    > /tmp/eval_r5b_${v}_covers.log 2>&1
  cp /tmp/eval_r5b_${v}_covers.json data/evals/ 2>/dev/null
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
a = rec("/tmp/eval_r5b_crnn_covers.json")
b = rec("/tmp/eval_r5b_crnn_best_real_covers.json")
if max(a, b)[0] <= 0:
    print("")
elif b > a and os.path.exists("/tmp/ckpt_r5b/crnn_best_real.npz"):
    print("/tmp/ckpt_r5b/crnn_best_real.npz")
else:
    print("/tmp/ckpt_r5b/crnn.npz")
EOF
)
log "PICK=$PICK"

stage full_eval_promote
if [ -n "$PICK" ] && [ "$(left)" -gt 2900 ]; then
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --crnn "$PICK" --out /tmp/eval_r5b_full.json > /tmp/eval_r5b_full.log 2>&1
  bash scripts/promote_cpu_hedge.sh "$PICK" /tmp/eval_r5b_full.json \
    eval_r5b_chip_full.json crnn_r5b_winner.npz >> $LOG 2>&1 \
    || log "guard declined promotion"
fi

stage rebench
if [ "$(left)" -gt 1500 ]; then
  $T 1400 python -u bench.py > /tmp/bench_r5b_final.json 2> /tmp/bench_r5b_final_side.json
  cp /tmp/bench_r5b_final.json data/evals/bench_r5b_final.json 2>/dev/null
  cp /tmp/bench_r5b_final_side.json data/evals/bench_r5b_final_side.json 2>/dev/null
fi

touch /tmp/CHAIN_R5B_DONE
log "CHAIN R5B DONE (left $(left)s)"

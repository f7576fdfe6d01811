#!/bin/bash
# Round-4 TIME-BOXED fallback chain, for a late TPU return (the 08-17 outage
# ran >16h into round 4). Runs ONLY the highest-value chip legs, sized by
# env knobs, so a short chip window still produces the round's core
# artifacts: a retrained CRNN, its eval, a guarded promotion, and a bench.
#
# Usage (after `touch /tmp/STOP_CHAIN /tmp/STOP_CHAIN_R4 /tmp/STOP_CHAIN_R4B`
# and confirming the queued chains exited):
#   CRNN_STEPS=8000 nohup bash scripts/chain_r4min.sh > /tmp/chain_r4min.out 2>&1 &
#   echo $! > /tmp/chain_r4min.pid
# Knobs:
#   CRNN_STEPS   retrain steps (default 8000; 0 skips the retrain entirely)
#   SKIP_BENCH   =1 skips the bench legs (driver runs its own at round end)
# Stop: touch /tmp/STOP_CHAIN_R4MIN (next stage boundary).
# TERM-first timeouts ONLY (a KILL mid-compile downed the backend on 08-17).
cd /root/repo
STOP=/tmp/STOP_CHAIN_R4MIN
LOG=/tmp/chain_r4min.log
log(){ echo "$1 $(date)" >> $LOG; }
stage(){ if [ -f $STOP ]; then log "STOP before $1"; exit 0; fi; log "stage $1"; }
T="timeout --signal=TERM --kill-after=180"
CRNN_STEPS=${CRNN_STEPS:-8000}
mkdir -p data/evals checkpoints/candidates /tmp/train_logs

# probe until the chip answers
while true; do
  [ -f $STOP ] && exit 0
  timeout 600 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" > /tmp/chain_r4min_probe.log 2>&1 && break
  log "tpu still down"
  sleep 120
done
log "TPU up (r4min, CRNN_STEPS=$CRNN_STEPS)"

if [ "$CRNN_STEPS" -gt 0 ]; then
  stage crnn_retrain
  # budget: ~28 min per 1000 steps at batch 384 (round-2/3 logs)
  TMO=$(( 600 + CRNN_STEPS * 2 ))
  $T $TMO python -u -m bbocr_tpu.cli.train --component crnn \
    --steps "$CRNN_STEPS" --batch 384 --width 64,128,256,384,512 --lr 2.5e-4 \
    --schedule cosine --warmup 100 --init-from checkpoints/crnn.npz \
    --pipeline-crops /tmp/pipeline_crops:0.2 --val-real data/real_crops \
    --data-threads 8 --out /tmp/ckpt_r4min --save-every 500 --log-every 50 \
    > /tmp/train_logs/crnn_r4min.log 2>&1
  cp /tmp/ckpt_r4min/crnn.npz checkpoints/candidates/crnn_r4min.npz 2>/dev/null
  cp /tmp/ckpt_r4min/crnn_best_real.npz checkpoints/candidates/crnn_r4min_best_real.npz 2>/dev/null

  stage eval_candidates
  for leg in crnn:final crnn_best_real:br; do
    ck="/tmp/ckpt_r4min/${leg%%:*}.npz"; tag="${leg##*:}"
    [ -f "$ck" ] || continue
    [ -f $STOP ] && exit 0
    $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
      --craft checkpoints/craft.npz --crnn "$ck" \
      --out "/tmp/eval_r4min_${tag}.json" > "/tmp/eval_r4min_${tag}.log" 2>&1
    cp "/tmp/eval_r4min_${tag}.json" "data/evals/eval_r4min_${tag}.json" 2>/dev/null
  done

  stage promote
  python3 - <<'EOF' >> $LOG 2>&1
import json, os, shutil
def rec(p):
    try:
        d = json.load(open(p))
        return (d.get("tpu_mean_word_recall_on_paired") or 0,
                d.get("tpu_mean_word_recall") or 0)
    except Exception:
        return (0, 0)
base = rec("data/evals/eval_r3_shipped.json")
cands = {
    "checkpoints/candidates/crnn_r4min.npz": "data/evals/eval_r4min_final.json",
    "checkpoints/candidates/crnn_r4min_best_real.npz": "data/evals/eval_r4min_br.json",
}
best_ck, best = None, base
for ck, ev in cands.items():
    if not (os.path.exists(ck) and os.path.exists(ev)):
        continue
    r = rec(ev)
    if r > best:
        best_ck, best = ck, r
if best_ck:
    shutil.copy("checkpoints/crnn.npz", "checkpoints/crnn_prev.npz")
    shutil.copy(best_ck, "checkpoints/crnn.npz")
    print(f"PROMOTED CRNN {best_ck} (paired-covers/all recall {best} > {base})")
else:
    print(f"CRNN NOT promoted (no candidate beats {base})")
EOF
else
  # no retrain window: at least capture an on-chip eval of the shipped stack
  stage eval_shipped_onchip
  $T 2700 python -u -m bbocr_tpu.cli.evaluate_real \
    --out /tmp/eval_r4_shipped_chip.json > /tmp/eval_r4_shipped_chip.log 2>&1
  cp /tmp/eval_r4_shipped_chip.json data/evals/eval_r4_shipped_chip.json 2>/dev/null
fi

if [ "${SKIP_BENCH:-0}" != "1" ]; then
  stage bench_real_mix
  $T 3600 python bench.py > data/evals/bench_r4.json 2> data/evals/bench_r4_side.json
  log "bench rc=$?: $(cat data/evals/bench_r4.json)"

  stage bench_books
  $T 2400 env BENCH_SET=books python bench.py \
    > data/evals/bench_r4_books.json 2> data/evals/bench_r4_books_side.json
  log "books bench rc=$?: $(cat data/evals/bench_r4_books.json)"
fi

touch /tmp/CHAIN_R4MIN_DONE
log "CHAIN R4MIN DONE (chip free)"

#!/bin/bash
# Round-5 CPU-hedge follow-up: when the cpu2 continuation fine-tune
# (/tmp/ckpt_crnn_cpu2, launched round 4 from the hedge best_real ckpt)
# finishes, evaluate its best_real candidate and promote it THROUGH the
# guard (scripts/promote_cpu_hedge.sh) — never around it (round-4 VERDICT
# weak #2). Runs entirely on the host CPU.
#
# Yields to the chip: if the trainer was stopped because the TPU came
# back (the launcher watchdog TERMs it on "TPU BACK" in the chain log),
# this exits immediately — the chip chain owns the lone host core and the
# chip candidates supersede the CPU hedge anyway.
# touch /tmp/STOP_CHAIN_CPU2 to stop at the next stage boundary.
cd /root/repo
STOP=/tmp/STOP_CHAIN_CPU2
LOG=/tmp/chain_cpu2.log
log(){ echo "$1 $(date)" >> $LOG; }
export JAX_PLATFORMS=cpu
mkdir -p data/evals checkpoints/candidates

TPID=$(cat /tmp/train_cpu2.pid 2>/dev/null)
while [ -n "$TPID" ] && kill -0 "$TPID" 2>/dev/null; do
  [ -f $STOP ] && exit 0
  sleep 60
done
if grep -q "TPU BACK" /tmp/chain_v10.log 2>/dev/null; then
  log "trainer stopped because the chip returned; yielding to the chip chain"
  exit 0
fi
CAND=/tmp/ckpt_crnn_cpu2/crnn_best_real.npz
if [ ! -f "$CAND" ]; then
  log "no cpu2 best_real candidate; nothing to do"
  exit 0
fi
log "cpu2 trainer done; evaluating $CAND ($(cat /tmp/ckpt_crnn_cpu2/best_real.json 2>/dev/null))"

# Cheap screen first: paired covers only (~8 min CPU). Full corpus
# (~45 min contended) only if the screen beats the committed baseline.
[ -f $STOP ] && exit 0
timeout --signal=TERM --kill-after=120 3600 \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --books covers/book1 covers/book2 covers/book4 covers/book5 covers/book6 \
  --crnn "$CAND" --out /tmp/eval_cpu2_covers.json > /tmp/eval_cpu2_covers.log 2>&1
COV=$(python3 -c "import json;print(json.load(open('/tmp/eval_cpu2_covers.json')).get('tpu_mean_word_recall_on_paired'))" 2>/dev/null)
BASE=$(python3 - <<'EOF'
import glob, json
best = 0.112
for p in ["data/evals/eval_r3_shipped.json"] + sorted(glob.glob("data/evals/eval_r4_cpu*.json")):
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
  cp /tmp/eval_cpu2_covers.json data/evals/eval_r5_cpu2_covers.json 2>/dev/null
  touch /tmp/CHAIN_CPU2_DONE
  exit 0
fi

[ -f $STOP ] && exit 0
log "screen passed; running full-corpus eval"
timeout --signal=TERM --kill-after=120 7200 \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --crnn "$CAND" --out /tmp/eval_cpu2_full.json > /tmp/eval_cpu2_full.log 2>&1
cp /tmp/eval_cpu2_covers.json data/evals/eval_r5_cpu2_covers.json 2>/dev/null

[ -f $STOP ] && exit 0
log "promoting through the guard"
bash scripts/promote_cpu_hedge.sh "$CAND" /tmp/eval_cpu2_full.json \
  eval_r5_cpu2_full.json crnn_r5cpu2_best_real.npz >> $LOG 2>&1 \
  || log "guard declined promotion"
touch /tmp/CHAIN_CPU2_DONE
log "CHAIN CPU2 DONE"

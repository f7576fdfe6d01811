#!/bin/bash
# Round-4 follow-up chip legs, launched after scripts/chain_r4.sh touches
# /tmp/CHAIN_R4_DONE (chip free):
#   A. quality-max eval of the promoted stack (coarse detect + beam decode)
#   B. books-set bench (800x600 operating point; fast-path p50 is in the
#      side metrics) — the real-mix bench already ran in chain_r4
# The wire-default flip and the VLM go/no-go (scripts/vlm_go_nogo.sh, only
# if >=4h chip time remain) stay MANUAL decisions on the eval evidence.
# TERM-first timeouts ONLY (a KILL mid-compile downed the backend on 08-17).
cd /root/repo
T="timeout --signal=TERM --kill-after=180"
LOG=/tmp/chain_r4b.log
log(){ echo "$1 $(date)" >> $LOG; }
mkdir -p data/evals

while [ ! -f /tmp/CHAIN_R4_DONE ]; do
  [ -f /tmp/STOP_CHAIN_R4B ] && exit 0
  sleep 60
done

log "stage qmax_eval"
$T 3600 env BB_OCR_DETECT_COARSE=2 BB_OCR_DECODER=beam \
  python -u -m bbocr_tpu.cli.evaluate_real \
  --out /tmp/eval_r4_qmax.json > /tmp/eval_r4_qmax.log 2>&1
cp /tmp/eval_r4_qmax.json data/evals/eval_r4_qmax.json 2>/dev/null
log "qmax rc=$?"

log "stage books_bench"
$T 2400 env BENCH_SET=books python bench.py \
  > data/evals/bench_r4_books.json 2> data/evals/bench_r4_books_side.json
log "books bench rc=$?: $(cat data/evals/bench_r4_books.json)"

touch /tmp/CHAIN_R4B_DONE
log "CHAIN R4B DONE"

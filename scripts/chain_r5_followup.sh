#!/bin/bash
# Round-5 follow-up: runs ONLY if chain_r5.sh finishes with chip slack.
# One job: the 800x600 books-set bench for the p50_fast latency evidence
# (round-4 VERDICT item 5 — "<150 ms measured on 800x600 pages, or the
# measured number"). The real-mix bench artifacts already exist
# (bench_r5_tpu*.json) and the chain's rebench stage re-measures the
# promoted stack, so this leg is strictly additive.
#
# Guard discipline: never touches the chip after the round-end guard's
# STOP time (scripts/round_end_guard.sh) — the driver needs a free chip
# for the official BENCH_r05 run.
cd /root/repo
LOG=/tmp/chain_r5_followup.log
log(){ echo "$1 $(date)" >> $LOG; }
T="timeout --signal=TERM --kill-after=180"
T_STOP_EPOCH=$(date -u -d "2026-08-19 13:50" +%s)
left(){ echo $(( T_STOP_EPOCH - $(date -u +%s) )); }

log "waiting for CHAIN_R5_DONE"
while [ ! -f /tmp/CHAIN_R5_DONE ]; do
  [ -f /tmp/STOP_CHAIN_R5 ] && { log "STOP sentinel; exiting"; exit 0; }
  [ "$(left)" -lt 120 ] && { log "no slack left; exiting"; exit 0; }
  sleep 30
done

if [ "$(left)" -gt 900 ]; then
  log "books bench (left $(left)s)"
  BENCH_SET=books BENCH_PHOTOS=48 $T $(( $(left) - 120 )) \
    python -u bench.py > /tmp/bench_r5_books.json 2> /tmp/bench_r5_books_side.json
  cp /tmp/bench_r5_books.json data/evals/bench_r5_books.json 2>/dev/null
  cp /tmp/bench_r5_books_side.json data/evals/bench_r5_books_side.json 2>/dev/null
  log "books bench done: $(head -c 200 /tmp/bench_r5_books.json 2>/dev/null)"
else
  log "not enough slack for books bench (left $(left)s)"
fi
log "FOLLOWUP DONE"

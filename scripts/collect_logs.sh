#!/bin/bash
# Snapshot the run logs that normally live only in /tmp into the repo so
# outage rounds still leave a committed audit trail (round-4 VERDICT #9):
# chain logs (probe loops, stage transitions, promotion verdicts) and
# training logs. Size-capped: each file is tail-trimmed to 400 KB.
cd /root/repo
DEST=data/logs
mkdir -p $DEST
for f in /tmp/chain_*.log /tmp/train_logs/*.log /tmp/eval_*.log \
         /tmp/vlm_eval_*.log; do
  [ -f "$f" ] || continue
  out="$DEST/$(basename "$f")"
  # the XLA:CPU AOT feature-mismatch warning repeats thousands of times
  # and carries no information beyond its first occurrence
  grep -v "cpu_aot_loader" "$f" | tail -c 400000 > "$out"
done
ls -la $DEST

#!/bin/bash
# Round-end guard (round 5): the driver runs bench.py at round end; a
# chain stage still holding the chip (or the lone CPU core) at that
# moment would contaminate BENCH_r05. Two phases:
#   1. T_STOP:  touch every chain STOP sentinel so no NEW stage starts
#   2. T_TERM:  SIGTERM any still-running bbocr_tpu.cli.train process
#      (cli/train traps TERM: saves at the next step boundary and exits
#      cleanly — round-3 lesson: TERM only, never KILL, a KILL
#      mid-compile downed the axon backend for hours)
# Trainer matching is strict argv ('-m', 'bbocr_tpu.cli.train' as
# adjacent tokens of a python process) — NOT a pattern grep — so this
# session's own shell can never match.
LOG=/tmp/round_end_guard.log
log(){ echo "$1 $(date)" >> $LOG; }
# Re-armed 14:30 UTC for the r5b window (fresh builder session with a
# ~5h budget; driver bench expected no earlier than ~19:15 UTC).
T_STOP="2026-08-19 18:45"
T_TERM="2026-08-19 19:00"

while [ "$(date -u +%s)" -lt "$(date -u -d "$T_STOP" +%s)" ]; do sleep 60; done
touch /tmp/STOP_CHAIN /tmp/STOP_CHAIN_R4 /tmp/STOP_CHAIN_R4B /tmp/STOP_CHAIN_CPU2 \
      /tmp/STOP_CHAIN_R5 /tmp/STOP_CHAIN_CPU_R5 /tmp/STOP_CHAIN_R5B
log "STOP sentinels touched"

while [ "$(date -u +%s)" -lt "$(date -u -d "$T_TERM" +%s)" ]; do sleep 60; done
python3 - <<'EOF' >> $LOG 2>&1
import os, signal

me = os.getpid()
ancestors = set()
pid = me
while pid > 1:
    try:
        with open(f"/proc/{pid}/stat") as f:
            pid = int(f.read().split()[3])
        ancestors.add(pid)
    except Exception:
        break
for d in os.listdir("/proc"):
    if not d.isdigit() or int(d) in ancestors or int(d) == me:
        continue
    try:
        argv = open(f"/proc/{d}/cmdline", "rb").read().decode().split("\0")
    except Exception:
        continue
    if not argv or "python" not in os.path.basename(argv[0]):
        continue
    for i, a in enumerate(argv[:-1]):
        if a == "-m" and argv[i + 1] == "bbocr_tpu.cli.train":
            print(f"TERM trainer pid {d}: {' '.join(argv[:6])}")
            os.kill(int(d), signal.SIGTERM)
            break
EOF
log "round-end guard done"

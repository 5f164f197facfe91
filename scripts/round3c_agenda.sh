#!/bin/bash
# Round-3 session-C TPU agenda, run after the config5 finishing pass frees
# the chip.  Stages (each behind the deadline check so the driver's
# end-of-round bench always finds a free chip and warm cache):
#   1. config5_report.py   — density image + final SUMMARY (needs the chip
#                            for the 1e6 projection kernel)
#   2. window_sweep rows 0,6,7,8 — control + the untested W=128 x wg=64/128
#                            cells (item 10 follow-up)
#   3. evidence_runs.py    — graded configs 2-4 ledgers + plots
#   4. bench.py            — captures the round's numbers INCLUDING the new
#                            pm_every sweep entry, and re-warms the compile
#                            cache for the changed step HLO (the pm_every
#                            scan-phase input invalidated every cached step
#                            program)
#
# Usage: DEADLINE_EPOCH=<unix seconds> scripts/round3c_agenda.sh
set -u
cd /root/repo
LOG=/tmp/round3c.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}

note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }
left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

# wait for any running config5 pass to exit
while pids=$(ps -eo pid,cmd | grep 'config5_run\.py' | grep -v grep \
             | awk '{print $1}'); [ -n "$pids" ]; do
  note "waiting on config5 ($pids)"
  sleep 60
done
note "chip free"

if [ "$(left)" -gt 3000 ]; then
  note "report START"
  timeout 1800 python scripts/config5_report.py > /tmp/c5_report.log 2>&1
  note "report END rc=$?"
fi

if [ "$(left)" -gt 3600 ]; then
  note "window_sweep START"
  SWEEP_ROWS=0,6,7,8 timeout 2700 python scripts/window_sweep.py --steps 12 \
    > /tmp/window_sweep2.log 2>&1
  note "window_sweep END rc=$?"
fi

if [ "$(left)" -gt 2700 ]; then
  note "evidence_runs START"
  timeout 2700 python scripts/evidence_runs.py --max-wall 2100 \
    > /tmp/evidence_runs.log 2>&1
  note "evidence_runs END rc=$?"
fi

if [ "$(left)" -gt 300 ]; then
  note "bench START"
  timeout $(( $(left) - 60 )) python bench.py > /tmp/bench_final.log 2>&1
  note "bench END rc=$?"
fi
note "agenda complete"

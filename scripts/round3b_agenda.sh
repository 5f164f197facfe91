#!/bin/bash
# Round-3 phase B TPU agenda: serialize the remaining chip work behind the
# running config5 collapse (PID in /tmp/config5.pid).  Stages:
#   1. config5 resume passes until t_end reached / diverged / deadline
#   2. evidence_runs.py (graded configs 2-4 as ledgers + plots)
#   3. mesh_sweep.py (gravity-on mesh A/B; green tables now disk-cached)
#   4. bench.py (leaves the compile cache warm for the driver's final run)
# Every stage checks the hard deadline first so the driver's end-of-round
# bench finds a free chip and a warm cache.
#
# Usage: DEADLINE_EPOCH=<unix seconds> scripts/round3b_agenda.sh
set -u
cd /root/repo
LOG=/tmp/round3b.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH}

note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }
left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

# ---- stage 1: wait out / extend the running collapse ------------------
C5PID=$(cat /tmp/config5.pid 2>/dev/null || echo "")
if [ -n "$C5PID" ]; then
  note "waiting on config5 pid $C5PID"
  while kill -0 "$C5PID" 2>/dev/null; do sleep 60; done
  note "config5 pid $C5PID exited"
fi

c5_done() {
  python - <<'EOF'
import csv, sys
try:
    rows = list(csv.reader(open("docs/results/collapse1m/ledger.csv")))
    t = float(rows[-1][0])
except Exception:
    sys.exit(1)
sys.exit(0 if t >= 11.99 else 1)
EOF
}

for pass in 1 2 3; do
  [ -e /tmp/round3b_c5_abort ] && break
  c5_done && { note "config5 reached t_end"; break; }
  budget=$(( $(left) - 4500 ))   # reserve tail stages
  [ "$budget" -lt 1800 ] && { note "no budget for config5 pass $pass"; break; }
  note "config5 resume pass $pass (max-wall $budget)"
  timeout $(( budget + 300 )) python scripts/config5_run.py \
    --steps-per-seg 64 --max-wall "$budget" >> /tmp/config5_run.log 2>&1
  rc=$?
  note "config5 pass $pass rc=$rc"
  [ $rc -eq 2 ] && { touch /tmp/round3b_c5_abort; note "config5 DIVERGED"; }
done

# ---- stage 2: graded configs 2-4 evidence -----------------------------
if [ ! -e /tmp/round3b_done_evidence ] && [ "$(left)" -gt 3600 ]; then
  note "evidence_runs START"
  timeout 5400 python scripts/evidence_runs.py --max-wall 1500 \
    > /tmp/evidence_runs.log 2>&1
  note "evidence_runs END rc=$?"
  touch /tmp/round3b_done_evidence
fi

# ---- stage 3: gravity mesh sweep --------------------------------------
if [ ! -e /tmp/round3b_done_mesh ] && [ "$(left)" -gt 2400 ]; then
  note "mesh_sweep START"
  timeout $(( $(left) - 1500 )) python scripts/mesh_sweep.py --steps 10 \
    > /tmp/mesh_sweep2.log 2>&1
  note "mesh_sweep END rc=$?"
  touch /tmp/round3b_done_mesh
fi

# ---- stage 4: final bench (warms the cache for the driver) ------------
if [ "$(left)" -gt 600 ]; then
  note "bench START"
  timeout $(( $(left) - 60 )) python bench.py > /tmp/bench_final.log 2>&1
  note "bench END rc=$?"
fi
note "agenda complete"

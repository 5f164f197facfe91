#!/bin/bash
# Round-5 config-5 phase 2: the block-timestep A/B on the phase-1
# checkpoint (VERDICT r4 item 6), then the dense-phase resume to
# t >= 10.62 (1.2 t_ff) with the A/B winner (VERDICT r4 item 5).
# Usage: bash scripts/c5_phase2.sh [resume_budget_s]
set -u
cd /root/repo
BUDGET=${1:-4200}
LOG=/tmp/c5_phase2.log
note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

c5_t() {
  python3 - <<'EOF'
import csv
try:
    rows = list(csv.reader(open("docs/results/collapse1m/ledger.csv")))
    print(rows[-1][0])
except Exception:
    print("0")
EOF
}

note "A/B starting (ckpt t=$(c5_t))"
timeout 2400 python scripts/blockstep_ab.py --bins 4 --base-steps 2 \
  > /tmp/blockstep_ab.log 2>&1
rc=$?
note "A/B rc=$rc"
SPEEDUP=$(grep -oP 'binned advances simulation time \K[0-9.]+' \
  /tmp/blockstep_ab.log || echo 0)
note "A/B speedup=${SPEEDUP}x"

BINS=""
awk -v s="$SPEEDUP" 'BEGIN{exit !(s>=1.2)}' && BINS="--dt-bins 4"
note "resume mode: ${BINS:-global}"

T_STOP=10.62
DEADLINE=$(( $(date +%s) + BUDGET ))
for pass in 1 2 3 4 5 6; do
  t=$(c5_t)
  awk -v t="$t" 'BEGIN{exit !(t>=10.62)}' && { note "reached 1.2 t_ff at t=$t"; break; }
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 180 ] && { note "budget exhausted at t=$t"; break; }
  note "pass $pass from t=$t (left ${left}s)"
  timeout $(( left > 3000 ? 3000 : left )) \
    python scripts/config5_run.py $BINS --stop-t $T_STOP \
    --max-wall $(( (left > 3000 ? 3000 : left) - 120 )) --ckpt-every 4 \
    >> /tmp/config5_r5.log 2>&1
  rc=$?
  note "pass $pass rc=$rc (t now $(c5_t))"
  [ $rc -eq 2 ] && { note "DIVERGED - stopping"; break; }
  sleep 15
done
note "phase 2 done at t=$(c5_t)"

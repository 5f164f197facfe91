#!/bin/bash
# Round-5 config-5 phase 1: fresh exact-gravity run (W=1024/fetch=8448 +
# grav_overflow_items=65536) from t=0 until the dt collapse that marks the
# condensed-core phase (dt < 5e-4 or t >= 9.55), checkpointing every 8
# segments.  Phase 2 (scripts/blockstep_ab.py on the checkpoint, then the
# --dt-bins resume through sink formation) follows interactively.
# Retries through transient axon TPU-worker crashes.
set -u
cd /root/repo
LOG=/tmp/c5_phase1.log
note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

c5_state() {  # prints "t dt"
  python3 - <<'EOF'
import csv
try:
    rows = list(csv.reader(open("docs/results/collapse1m/ledger.csv")))
    print(rows[-1][0], rows[-1][1])
except Exception:
    print("0 1")
EOF
}

note "phase 1 fresh start"
rm -f docs/results/collapse1m/ledger.csv docs/results/collapse1m/checkpoint.npz
FRESH=--fresh
for pass in 1 2 3 4 5 6; do
  read -r t dt <<< "$(c5_state)"
  note "pass $pass from t=$t dt=$dt"
  awk -v t="$t" -v dt="$dt" 'BEGIN{exit !(t>=9.55 || (t>1 && dt<5e-4))}' \
    && { note "dense phase reached (t=$t dt=$dt) - phase 1 done"; break; }
  timeout 3000 python scripts/config5_run.py --max-wall 2800 --ckpt-every 8 \
    --stop-dt 5e-4 --stop-t 9.55 $FRESH >> /tmp/config5_r5.log 2>&1
  rc=$?
  FRESH=""
  read -r t dt <<< "$(c5_state)"
  note "pass $pass rc=$rc (now t=$t dt=$dt)"
  [ $rc -eq 2 ] && { note "DIVERGED - stopping"; break; }
  sleep 20
done
read -r t dt <<< "$(c5_state)"
note "phase 1 exit at t=$t dt=$dt"

#!/bin/bash
# Finish the 1e6 collapse evidence run: resume from the committed-path
# checkpoint (t=10.60) to T_END=12.0 in bounded passes, retrying through
# transient axon TPU-worker crashes (rc=1); stop on divergence (rc=2,
# check_health abort) or once the ledger reaches t_end.
set -u
cd /root/repo
LOG=/tmp/c5_finish.log
note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

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

for pass in 1 2 3 4; do
  c5_done && { note "config5 reached t_end"; break; }
  note "config5 resume pass $pass"
  timeout 9000 python scripts/config5_run.py --max-wall 8400 \
    >> /tmp/config5_prod.log 2>&1
  rc=$?
  note "config5 pass $pass rc=$rc"
  [ $rc -eq 2 ] && { note "config5 DIVERGED — stopping"; break; }
  sleep 30   # let a crashed worker restart before re-priming
done
note "c5_finish done"

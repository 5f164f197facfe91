#!/bin/bash
# Round-5 config-5 evidence rerun (VERDICT r4 item 5): fresh t=0 run with
# the exact short-range gravity settings (grav W=1024/fetch=8448 +
# grav_overflow_items=65536 — the audited 1.3%-residual plan plus the
# overflow worklist), retrying through transient axon TPU-worker crashes.
# Target: t >= 10.6 (1.2 t_ff) with the per-segment ledger; the report +
# window audit run afterwards.
set -u
cd /root/repo
LOG=/tmp/c5_r5.log
note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

c5_t() {
  python - <<'EOF'
import csv
try:
    rows = list(csv.reader(open("docs/results/collapse1m/ledger.csv")))
    print(rows[-1][0])
except Exception:
    print("0")
EOF
}

note "fresh start"
rm -f docs/results/collapse1m/ledger.csv docs/results/collapse1m/checkpoint.npz
FRESH=--fresh
for pass in 1 2 3 4 5 6; do
  t=$(c5_t)
  note "pass $pass starting from t=$t"
  awk -v t="$t" 'BEGIN{exit !(t>=10.6)}' && { note "reached 1.2 t_ff"; break; }
  timeout 5500 python scripts/config5_run.py --max-wall 5300 $FRESH \
    >> /tmp/config5_r5.log 2>&1
  rc=$?
  FRESH=""
  note "pass $pass rc=$rc (t now $(c5_t))"
  [ $rc -eq 2 ] && { note "DIVERGED - stopping"; break; }
  sleep 30
done
note "c5_round5 done at t=$(c5_t)"

#!/bin/bash
# Round-3 TPU agenda: serialize every TPU-gated deliverable so any tunnel
# window is spent in priority order, unattended.  Each stage is resumable /
# idempotent; a marker file in /tmp gates re-runs so the script itself can
# be restarted at any time.  Logs: /tmp/agenda_<stage>.log + /tmp/tpu_agenda.log.
#
# Stage order (VERDICT r2 priorities):
#   1. shakedown  - N=65536 gamma=1.1 f32/Pallas collapse-to-sinks (validates
#                   the physics chain before burning hours at 1e6)
#   2. mesh_sweep - gravity-on step time vs grav_grid (256^3 now compilable)
#   3. collapse1m - the graded config-5 evidence run (resumable segments)
#   4. window_sweep - SPH pair-kernel lane-waste A/B matrix
#   5. bench      - final headline + sweep, leaves the compile cache warm
set -u
cd /root/repo
LOG=/tmp/tpu_agenda.log

note() { echo "[$(date '+%H:%M:%S')] $*" >> "$LOG"; }

probe() { timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_tunnel() {
  while ! probe; do
    note "tunnel down, retrying in 120s"
    sleep 120
  done
  note "tunnel UP"
}

run_stage() {  # name timeout_s cmd...
  local name=$1 budget=$2; shift 2
  local marker=/tmp/agenda_done_$name
  [ -e "$marker" ] && { note "stage $name already done, skipping"; return 0; }
  wait_tunnel
  note "stage $name START (budget ${budget}s): $*"
  timeout "$budget" "$@" >> "/tmp/agenda_${name}.log" 2>&1
  local rc=$?
  note "stage $name END rc=$rc"
  # rc=0: done.  rc=124: budget spent (collapse1m manages its own wall and
  # is resumable -> still counts as done for this pass).  Other rc: tunnel
  # may have dropped mid-stage; leave the marker unset so a restart retries.
  if [ $rc -eq 0 ] || { [ $rc -eq 124 ] && [ "$name" = collapse1m ]; }; then
    touch "$marker"
  fi
  return $rc
}

run_stage shakedown 4200 python scripts/collapse_diag.py \
  --n 65536 --seg 32 --grav-grid 64 --t-end 12 --max-wall 3600 \
  --gamma 1.1 --kahan

run_stage mesh_sweep 2700 python scripts/mesh_sweep.py --steps 10

# Resumable: --max-wall bounds one pass; loop passes until t_end reached or
# the run aborts (rc=2 -> diverged; stop and keep the evidence).
if [ ! -e /tmp/agenda_done_collapse1m ]; then
  for pass in 1 2 3; do
    run_stage collapse1m 15000 python scripts/config5_run.py \
      --steps-per-seg 64 --max-wall 14400
    rc=$?
    [ $rc -eq 2 ] && { note "collapse1m DIVERGED (evidence kept)"; break; }
    grep -q "stopped at t=12" /tmp/agenda_collapse1m.log && break
    rm -f /tmp/agenda_done_collapse1m   # not finished: next pass resumes
  done
  touch /tmp/agenda_done_collapse1m
fi

run_stage window_sweep 3000 python scripts/window_sweep.py \
  --steps 12 --max-wall 2700

run_stage bench 2400 python bench.py

note "AGENDA COMPLETE"

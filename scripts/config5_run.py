"""Graded config 5 evidence run: 1e6-particle self-gravitating collapse.

The flagship capability demonstration (VERDICT round-1 item 3): a rotating
cold cloud (uniform ball R=50 AU, M=50 M_sun, rigid rotation beta ~ 0.15,
u=0.25 — the reference's Collapse.txt recipe scaled up 50x in N and 10x in
mass, Disc_ICs.py:1-41) collapses under TreePM self-gravity with variable
smoothing length until the density threshold creates sink particles
(SUMMER_SPH - Variable.f90:549-597) which then accrete.

Runs on the live backend in resumable segments; writes per-segment
diagnostics (conservation ledger) to docs/results/collapse1m/ledger.csv and
a checkpoint; scripts/config5_report.py turns the outputs into the plots +
summary committed as evidence.

Usage: python scripts/config5_run.py [--steps-per-seg 64] [--max-wall 5400]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from summersph_tpu.config import SimConfig
from summersph_tpu.diagnostics import measure
from summersph_tpu.integrate import (SimulationDiverged, check_health, prime,
                                     run_steps, warn_stats)
from summersph_tpu.io.checkpoint import load_npz_with_config, save_npz
from summersph_tpu.models.disc import disc_ic

# C5_OUT redirects all outputs (smokes must not pollute the committed
# evidence directory, nor leave a tiny checkpoint a later evidence pass
# would silently resume from).
OUT = os.environ.get("C5_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "results", "collapse1m")
N = int(os.environ.get("C5_N", 1_048_576))
SMOKE = os.environ.get("C5_SMOKE", "0") == "1"  # tiny CPU shakedown
T_END = 12.0  # ~1.4 free-fall times (t_ff = 8.8 yr at rho = 9.6e-5)


def build():
    # mean spacing scales as N^(-1/3): h0 ~ eta * spacing
    h0 = 1.0 * (1_048_576 / N) ** (1.0 / 3.0)
    cfg = SimConfig(
        fixed_h=None, eta=1.2, h_iter_max=3, convergence_criteria=1e-3,
        # rim-h cap + bulk-tracking cells: the two fixes that carried the
        # N=65536 shakedown past t_ff (scripts/collapse_diag.py; round-2's
        # run died at t<0.15 with max_length=50 and h_max-sized cells)
        max_length=1.5 * h0, cell_h_quantile=0.9,
        # grav_grid=128: measured on chip (scripts/c5_profile.py,
        # docs/ROUND3.md item 14) the 256^3 mesh's padded-512^3 XLA FFT
        # costs 1.9 s/step — 4.6x more than its short-range lane saving —
        # while the 128^3 bench config runs the same N at 0.43 s/step.
        gravity="pm", grav_grid=32 if SMOKE else 128, theta=0.5,
        neighbor_mode="sorted", use_pallas=True, pallas_interpret=SMOKE,
        sorted_block=128, window_group=32,
        # deep fetch + 8-slice adaptive windows: the condensing core packs
        # thousands of candidates per group right when sink creation needs
        # exact density (pallas_pairs.window_plan)
        pallas_window=256, pallas_fetch_window=2560,
        # W=768 is the bench-validated short-range granularity for the
        # 128^3 mesh at N=1e6 (bench.py run_config).  The fetch is deep
        # because it is the adaptive-slice ceiling: the pre-sink dense
        # transient packs ~5e4 r_cut-ball candidates around the condensing
        # core (measured shape of the N=4096 run,
        # docs/results/collapse4k_f32/), and a deep fetch costs only
        # DMA/VMEM where the core is NOT (ordinary groups stay at one
        # slice).
        # r3 session-C audit (scripts/c5_window_audit.py): at the 1.22 t_ff
        # fragmenting state the W=768/fetch=2688 plan dropped 54% of true
        # short-range pairs (fetch caps slices at 3, not the packing's 8).
        # W=1024/fetch=8448 leaves 1.3% residual at 2.3x pair lanes, and
        # the overflow worklist (grav_overflow_items, exactness-tested vs
        # deep windows) covers that tail — short-range gravity stays exact
        # through the condensed-core phase.
        grav_pallas_window=512 if SMOKE else 1024,
        grav_pallas_fetch=896 if SMOKE else 8448,
        grav_overflow_items=0 if SMOKE else 65536,
        window_blocks=3, grav_window_blocks=8,
        # gamma < 4/3: the standard collapse-to-sink EOS choice.  At the
        # reference default 1.4 the cloud BOUNCES: adiabatic + AV shock
        # heating beats gravity at rho_max ~ 0.065, 8x below the sink
        # threshold m(eta/h)^3 > 0.5 (V:560) — measured N=65536 TPU run to
        # t=12 > t_ff, zero sinks (scripts/collapse_diag.py).  gamma is a
        # runtime parameter of the reference (parameters.txt, read at
        # SUMMER_SPH.f90:899), so this is a configuration choice, not a
        # physics deviation.
        gamma=1.1, bounding_size=1500.0,
        # N=2048 formed 6 sinks; creation sites multiply with resolution
        # (smaller h resolves more fragments), and saturation froze the
        # round-2 4096 run — headroom is cheap ([S,N] sink gravity)
        sink_capacity=128,
        # The N=65536 gamma=1.1 shakedown saturated 64 slots by ~1.2 t_ff
        # with distinct fragments; merging close sink pairs (the reference's
        # *intended* check_sink_merger, an empty stub at V:1067-1073)
        # recycles slots physically instead of suppressing creation.
        sink_merge_factor=1.0,
        kahan_u=True,  # f64-quality u ledger over ~1e4 steps (f32 state)
        # Far-field subcycling: the mesh solve every 4th step (drift
        # bounded by tests/test_pm_every.py at k=4 and k=8; phases are
        # pinned to the 16-step segments so every resume recomputes).
        # The short-range pair complement — what sink formation actually
        # resolves — stays per-step.
        pm_every=1 if SMOKE else 4,
        dt_init=1e-4, dt_min=1e-7, dt_max=5e-3,
        end_time=T_END,
    )
    # rigid-body rotation at beta = E_rot/|E_grav| ~ 0.15: rim speed 4.2
    # (Omega = 0.084/yr) for M=50, R=50
    state, _ = disc_ic(
        n=N, r_max=50.0, m_disc=50.0, m_star=0.0, u0=0.25,
        rotation="rigidbody", v_circ=4.2, h0=h0,
        cfg=cfg, seed=0,
    )
    return state, cfg


def main():
    ap = argparse.ArgumentParser()
    # 16 steps/segment: the axon TPU worker kills any single XLA
    # execution over ~55-110 s (docs/ROUND3.md item 13 — the round's
    # three config5 crashes were 64-step ~112 s segments).  At the
    # measured 0.43-0.7 s/step this keeps each segment execution ~10 s
    # with 4x headroom for the late-stage condensed-core slowdown.
    ap.add_argument("--steps-per-seg", type=int, default=16)
    ap.add_argument("--max-wall", type=float, default=5400.0)
    # At N=1e6 the ~80 MB state pull through the axon tunnel costs a
    # sizeable fraction of a segment's compute; checkpoint every Kth
    # segment (plus on abort and at exit) instead of every one.
    ap.add_argument("--ckpt-every", type=int, default=8)
    ap.add_argument("--fresh", action="store_true")
    # Resume-time config overrides: the checkpoint carries its config, but
    # the late dense phase wants different knobs than the early uniform one
    # (deeper short-range fetch once the core condenses; shorter segments
    # once steps slow toward the ~55 s per-execution worker deadline).
    ap.add_argument("--grav-fetch", type=int, default=0,
                    help="override grav_pallas_fetch on resume (128-mult)")
    ap.add_argument("--grav-window", type=int, default=0,
                    help="override grav_pallas_window on resume (128-mult)")
    ap.add_argument("--overflow-items", type=int, default=-1,
                    help="override grav_overflow_items on resume (64-mult)")
    ap.add_argument("--sph-fetch", type=int, default=0,
                    help="override pallas_fetch_window on resume (128-mult)")
    # Phase-1 stop conditions (scripts/c5_phase1.sh): hand off to the
    # block-timestep A/B + --dt-bins resume once the global dt collapses
    # into the condensed-core regime instead of burning the wall budget
    # at ~2 s/step x dt=2e-4 (the r4 ledger's t=9.5..9.8 tail).
    ap.add_argument("--stop-dt", type=float, default=0.0,
                    help="stop once dt < this (after t > 1)")
    ap.add_argument("--stop-t", type=float, default=0.0,
                    help="stop once t >= this")
    ap.add_argument("--dt-bins", type=int, default=0,
                    help="override cfg.dt_bins on resume (block timesteps "
                         "for the dt-collapsed dense phase; must win its "
                         "A/B on this state first — scripts/blockstep_ab)")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    ckpt = os.path.join(OUT, "checkpoint.npz")
    ledger = os.path.join(OUT, "ledger.csv")

    t_wall0 = time.time()

    def mark(msg):
        print(f"[{time.time() - t_wall0:7.1f}s] {msg}", flush=True)

    if os.path.exists(ckpt) and not args.fresh:
        state, cfg = load_npz_with_config(ckpt)
        over = {}
        if args.grav_fetch:
            over["grav_pallas_fetch"] = args.grav_fetch
        if args.grav_window:
            over["grav_pallas_window"] = args.grav_window
        if args.overflow_items >= 0:
            over["grav_overflow_items"] = args.overflow_items
        if args.sph_fetch:
            over["pallas_fetch_window"] = args.sph_fetch
        if args.dt_bins:
            over["dt_bins"] = args.dt_bins
        if over:
            cfg = cfg.with_(**over)
        if args.dt_bins and args.dt_bins > 1:
            # The checkpoint's dt is the GLOBAL controller's (set by the
            # densest knot).  The binned controller's candidate bound is
            # relaxed by 2^(B-1) (blockstep: deep rungs substep), so jump
            # the base dt straight to that bound instead of waiting ~20
            # base steps of hysteresis growth (same formula as
            # scripts/blockstep_ab.py).
            from summersph_tpu.ops.timestep import dt_candidates
            cand = dt_candidates(state.particles, cfg)
            base = float(min((1 << (args.dt_bins - 1))
                             * float(jnp.min(cand)), cfg.dt_max))
            state = state.replace(dt=jnp.asarray(
                base, jnp.asarray(state.dt).dtype))
        mark(f"resumed t={float(state.t):.4f} dt={float(state.dt):.3e}"
             + (f" overrides={over}" if over else ""))
    else:
        state, cfg = build()
        mark(f"ICs built (N={N}, grav_grid={cfg.grav_grid})")
        state = prime(state, cfg)
        jax.block_until_ready(state.particles.pos)
        mark("primed (first compile done)")
        for f in (ledger,):
            if os.path.exists(f):
                os.remove(f)

    new_ledger = not os.path.exists(ledger)
    cols = ["t", "dt", "n_gas", "n_sinks", "m_gas", "m_sinks", "E_kin",
            "E_int", "px", "py", "pz", "Lz", "rho_max", "h_min", "wall_s"]

    t_start = time.time()
    step_count = 0
    seg_idx = 0
    with open(ledger, "a", newline="") as fh:
        w = csv.writer(fh)
        if new_ledger:
            w.writerow(cols)
        while float(state.t) < T_END and time.time() - t_start < args.max_wall:
            t0 = time.time()
            print(f"[seg {seg_idx}] dispatch t={float(state.t):.4f}",
                  flush=True)
            state = run_steps(state, cfg, args.steps_per_seg)
            # run_steps dispatches asynchronously; sync before reading the
            # clock or the ledger logs wall=0.0 for every segment.
            jax.block_until_ready(state.particles.pos)
            d = measure(state)
            wall = time.time() - t0
            step_count += args.steps_per_seg
            p, s = state.particles, state.sinks
            n_sinks = int(jnp.sum(s.alive & (s.mass > 0)))
            m_sinks = float(d["mass_sinks"])
            mom = np.asarray(d["momentum"])
            row = [f"{float(state.t):.6f}", f"{float(state.dt):.3e}",
                   int(p.n_alive), n_sinks,
                   f"{float(d['mass_gas']):.8f}", f"{m_sinks:.8f}",
                   f"{float(d['e_kin']):.6f}", f"{float(d['e_int']):.6f}",
                   f"{mom[0]:.3e}", f"{mom[1]:.3e}", f"{mom[2]:.3e}",
                   f"{float(np.asarray(d['ang_momentum'])[2]):.6f}",
                   f"{float(d['rho_max']):.4e}",
                   f"{float(d['h_min']):.4f}", f"{wall:.1f}"]
            w.writerow(row)
            fh.flush()
            print(f"t={float(state.t):.4f} dt={float(state.dt):.2e} "
                  f"N={int(p.n_alive)} sinks={n_sinks} m_sink={m_sinks:.4f} "
                  f"rho_max={float(d['rho_max']):.3e} wall={wall:.1f}s "
                  f"({args.steps_per_seg} steps)", flush=True)
            warn_stats(state)
            seg_idx += 1
            if seg_idx % args.ckpt_every == 0:
                save_npz(ckpt, state, cfg)
            t_now, dt_now = float(state.t), float(state.dt)
            if ((args.stop_t and t_now >= args.stop_t)
                    or (args.stop_dt and t_now > 1.0
                        and dt_now < args.stop_dt)):
                print(f"stop condition hit (t={t_now:.4f} dt={dt_now:.2e})",
                      flush=True)
                break
            try:
                # Abort-and-keep-the-evidence on NaN / total particle death
                # (VERDICT r2: 55 segments of dead state were logged
                # unnoticed); the ledger row and the checkpoint below
                # capture the failing state.
                check_health(state, where=f"after segment at t={row[0]}")
            except SimulationDiverged as e:
                save_npz(ckpt, state, cfg)
                print(f"ABORT: {e}", flush=True)
                sys.exit(2)

    save_npz(ckpt, state, cfg)
    print(f"stopped at t={float(state.t):.4f} after {step_count} steps "
          f"({time.time()-t_start:.0f}s wall)", flush=True)


if __name__ == "__main__":
    main()

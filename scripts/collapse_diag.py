"""Collapse failure diagnosis: small-N version of graded config 5 with
fine-grained per-segment health reporting.

Round-2's 1e6 run died inside its first 64-step segment (every particle
culled, u non-finite) with nothing recorded about *when* or *which term*
blew up.  This driver runs the identical physics (rotating cold cloud,
rigid rotation, TreePM + variable h + sinks — scripts/config5_run.py
geometry at reduced N) in short segments and prints the extremes that
matter for the known overflow path (AV mu with h at its floor:
ops/pairs.py mu term; VERDICT r2): max |v|, max u, min h, rho_max,
plus the health stats and sink census.  Works on CPU (f64 capable, XLA
engine) and TPU (f32 Pallas).

Usage:
  JAX_PLATFORMS=cpu python scripts/collapse_diag.py --n 8192 --seg 8
  python scripts/collapse_diag.py --n 8192 --dtype float64 --no-pallas
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax

# The ambient environment pins JAX to the TPU tunnel and a sitecustomize
# imports it at interpreter startup, so JAX_PLATFORMS in the environment is
# too late — honor it through jax.config (same dance as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import prime, run_steps
from summersph_tpu.models.disc import disc_ic


def build(n, dtype, use_pallas, grav_grid, dt_max, h_iter_max,
          sink_capacity, window_blocks=6, cell_h_quantile=0.9,
          pallas_window=256, pallas_fetch_window=2560, gamma=1.4,
          kahan_u=False):
    # Same cloud as config5_run.py: R=50 AU, M=50 Msun, rigid rotation at
    # beta ~ 0.15 (rim speed 4.2), u=0.25; h0 from mean spacing ~ N^(-1/3).
    h0 = 1.0 * (1_048_576 / n) ** (1.0 / 3.0)
    cfg = SimConfig(
        fixed_h=None, eta=1.2, h_iter_max=h_iter_max,
        convergence_criteria=1e-3,
        # max_length bounds the rim-particle h runaway: isolated particles
        # never converge (their density is ~ the self term, always below
        # target), and with max_length >> h0 the cap h_max*sort_h_pad
        # compounds +20%/step -> exponential cell growth -> window blowout
        # (the round-2 collapse death chain, scripts/collapse_diag.py log).
        # 1.5 h0 caps rim h at a modest density underestimate (rim dynamics
        # is gravity-dominated); interior particles converge below it.
        max_length=1.5 * h0,
        # cells track the BULK h down as the cloud condenses (p90), not the
        # capped rim tail: without this the core's cell occupancy blows out
        # the candidate windows exactly when sink formation needs exact
        # density (the N=65536 t~t_ff stall; config.cell_h_quantile)
        cell_h_quantile=cell_h_quantile,
        gravity="pm", grav_grid=grav_grid, theta=0.5,
        neighbor_mode="sorted", use_pallas=use_pallas,
        sorted_block=128, window_group=32, window_blocks=window_blocks,
        pallas_window=pallas_window,
        pallas_fetch_window=pallas_fetch_window,
        # fetch >> W so the adaptive slices (fetch//W per offset) can ride
        # the pre-sink dense transient instead of dropping it (the fetch
        # costs DMA/VMEM only; see docs/results/collapse4k_f32/)
        grav_pallas_window=512, grav_pallas_fetch=2560,
        gamma=gamma, bounding_size=1500.0,
        sink_capacity=sink_capacity, kahan_u=kahan_u,
        dt_init=1e-4, dt_min=1e-7, dt_max=dt_max,
        dtype=dtype, end_time=12.0,
    )
    state, _ = disc_ic(n=n, r_max=50.0, m_disc=50.0, m_star=0.0, u0=0.25,
                       rotation="rigidbody", v_circ=4.2, h0=h0,
                       cfg=cfg, seed=0)
    return state, cfg


def report(state, tag, wall):
    p, s = state.particles, state.sinks
    alive = np.asarray(p.alive)
    pos = np.asarray(p.pos)[alive]
    vel = np.asarray(p.vel)[alive]
    u = np.asarray(p.u)[alive]
    h = np.asarray(p.h)[alive]
    rho = np.asarray(p.rho)[alive]
    n_sink = int(jnp.sum(s.alive & (s.mass > 0)))
    m_sink = float(jnp.sum(jnp.where(s.alive, s.mass, 0.0)))
    stats = state.stats_dict()
    trip = {k: v for k, v in stats.items() if v and k != "h_unconverged"}
    hq = (np.percentile(h, [50, 90, 100]) if h.size
          else np.array([np.inf] * 3))
    print(f"{tag} t={float(state.t):.5f} dt={float(state.dt):.2e} "
          f"N={alive.sum()} sinks={n_sink} m_sink={m_sink:.4f} | "
          f"rho_max={rho.max() if rho.size else 0:.3e} "
          f"h_min={h.min() if h.size else np.inf:.4f} "
          f"h[50/90/max]={hq[0]:.2f}/{hq[1]:.2f}/{hq[2]:.2f} "
          f"u_max={u.max() if u.size else 0:.3e} "
          f"v_max={np.abs(vel).max() if vel.size else 0:.3e} "
          f"r_max={np.abs(pos).max() if pos.size else 0:.1f} "
          f"hunconv={stats['h_unconverged']}"
          + (f" TRIP={trip}" if trip else "")
          + f" wall={wall:.1f}s", flush=True)
    return alive.sum(), trip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--seg", type=int, default=8)
    ap.add_argument("--max-seg", type=int, default=400)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--grav-grid", type=int, default=32)
    ap.add_argument("--dt-max", type=float, default=5e-3)
    ap.add_argument("--h-iter-max", type=int, default=3)
    ap.add_argument("--sink-capacity", type=int, default=64)
    ap.add_argument("--t-end", type=float, default=12.0)
    ap.add_argument("--max-wall", type=float, default=7200.0)
    ap.add_argument("--cell-h-quantile", type=float, default=0.9)
    ap.add_argument("--window-blocks", type=int, default=6)
    ap.add_argument("--pallas-window", type=int, default=256)
    ap.add_argument("--pallas-fetch", type=int, default=2560)
    ap.add_argument("--gamma", type=float, default=1.4)
    ap.add_argument("--kahan", action="store_true",
                    help="compensated u kicks (the config-5 f32 setting)")
    args = ap.parse_args()

    if args.dtype == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)

    state, cfg = build(args.n, args.dtype, not args.no_pallas,
                       args.grav_grid, args.dt_max, args.h_iter_max,
                       args.sink_capacity, window_blocks=args.window_blocks,
                       cell_h_quantile=args.cell_h_quantile,
                       pallas_window=args.pallas_window,
                       pallas_fetch_window=args.pallas_fetch,
                       gamma=args.gamma, kahan_u=args.kahan)
    t0 = time.time()
    state = prime(state, cfg)
    float(np.asarray(state.t))
    report(state, "seg 0000", time.time() - t0)
    for i in range(1, args.max_seg + 1):
        if float(state.t) >= args.t_end or time.time() - t0 > args.max_wall:
            break
        t1 = time.time()
        state = run_steps(state, cfg, args.seg)
        # run_steps returns async: force a sync (block_until_ready can
        # return unsynced on the tunneled backend, docs/PERF_NOTES.md) so
        # the reported wall is the segment's compute, not its dispatch.
        float(np.asarray(state.t))
        n_alive, trip = report(state, f"seg {i:04d}", time.time() - t1)
        if n_alive == 0 or trip.get("nonfinite"):
            print("DIVERGED — stopping for inspection", flush=True)
            break
    print(f"done: t={float(state.t):.4f} wall={time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()

"""Evidence runs for graded configs 2-4: thin ring, Keplerian disc, var-h disc.

Regenerates docs/results evidence with CURRENT engine defaults (VERDICT r2
item 8: the committed disc/varh artifacts predate the grav_split_rs change,
and raw saveN dumps are not evidence) as plots + per-segment conservation
ledgers:

  ring    - graded config 2 (reference README.md:13-15): N=4000 narrow
            annulus on Keplerian orbits around a 1 M_sun sink, pressure + AV
            spread it over ~1 orbit while |L| is conserved.  Evidence: radial
            mass-profile spreading panel + |L| drift.
  disc100 - graded config 3 (README.md:21-23): N=12000 uniform sphere,
            Keplerian velocities around a central 5 M_sun sink, TreePM
            self-gravity, 100 yr.  Evidence: density projections at 0/100 yr,
            ledger (accretion balance, |L| drift).
  varh    - graded config 4 ("SUMMER_SPH - Variable.f90" generation): N=20000
            disc, grad-h variable smoothing length + Newton h-iteration,
            TreePM, central sink, 20 yr.  Evidence: h-vs-r adaptation panel +
            ledger.

Each run writes <out>/<name>/ledger.csv, panels as .png, and a README.md with
the headline numbers.  No raw snapshot dumps.

Usage: python scripts/evidence_runs.py [--config ring|disc100|varh|all]
       [--smoke]   # tiny-N CPU shakedown of the script itself
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from summersph_tpu.config import SimConfig
from summersph_tpu.diagnostics import measure
from summersph_tpu.integrate import (SimulationDiverged, check_health, prime,
                                     run_steps, warn_stats)
from summersph_tpu.models.disc import disc_ic
from summersph_tpu.models.ring import ring_ic

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("EV_OUT") or os.path.join(ROOT, "docs", "results")

LEDGER_COLS = ["t", "dt", "n_gas", "n_sinks", "m_gas", "m_sinks", "E_kin",
               "E_int", "px", "py", "pz", "Lz", "rho_max", "h_min", "wall_s"]


def _pallas_cfg(smoke):
    """Production neighbour engine; interpret-mode Pallas under --smoke."""
    return dict(neighbor_mode="sorted", use_pallas=True,
                pallas_interpret=bool(smoke))


def build_ring(smoke):
    n = 512 if smoke else 4000
    cfg = SimConfig(fixed_h=2.0, gravity="none", gamma=1.4,
                    bounding_size=1500.0, end_time=30.0 if smoke else 350.0,
                    dt_init=1e-2, **_pallas_cfg(smoke))
    state, _ = ring_ic(n=n, r0=50.0, width=5.0, m_ring=0.01, m_star=1.0,
                       u0=1.0e-4, h0=2.0, cfg=cfg, seed=0)
    return state, cfg


def build_disc100(smoke):
    n = 1024 if smoke else 12000
    cfg = SimConfig(fixed_h=2.5, gravity="pm", grav_grid=32 if smoke else 128,
                    gamma=1.4, bounding_size=1500.0,
                    end_time=10.0 if smoke else 100.0, dt_init=1e-3,
                    **_pallas_cfg(smoke))
    state, _ = disc_ic(n=n, r_max=100.0, m_disc=5.0, m_star=5.0, u0=0.25,
                       rotation="keplerian", h0=2.5, sink_radius=3.5,
                       cfg=cfg, seed=0)
    return state, cfg


def build_varh(smoke):
    n = 1024 if smoke else 20000
    # Cells sized by the BULK of the h distribution (cell_h_quantile=0.9,
    # the config-5 production setting): at N=20k the equilibrium h ~= 7 AU
    # but the rim tail reaches max_length=20, and h_max-sized cells then
    # hold ~500 particles — far beyond any static window (the first varh
    # evidence attempt dropped ~2e6 candidates/step and blew up by t=2.4).
    # Window sizing: the round-4 artifact's knobs (fetch=1024, default
    # gravity windows) tripped the in-step overflow counters from the very
    # first segment (~5e5 sph + ~1.3e6 grav candidate lanes dropped per
    # step, observed in the round-5 rerun log) — the disc's dense center
    # packs far more candidates per stencil cell than 4 slices cover.  Use
    # the config-5 production plan: deep 10-slice adaptive fetch for the
    # SPH pairs, and the exact overflow worklist for the short-range
    # gravity tail (grav_overflow_items, exactness-tested).
    cfg = SimConfig(fixed_h=None, eta=1.2, h_iter_max=3,
                    convergence_criteria=1e-3, max_length=20.0,
                    cell_h_quantile=0.9,
                    gravity="pm", grav_grid=32 if smoke else 128,
                    gamma=1.4, bounding_size=1500.0,
                    end_time=4.0 if smoke else 20.0, dt_init=1e-3,
                    pallas_fetch_window=2560,
                    grav_pallas_fetch=2560 if smoke else 3456,
                    grav_overflow_items=0 if smoke else 65536,
                    **_pallas_cfg(smoke))
    state, _ = disc_ic(n=n, r_max=100.0, m_disc=5.0, m_star=5.0, u0=0.25,
                       rotation="keplerian", h0=5.0, sink_radius=3.5,
                       cfg=cfg, seed=0)
    return state, cfg


BUILDERS = {"ring": build_ring, "disc100": build_disc100, "varh": build_varh}


def _radial_profile(state, bins):
    p = state.particles
    alive = np.asarray(p.alive)
    pos = np.asarray(p.pos)[alive]
    m = np.asarray(p.mass)[alive]
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    hist, edges = np.histogram(r, bins=bins, weights=m)
    centers = 0.5 * (edges[:-1] + edges[1:])
    # surface density Sigma(r) = dM / (2 pi r dr)
    sigma = hist / (2.0 * np.pi * np.maximum(centers, 1e-9) * np.diff(edges))
    return centers, sigma


def _h_vs_r(state):
    p = state.particles
    alive = np.asarray(p.alive)
    pos = np.asarray(p.pos)[alive]
    r = np.sqrt(np.sum(pos * pos, axis=1))
    return r, np.asarray(p.h)[alive]


def run_config(name, smoke, seg_steps=64, max_wall=1800.0, t_end=0.0):
    out = os.path.join(OUT, name)
    os.makedirs(out, exist_ok=True)
    state, cfg = BUILDERS[name](smoke)
    if t_end:
        cfg = cfg.with_(end_time=t_end)
    state = prime(state, cfg)

    d0 = measure(state)
    snap_states = [("t0", state)]  # (label, state) for the image panel
    profiles = [(float(state.t), *_radial_profile(state, 40))]

    ledger = os.path.join(out, "ledger.csv")
    rows = []
    t_start = time.time()
    mid_taken = False
    t_end = cfg.end_time
    with open(ledger, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(LEDGER_COLS)
        while (float(state.t) < t_end
               and time.time() - t_start < max_wall):
            t0 = time.time()
            state = run_steps(state, cfg, seg_steps)
            # force a real device sync before reading the clock: dispatch
            # is async and measure() is lazy too — a 4-byte host transfer
            # is the one reliable barrier on this backend
            # (docs/PERF_NOTES.md caveat 1)
            float(np.asarray(state.t))
            wall = time.time() - t0
            d = measure(state)
            p, s = state.particles, state.sinks
            n_sinks = int(jnp.sum(s.alive & (s.mass > 0)))
            mom = np.asarray(d["momentum"])
            row = [f"{float(state.t):.6f}", f"{float(state.dt):.3e}",
                   int(p.n_alive), n_sinks,
                   f"{float(d['mass_gas']):.8f}",
                   f"{float(d['mass_sinks']):.8f}",
                   f"{float(d['e_kin']):.6f}", f"{float(d['e_int']):.6f}",
                   f"{mom[0]:.3e}", f"{mom[1]:.3e}", f"{mom[2]:.3e}",
                   f"{float(np.asarray(d['ang_momentum'])[2]):.6f}",
                   f"{float(d['rho_max']):.4e}",
                   f"{float(d['h_min']):.4f}", f"{wall:.1f}"]
            w.writerow(row)
            fh.flush()
            rows.append([float(x) for x in row])
            print(f"[{name}] t={float(state.t):.3f}/{t_end:g} "
                  f"dt={float(state.dt):.2e} N={int(p.n_alive)} "
                  f"sinks={n_sinks} wall={wall:.1f}s", flush=True)
            warn_stats(state)
            check_health(state, where=f"{name} at t={row[0]}")
            if not mid_taken and float(state.t) >= 0.5 * t_end:
                snap_states.append(("mid", state))
                profiles.append((float(state.t),
                                 *_radial_profile(state, 40)))
                mid_taken = True

    snap_states.append(("end", state))
    profiles.append((float(state.t), *_radial_profile(state, 40)))
    write_report(name, out, cfg, d0, measure(state), rows, snap_states,
                 profiles, smoke, state)
    return state


def write_report(name, out, cfg, d0, d1, rows, snap_states, profiles, smoke,
                 state):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.array(rows) if rows else np.zeros((0, len(LEDGER_COLS)))
    t = arr[:, 0] if len(arr) else np.array([0.0])

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    ax = axes[0, 0]
    if len(arr):
        ax.plot(t, arr[:, 2], label="n_gas")
        ax.set_ylabel("live gas")
        ax2 = ax.twinx()
        ax2.plot(t, arr[:, 3], color="C3", label="sinks")
        ax2.set_ylabel("sinks", color="C3")
    ax.set_title("population")

    ax = axes[0, 1]
    if len(arr):
        m_tot = arr[:, 4] + arr[:, 5]
        ax.plot(t, arr[:, 4], label="gas")
        ax.plot(t, arr[:, 5], label="sinks")
        ax.plot(t, m_tot, "k--", label="total")
        ax.legend()
    ax.set_title("mass ledger [M_sun]")

    ax = axes[0, 2]
    if len(arr):
        L0 = arr[0, 11] if arr[0, 11] != 0 else 1.0
        ax.plot(t, (arr[:, 11] - arr[0, 11]) / abs(L0) * 100.0)
        ax.set_ylabel("%")
    ax.set_title("L_z drift [%]")

    ax = axes[1, 0]
    if len(arr):
        ax.semilogy(t, arr[:, 1])
    ax.set_title("dt [yr]")
    ax.set_xlabel("t [yr]")

    ax = axes[1, 1]
    if len(arr):
        ax.semilogy(t, np.maximum(arr[:, 12], 1e-12))
    ax.set_title("rho_max")
    ax.set_xlabel("t [yr]")

    ax = axes[1, 2]
    if name == "varh":
        r, h = _h_vs_r(state)
        ax.plot(r, h, ".", ms=1, alpha=0.3)
        ax.set_xlabel("r [AU]")
        ax.set_ylabel("h [AU]")
        ax.set_title("smoothing length vs radius (end)")
    else:
        for (tp, c, s) in profiles:
            ax.plot(c, s, label=f"t={tp:.0f}")
        ax.legend()
        ax.set_xlabel("r_cyl [AU]")
        ax.set_ylabel("Sigma(r)")
        ax.set_title("radial surface density")
    fig.suptitle(f"{name}: N0={int(d0['n_gas'])}, t={float(d1['t']):.1f} yr, "
                 f"{'SMOKE' if smoke else 'production'}")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "evolution.png"), dpi=120)
    plt.close(fig)

    # density projections (start/end) for the disc configs
    if name in ("disc100", "varh") and not smoke:
        from summersph_tpu.tools.density_image import (projected_density,
                                                       save_image)
        for label, st in (snap_states[0], snap_states[-1]):
            proj, xi, sxy = projected_density(
                st.particles, st.sinks,
                h=cfg.fixed_h, resolution=120, box=110.0)
            save_image(proj, xi, sxy,
                       os.path.join(out, f"density_{label}.png"),
                       title=f"{name} t={float(st.t):.1f} yr")

    L0 = rows[0][11] if rows else 0.0
    L1 = rows[-1][11] if rows else 0.0
    m0 = float(d0["mass_gas"]) + float(d0["mass_sinks"])
    m1 = float(d1["mass_gas"]) + float(d1["mass_sinks"])
    accreted = float(d1["mass_sinks"]) - float(d0["mass_sinks"])
    lines = [
        f"# {name} evidence run",
        "",
        f"- engine: {'SMOKE (tiny N, CPU interpret)' if smoke else 'production (sorted + Pallas)'},"
        f" gravity={cfg.gravity}, "
        f"{'fixed h=%g' % cfg.fixed_h if cfg.fixed_h is not None else 'variable h (grad-h + Newton)'}",
        f"- N0 = {int(d0['n_gas'])} gas, ran t = 0 -> {float(d1['t']):.2f} yr "
        f"({len(rows)} ledger segments)",
        f"- gas+sink mass ledger: {m0:.6f} -> {m1:.6f} M_sun "
        f"(drift {abs(m1-m0):.2e}; remainder = bounds-culled escapers)",
        f"- sink accretion: {accreted:.6f} M_sun onto "
        f"{int(d1['n_sinks'])} sink(s)",
        f"- L_z: {L0:.6f} -> {L1:.6f} "
        f"({(abs(L1-L0)/abs(L0)*100 if L0 else 0):.3f}% drift)",
        f"- final n_gas = {int(d1['n_gas'])}, rho_max = "
        f"{float(d1['rho_max']):.3e}, h_min = {float(d1['h_min']):.3f}",
        "",
        "Artifacts: `ledger.csv` (per-segment conservation ledger), "
        "`evolution.png` (population / mass / L_z / dt / rho_max panels"
        + (", h-vs-r adaptation)" if name == "varh" else
           ", radial surface-density spreading)" if name == "ring" else ")"),
        ]
    if name in ("disc100", "varh") and not smoke:
        lines.append("`density_t0.png` / `density_end.png` (SPH density "
                     "projections, reference Density_Image.py presentation).")
    with open(os.path.join(out, "README.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[{name}] evidence written to {out}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all",
                    choices=["all"] + sorted(BUILDERS))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--seg-steps", type=int, default=64)
    ap.add_argument("--max-wall", type=float, default=1800.0)
    ap.add_argument("--t-end", type=float, default=0.0,
                    help="override the builder's end_time (VERDICT r4 "
                         "item 7: deepen varh to >= 100 yr)")
    args = ap.parse_args()

    names = sorted(BUILDERS) if args.config == "all" else [args.config]
    for name in names:
        try:
            run_config(name, args.smoke, seg_steps=args.seg_steps,
                       max_wall=args.max_wall, t_end=args.t_end)
        except SimulationDiverged as e:
            print(f"[{name}] ABORT: {e}", flush=True)
            sys.exit(2)


if __name__ == "__main__":
    main()

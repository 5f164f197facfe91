"""TreePM mesh sweep on the live chip: step time vs grav_grid at N=1e6.

The finer-mesh lever (VERDICT r2 item 3): r_cut-cell occupancy scales with
cell width cubed, so doubling the mesh cuts the short-range pass ~8x while
the (padded) FFT grows 8x in cells — this measures where the trade lands
now that the Green's table is a runtime argument (any mesh compiles in
seconds; the 256^3 mesh was previously uncompilable).

Usage: python scripts/mesh_sweep.py [--n 1048576] [--steps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import prime, run_steps
from summersph_tpu.models.disc import disc_ic


def run_one(n, steps, grav_grid, gw, gf):
    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(
        fixed_h=h0, gravity="pm", grav_grid=grav_grid,
        neighbor_mode="sorted", use_pallas=True,
        sorted_block=128, window_group=32,
        pallas_window=256, pallas_fetch_window=768,
        window_blocks=3, grav_window_blocks=8,
        grav_pallas_window=gw, grav_pallas_fetch=gf,
        gamma=1.4, bounding_size=1500.0,
        dt_init=1e-4, dt_min=1e-5, dt_max=1e-3,
    )
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)

    def sync(st):
        return float(np.asarray(st.t))

    t0 = time.perf_counter()
    state = prime(state, cfg)
    wu = run_steps(state, cfg, steps)
    sync(wu)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run_steps(wu, cfg, steps)
    sync(out)
    dt_wall = time.perf_counter() - t0
    d = out.stats_dict()
    rate = int(out.particles.n_alive) * steps / dt_wall
    print(f"grid={grav_grid:4d} gw={gw:4d} gf={gf:4d}: "
          f"{dt_wall / steps * 1e3:7.1f} ms/step  {rate:.3e} p-steps/s  "
          f"grav_over={d['grav_window_overflow']} "
          f"sph_over={d['sph_window_overflow']} "
          f"(compile+warm {compile_s:.0f}s)", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--steps", type=int, default=10)
    # per-mesh window sizes pre-picked from measured key-window extents
    # (CPU analysis at N=1e6 ball: per-offset extent p99 = 512/261/203/184
    # lanes at grid 128/192/256/320 — see docs/ROUND3.md)
    ap.add_argument("--configs",
                    default="256:256:640,192:384:768,320:256:640,128:896:1280")
    args = ap.parse_args()
    for spec in args.configs.split(","):
        grid, gw, gf = (int(v) for v in spec.split(":"))
        try:
            run_one(args.n, args.steps, grid, gw, gf)
        except Exception as e:
            print(f"grid={grid} gw={gw} gf={gf}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

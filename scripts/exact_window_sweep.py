"""Exact-start (rotated) window A/B on the live chip (round 4).

cfg.pallas_exact_windows anchors every 128-lane compute slice at the
group window's TRUE start via a dynamic lane rotate (pltpu.roll), cutting
the ~2.3k candidate lanes/row of the aligned plan toward the ~1.15k
9-offsets x 128 floor.  This sweep measures end-to-end step time at
N=1e6 gravity=none for {aligned, exact} x {wg=32, 64} plus the exact
mode's sensitivity to the fetch window, and reports the planned lanes/row
for each cell so the speedup can be attributed.

Usage: python scripts/exact_window_sweep.py [--n 1048576] [--steps 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def run_one(n, steps, exact, wg, WB, W=256):
    import jax.numpy as jnp

    from summersph_tpu.config import SimConfig
    from summersph_tpu.integrate import prime, run_steps
    from summersph_tpu.models.disc import disc_ic
    from summersph_tpu.ops import pallas_pairs as ppx
    from summersph_tpu.ops.sorted_grid import sort_particles

    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(
        fixed_h=h0, gravity="none", neighbor_mode="sorted",
        use_pallas=True, sorted_block=128, window_group=wg,
        pallas_window=W, pallas_fetch_window=WB, window_blocks=3,
        pallas_exact_windows=exact,
        gamma=1.4, bounding_size=1500.0,
        dt_init=1e-4, dt_min=1e-5, dt_max=1e-3,
    )
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)

    def sync(st):
        return float(np.asarray(st.t))

    state = prime(state, cfg)
    wu = run_steps(state, cfg, steps)
    sync(wu)
    t0 = time.perf_counter()
    out = run_steps(wu, cfg, steps)
    sync(out)
    dt_wall = (time.perf_counter() - t0) / steps

    # planned lanes/row + drop count for attribution
    _, grid = sort_particles(out.particles, cfg)
    if exact:
        _, _, covered = ppx.window_plan_exact(grid, cfg)
        lanes = float(jnp.sum(covered - jnp.minimum(grid.starts,
                                                    covered - 128)))
    else:
        _, _, _, covered = ppx.window_plan(grid, cfg)
        lanes = float(jnp.sum(covered - (grid.starts // 128) * 128))
    dropped = int(jnp.sum(jnp.maximum(grid.ends - covered, 0)))
    alive = int(out.particles.n_alive)
    pst = alive / dt_wall
    print(f"exact={int(exact)} wg={wg:3d} WB={WB:4d} W={W:4d}: "
          f"{dt_wall*1e3:7.1f} ms/step  {pst:.3e} p-steps/s  "
          f"lanes/row {lanes*wg/alive:7.1f}  dropped {dropped}", flush=True)
    return pst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    import jax
    print(f"platform={jax.devices()[0].platform} N={args.n}", flush=True)

    # baseline: round-3 production cells
    run_one(args.n, args.steps, exact=False, wg=64, WB=768)
    # exact cells
    run_one(args.n, args.steps, exact=True, wg=64, WB=768)
    run_one(args.n, args.steps, exact=True, wg=32, WB=768)
    run_one(args.n, args.steps, exact=True, wg=32, WB=512)
    run_one(args.n, args.steps, exact=True, wg=16, WB=512)


if __name__ == "__main__":
    main()

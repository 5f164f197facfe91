"""Pallas pair-kernel window sweep on the live chip (VERDICT r3 item 4).

Measures end-to-end step time at N=1e6 gravity=none across the window
knobs that control candidate-lane waste — the pair kernels run ~2.3k
lanes/row against a ~390-candidate floor (docs/PERF_NOTES.md), and the
biggest term is the compute-window granularity W: each of the 9 stencil
offsets covers >= W lanes while holding ~43 true candidates on average.

Round 2 measured W=128 SLOWER (233 vs 220 ms) — but that was with the
2-bit slice packing (max 4 slices) and a 768 fetch; the 3-bit packing
(8 slices) and deeper fetches landed since.  This sweep re-runs the A/B
matrix under the current kernels.

Usage: python scripts/window_sweep.py [--n 1048576] [--steps 12]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def run_one(n, steps, W, WB, wb, wg):
    from summersph_tpu.config import SimConfig
    from summersph_tpu.integrate import prime, run_steps
    from summersph_tpu.models.disc import disc_ic

    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(
        fixed_h=h0, gravity="none", neighbor_mode="sorted",
        use_pallas=True, sorted_block=128, window_group=wg,
        pallas_window=W, pallas_fetch_window=WB, window_blocks=wb,
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
    dt_wall = time.perf_counter() - t0
    alive = int(out.particles.n_alive)
    drops = out.stats_dict()
    return (alive * steps / dt_wall, dt_wall / steps * 1e3,
            drops["sph_window_overflow"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--max-wall", type=float, default=3600.0)
    args = ap.parse_args()

    # (W, fetch, window_blocks, window_group): the current default first
    # as the control, then the W granularity ladder at matched fetch.
    matrix = [
        (256, 768, 3, 32),    # production default (control)
        (128, 768, 3, 32),    # half-granularity, deep slices (8 x 128)
        (128, 512, 3, 32),    # half-granularity, tight fetch
        (256, 1024, 3, 32),   # default W, deeper fetch headroom
        (128, 768, 3, 16),    # narrower groups: tighter spans, more DMAs
        (256, 768, 3, 64),    # wider groups: fewer DMAs, fatter windows
        # r3b: wg=64 won at W=256 (8.44e6); the W=128 ladder was only
        # measured at wg=16/32, where per-slice overhead dominated.  Wider
        # groups amortize that overhead — base lanes drop 9x256 -> 9x128.
        (128, 768, 3, 64),    # half-granularity x wide groups
        (128, 768, 3, 128),   # half-granularity x whole-block groups
        (256, 768, 3, 128),   # whole-block groups at default W
    ]
    if os.environ.get("SWEEP_ROWS"):
        keep = {int(i) for i in os.environ["SWEEP_ROWS"].split(",")}
        matrix = [m for i, m in enumerate(matrix) if i in keep]
    t0 = time.time()
    for W, WB, wb, wg in matrix:
        if time.time() - t0 > args.max_wall:
            print(f"W={W} WB={WB} wb={wb} wg={wg}: skipped (wall)",
                  flush=True)
            continue
        try:
            ps, ms, over = run_one(args.n, args.steps, W, WB, wb, wg)
            print(f"W={W:4d} WB={WB:4d} wb={wb} wg={wg:3d}: "
                  f"{ms:7.1f} ms/step  {ps:.3e} p-steps/s  over={over}",
                  flush=True)
        except Exception as e:
            print(f"W={W} WB={WB} wb={wb} wg={wg}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()

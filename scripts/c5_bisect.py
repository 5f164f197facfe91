"""Bisect the config-5 TPU worker crash (1e6, grav_grid=256, deep fetch).

The exact config5 windows (SPH fetch 2560, grav 256/2560 at the 256^3 mesh)
deterministically kill the TPU worker inside the first 64-step segment
("UNAVAILABLE: TPU worker process crashed ... kernel fault"), while prime()
— the same force evaluation once, outside lax.scan — runs clean.  This
probe runs prime + a short segment with targeted overrides to isolate the
faulting dimension (scan length / mesh size / fetch depth / Pallas vs XLA).

Usage: python scripts/c5_bisect.py --steps 8 [--grid 256] [--sph-fetch 2560]
         [--grav-window 256] [--grav-fetch 2560] [--no-pallas] [--n N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax

os.environ.setdefault("C5_SMOKE", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from config5_run import build  # noqa: E402  (reuses the exact evidence cfg)

from summersph_tpu.integrate import prime, run_steps  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--sph-fetch", type=int, default=2560)
    ap.add_argument("--grav-window", type=int, default=256)
    ap.add_argument("--grav-fetch", type=int, default=2560)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    t0 = time.time()

    def mark(msg):
        print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

    state, cfg = build()
    cfg = cfg.with_(
        grav_grid=args.grid,
        pallas_fetch_window=args.sph_fetch,
        grav_pallas_window=args.grav_window,
        grav_pallas_fetch=args.grav_fetch,
        use_pallas=not args.no_pallas,
    )
    mark(f"cfg: grid={cfg.grav_grid} sph_fetch={cfg.pallas_fetch_window} "
         f"gw={cfg.grav_pallas_window} gf={cfg.grav_pallas_fetch} "
         f"pallas={cfg.use_pallas} steps={args.steps}")
    state = prime(state, cfg)
    jax.block_until_ready(state.particles.pos)
    mark("primed OK")
    for seg in range(args.segments):
        state = run_steps(state, cfg, args.steps)
        t = float(state.t)
        mark(f"segment {seg + 1}/{args.segments} OK: t={t:.5f} "
             f"dt={float(state.dt):.2e} "
             f"n_alive={int(state.particles.n_alive)} "
             f"stats={[int(v) for v in state.stats]}")


if __name__ == "__main__":
    main()

"""Pre-warm the compile cache for the config-5 block-timestep resume.

The binned scan body (cfg.dt_bins=4: 8 unrolled gated substeps) compiles
~8x slower than the global step; paying that inside the dense-phase wall
budget would eat the very speedup block timesteps buy.  This builds the
EXACT config-5 state/config (scripts/config5_run.build) with the dt_bins
override, primes, and runs the scan lengths the A/B and the resume will
use — the persistent cache then makes those compiles free.

Runs concurrently with the phase-1 run (the axon tunnel multiplexes
processes; the one warm-up execution costs ~2 segments of contention).

Usage: python scripts/warm_binned.py [--bins 4] [--lens 2,16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax

from config5_run import build
from summersph_tpu.integrate import prime, run_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=4)
    ap.add_argument("--lens", default="2,16")
    args = ap.parse_args()

    t0 = time.time()

    def mark(msg):
        print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

    state, cfg = build()
    cfg = cfg.with_(dt_bins=args.bins)
    mark(f"ICs built, dt_bins={args.bins}")
    state = prime(state, cfg)
    jax.block_until_ready(state.particles.pos)
    mark("primed")
    for n in [int(x) for x in args.lens.split(",") if x]:
        t1 = time.time()
        out = run_steps(state, cfg, n)
        jax.block_until_ready(out.particles.pos)
        mark(f"run_steps(n={n}) compiled+ran in {time.time() - t1:.1f}s "
             f"(t -> {float(out.t):.5f}, stats {out.stats_dict()})")


if __name__ == "__main__":
    main()

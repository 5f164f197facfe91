"""A/B wall-clock: block timesteps vs global dt on a clustered state.

Loads the config-5 checkpoint (1e6-particle collapse, the state whose dt
is set by its densest knot), runs the global engine and the binned engine
(cfg.dt_bins) from the same state, and reports wall-clock per unit of
advanced simulation time — the number VERDICT r3 item 5 asked for.

The physics cross-check (rho_max / L_z after the same advanced time) is
printed alongside; tests/test_blockstep.py carries the tolerance-grade
parity suite.

Usage:
  python scripts/blockstep_ab.py [--ckpt PATH] [--bins 4] [--base-steps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from summersph_tpu.diagnostics import measure
from summersph_tpu.integrate import init_carries, prime, run_steps
from summersph_tpu.io.checkpoint import load_npz_with_config
from summersph_tpu.ops.timestep import dt_candidates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "collapse1m", "checkpoint.npz"))
    ap.add_argument("--bins", type=int, default=4)
    ap.add_argument("--base-steps", type=int, default=2)
    ap.add_argument("--global-steps", type=int, default=16)
    args = ap.parse_args()

    t0 = time.time()

    def mark(msg):
        print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

    state, cfg = load_npz_with_config(args.ckpt)
    mark(f"loaded t={float(state.t):.4f} dt={float(state.dt):.3e} "
         f"N={int(state.particles.n_alive)} "
         f"sinks={int(jnp.sum(state.sinks.alive & (state.sinks.mass > 0)))}")

    # ---------------- global engine reference leg
    state_g = prime(state, cfg)
    jax.block_until_ready(state_g.particles.pos)
    mark("global: primed")
    # warm with the SAME n_steps (n_steps is a static arg — a different
    # count is a fresh scan compile; 16 matches config5_run's segments so
    # the disk compile cache already carries it)
    out = run_steps(state_g, cfg, args.global_steps)
    jax.block_until_ready(out.particles.pos)
    mark("global: warm")
    tw = time.time()
    out_g = run_steps(state_g, cfg, args.global_steps)
    jax.block_until_ready(out_g.particles.pos)
    wall_g = time.time() - tw
    adv_g = float(out_g.t) - float(state_g.t)
    mark(f"global: {args.global_steps} steps, {wall_g:.2f}s wall, "
         f"advanced {adv_g:.3e} yr -> {adv_g / wall_g:.3e} yr/s")
    dg = measure(out_g)

    # ---------------- binned leg from the SAME state
    B = args.bins
    cfg_b = cfg.with_(dt_bins=B)
    state_b = init_carries(state, cfg_b)
    state_b = prime(state_b, cfg_b)
    # raise the base step to what the rung spread allows: 2^(B-1) x the
    # tightest candidate (exactly the controller's relaxed bound)
    cand = dt_candidates(state_b.particles, cfg_b)
    base = float(min((1 << (B - 1)) * float(jnp.min(cand)), cfg.dt_max))
    state_b = state_b.replace(dt=jnp.asarray(base, jnp.float32))
    from summersph_tpu.blockstep import assign_rungs
    rungs = np.asarray(assign_rungs(state_b.particles, cfg_b, state_b.dt))
    alive = np.asarray(state_b.particles.alive)
    hist = np.bincount(rungs[alive], minlength=B)
    mark(f"binned: base dt {base:.3e} (global runs {float(state.dt):.3e}); "
         f"rung occupancy {hist.tolist()}")
    jax.block_until_ready(state_b.particles.pos)
    # warm with the SAME scan length as the measurement (n_steps is a
    # static arg — a different count is a second full compile of the
    # 8-substep body; scripts/warm_binned.py pre-caches this one)
    out = run_steps(state_b, cfg_b, args.base_steps)
    jax.block_until_ready(out.particles.pos)
    mark("binned: warm")
    tw = time.time()
    out_b = run_steps(state_b, cfg_b, args.base_steps)
    jax.block_until_ready(out_b.particles.pos)
    wall_b = time.time() - tw
    adv_b = float(out_b.t) - float(state_b.t)
    mark(f"binned: {args.base_steps} base steps (B={B}), {wall_b:.2f}s "
         f"wall, advanced {adv_b:.3e} yr -> {adv_b / wall_b:.3e} yr/s")
    db = measure(out_b)

    speedup = (adv_b / wall_b) / (adv_g / wall_g)
    print(f"\nA/B: binned advances simulation time {speedup:.2f}x faster "
          f"per wall second", flush=True)
    for k in ("rho_max", "e_kin", "e_int"):
        print(f"  {k}: global {float(dg[k]):.4e}  binned {float(db[k]):.4e}",
              flush=True)
    print(f"  Lz: global {float(np.asarray(dg['ang_momentum'])[2]):.4f}  "
          f"binned {float(np.asarray(db['ang_momentum'])[2]):.4f}",
          flush=True)
    print(f"  stats binned: {out_b.stats_dict()}", flush=True)


if __name__ == "__main__":
    main()

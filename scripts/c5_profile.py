"""Per-phase timing of the EXACT config-5 step (scripts/config5_run.build).

The 1e6 collapse step costs ~1.7 s on chip (vs 0.124 s gravity=none) —
this breaks that down phase by phase so the long evidence run starts from
an informed configuration.  Usage: python scripts/c5_profile.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

os.environ.setdefault("C5_SMOKE", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from config5_run import build  # noqa: E402


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    state, cfg = build()
    print(f"N={state.particles.capacity} grav_grid={cfg.grav_grid} "
          f"backend={jax.devices()[0].platform}", flush=True)

    from summersph_tpu.integrate import prime, run_steps
    from summersph_tpu.ops.eos import eos_update
    from summersph_tpu.ops.gravity import sink_gravity
    from summersph_tpu.ops.pallas_pairs import pallas_density, pallas_forces
    from summersph_tpu.ops.pm_gravity import (grav_tables, pm_long_range,
                                              pm_short_range)
    from summersph_tpu.ops.smoothing import update_smoothing
    from summersph_tpu.ops.sorted_grid import sort_particles
    from summersph_tpu.ops.timestep import next_timestep

    state = prime(state, cfg)
    sync(state.particles.pos)
    p, s = state.particles, state.sinks

    sort_j = jax.jit(lambda p: sort_particles(p, cfg, h_pad=cfg.sort_h_pad))
    (p2, grid), _ = timeit("sort_particles", sort_j, p, reps=reps)

    dens_j = jax.jit(lambda p, g: pallas_density(p, cfg, g))
    p2d, _ = timeit("pallas_density", dens_j, p2, grid, reps=reps)

    eos_j = jax.jit(lambda p: eos_update(p, cfg))
    p2e, _ = timeit("eos", eos_j, p2d, reps=reps)

    force_j = jax.jit(lambda p, g: pallas_forces(p, cfg, g))
    _, _ = timeit("pallas_forces", force_j, p2e, grid, reps=reps)

    timeit("sink_gravity", jax.jit(lambda p, s: sink_gravity(p, s)),
           p2e, s, reps=reps)

    kk = grav_tables(cfg, p.pos.dtype)
    pml_j = jax.jit(lambda p, kk: pm_long_range(p, cfg, kern_k=kk))
    (_, _, _, r_s), _ = timeit("pm_long_range (FFT)", pml_j, p2e, kk,
                               reps=reps)
    pms_j = jax.jit(lambda p, r: pm_short_range(p, cfg, r)[0])
    timeit("pm_short_range", pms_j, p2e, r_s, reps=reps)

    sm_j = jax.jit(lambda p, g: update_smoothing(p, cfg, grid=g)[0])
    timeit("update_smoothing(shared)", sm_j, p2e, grid, reps=reps)

    timeit("next_timestep", jax.jit(lambda p, dt: next_timestep(p, dt, cfg)),
           p2e, state.dt, reps=reps)

    _, t8 = timeit("run_steps(8)", lambda st: run_steps(st, cfg, 8), state,
                   reps=1)
    print(f"{'per step':34s} {t8/8*1e3:9.2f} ms  "
          f"-> {state.particles.capacity / (t8/8):.3g} particle-steps/s",
          flush=True)


if __name__ == "__main__":
    main()

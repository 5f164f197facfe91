"""Per-phase timing of the simulation step on the live backend.

Times each phase of the flagship step (sort, density, EOS, forces, PM long,
PM short, smoothing, full step) with forced host-transfer sync
(docs/PERF_NOTES.md caveat 1).  Usage:

    python scripts/profile_phases.py [N] [reps]
"""

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
from summersph_tpu.models.disc import disc_ic


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    variable_h = os.environ.get("PROF_VARH", "0") == "1"
    gravity = os.environ.get("PROF_GRAVITY", "pm")

    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(
        fixed_h=None if variable_h else h0,
        gravity=gravity, neighbor_mode="sorted",
        use_pallas=True, sorted_block=128, window_group=32,
        pallas_window=256, pallas_fetch_window=768,
        window_blocks=3, grav_window_blocks=8,
        gamma=1.4, bounding_size=1500.0,
        dt_init=1e-4, dt_min=1e-5, dt_max=1e-3,
    )
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)
    p, s = state.particles, state.sinks
    print(f"N={n} variable_h={variable_h} gravity={gravity} "
          f"backend={jax.devices()[0].platform}")

    from summersph_tpu.ops.sorted_grid import (sort_particles, sorted_density,
                                               sorted_forces)
    from summersph_tpu.ops.pallas_pairs import pallas_density, pallas_forces
    from summersph_tpu.ops.eos import eos_update
    from summersph_tpu.ops.gravity import sink_gravity
    from summersph_tpu.ops.pm_gravity import pm_long_range, pm_short_range
    from summersph_tpu.ops.timestep import next_timestep
    from summersph_tpu.integrate import prime, run_steps

    sort_j = jax.jit(lambda p: sort_particles(p, cfg))
    (p2, grid), t_sort = timeit("sort_particles", sort_j, p, reps=reps)

    dens_j = jax.jit(lambda p, g: pallas_density(p, cfg, g))
    p2d, t_dens = timeit("pallas_density", dens_j, p2, grid, reps=reps)

    eos_j = jax.jit(lambda p: eos_update(p, cfg))
    p2e, t_eos = timeit("eos", eos_j, p2d, reps=reps)

    force_j = jax.jit(lambda p, g: pallas_forces(p, cfg, g))
    _, t_force = timeit("pallas_forces", force_j, p2e, grid, reps=reps)

    sgrav_j = jax.jit(lambda p, s: sink_gravity(p, s))
    timeit("sink_gravity", sgrav_j, p2e, s, reps=reps)

    if gravity in ("pm", "bh", "treepm"):
        from summersph_tpu.ops.pm_gravity import grav_tables
        kk = grav_tables(cfg)
        # kk rides as a jit argument, not a baked constant (green_kernel_k)
        pml_j = jax.jit(lambda p, kk: pm_long_range(p, cfg, kern_k=kk))
        (_, _, _, r_s), t_pml = timeit("pm_long_range", pml_j, p2e, kk,
                                       reps=reps)
        pms_j = jax.jit(lambda p, r: pm_short_range(p, cfg, r)[0])
        timeit("pm_short_range", pms_j, p2e, r_s, reps=reps)

    if variable_h:
        from summersph_tpu.ops.smoothing import update_smoothing
        sm_j = jax.jit(lambda p, g: update_smoothing(p, cfg, grid=g)[0])
        timeit("update_smoothing(shared)", sm_j, p2e, grid, reps=reps)

    dt_j = jax.jit(lambda p, dt: next_timestep(p, dt, cfg))
    timeit("next_timestep", dt_j, p2e, state.dt, reps=reps)

    state = prime(state, cfg)

    def full(st):
        return run_steps(st, cfg, 8)
    _, t_step8 = timeit("run_steps(8)", full, state, reps=max(1, reps // 2))
    print(f"{'per step':34s} {t_step8/8*1e3:9.2f} ms  "
          f"-> {n / (t_step8/8):.3g} particle-steps/s")


if __name__ == "__main__":
    main()

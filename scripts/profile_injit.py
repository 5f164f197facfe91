"""Dispatch-free per-phase timing: each phase is run `k` times inside one
jitted lax.scan (carry-fed so XLA cannot hoist the work), so the ~30-50 ms
tunnel dispatch overhead (docs/PERF_NOTES.md caveat 2) is amortised to
nothing and the printed number is real device time per call.

Usage: python scripts/profile_injit.py [N] [k]
Env: PROF_GRAVITY (pm|none), PROF_VARH=1
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


def timeit_scan(name, fn, x0, k, *extra):
    """Time fn applied k times in sequence inside one jit.

    `extra` arrays (e.g. the PM Green's table) are threaded as jit
    *arguments* — closing over them would bake multi-MB constants into the
    executable and send the compile pathological (pm_gravity
    .green_kernel_k)."""
    @jax.jit
    def loop(x, *e):
        def body(c, _):
            return fn(c, *e), None
        return jax.lax.scan(body, x, None, length=k)[0]

    out = loop(x0, *extra)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = loop(x0, *extra)
    sync(out)
    dt = (time.perf_counter() - t0) / k
    print(f"{name:34s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
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
    p = state.particles
    print(f"N={n} k={k} variable_h={variable_h} gravity={gravity} "
          f"backend={jax.devices()[0].platform}", flush=True)

    from summersph_tpu.ops.sorted_grid import sort_particles
    from summersph_tpu.ops.pallas_pairs import pallas_density, pallas_forces
    from summersph_tpu.ops.eos import eos_update
    from summersph_tpu.ops.pm_gravity import pm_long_range, pm_short_range

    p2, grid = jax.jit(lambda p: sort_particles(p, cfg))(p)
    sync(p2)

    # sort: carry the sorted set through repeated sorts
    timeit_scan("sort_particles", lambda q: sort_particles(q, cfg)[0], p2, k)

    p2d = jax.jit(lambda q: eos_update(pallas_density(q, cfg, grid), cfg))(p2)
    sync(p2d)

    timeit_scan("pallas_density",
                lambda q: pallas_density(q, cfg, grid), p2d, k)

    def force_phase(q):
        acc, du, dalpha = pallas_forces(q, cfg, grid)
        return q.replace(acc=acc, du=du, dalpha=dalpha)
    timeit_scan("pallas_forces", force_phase, p2d, k)

    grav_on = gravity in ("pm", "bh", "treepm")
    if grav_on:
        from summersph_tpu.ops.pm_gravity import grav_tables
        kk = grav_tables(cfg)

        def pml(q, kkk):
            acc, _, _, _ = pm_long_range(q, cfg, kern_k=kkk)
            return q.replace(acc=acc)
        timeit_scan("pm_long_range", pml, p2d, k, kk)
        r_s = cfg.grav_split_rs * 2.0  # representative split scale

        def pms(q):
            acc, _ = pm_short_range(q, cfg, jnp.asarray(r_s, q.pos.dtype))
            return q.replace(acc=acc)
        timeit_scan("pm_short_range", pms, p2d, k)

    if variable_h:
        from summersph_tpu.ops.smoothing import update_smoothing

        def sm(q):
            return update_smoothing(q, cfg, grid=grid)[0]
        timeit_scan("update_smoothing(shared)", sm, p2d, k)

    from summersph_tpu.integrate import prime, step
    st = prime(state, cfg)
    sync(st)
    if grav_on:
        timeit_scan("full step", lambda s, kkk: step(s, cfg, kern_k=kkk),
                    st, max(2, k // 2), kk)
    else:
        timeit_scan("full step", lambda s: step(s, cfg), st, max(2, k // 2))


if __name__ == "__main__":
    main()

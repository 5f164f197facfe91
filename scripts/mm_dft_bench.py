"""On-chip A/B: PM Poisson solve via grav_fft='matmul' vs 'xla'.

Times the full pm_long_range phase (deposit + transform pair + gradient +
gather) at a grid, plus the bare transform pair, and checks force parity
between the two backends at the production dtype.  Measurement rules per
docs/PERF_NOTES.md: warm first, sync via a 4-byte host transfer.

Usage: python scripts/mm_dft_bench.py [grid ...] [--n N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.ops import pm_gravity as pm
from summersph_tpu.ops.mm_dft import irfft3_pruned, rfft3_pruned
from summersph_tpu.state import Particles


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def run(grid, n_p):
    print(f"--- grid={grid} (npad={2*grid}), N={n_p} ---", flush=True)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0.0, 100.0, (n_p, 3)), jnp.float32)
    p = Particles.zeros(n_p, jnp.float32).replace(
        pos=pos, mass=jnp.ones((n_p,), jnp.float32),
        alive=jnp.ones((n_p,), bool))

    accs = {}
    for mode in ("matmul", "xla"):
        if mode == "xla" and grid >= 256:
            print(f"{'pm_long_range ' + mode:44s}   skipped (XLA FFT at "
                  f"{2*grid}^3 costs ~2 s; see c5_profile)", flush=True)
            continue
        cfg = SimConfig(gravity="pm", grav_grid=grid, grav_fft=mode)
        tabs = pm.grav_tables(cfg, jnp.float32)
        full = jax.jit(lambda particles, kk, _cfg=cfg: pm.pm_long_range(
            particles, _cfg, kern_k=kk)[0])
        acc, _ = timeit(f"pm_long_range {mode}", full, p, tabs)
        accs[mode] = np.asarray(acc)

    # bare transform pair (matmul)
    cfg = SimConfig(gravity="pm", grav_grid=grid, grav_fft="matmul")
    tabs = pm.grav_tables(cfg, jnp.float32)
    rho = jnp.asarray(rng.standard_normal((grid,) * 3), jnp.float32)
    pair = jax.jit(lambda r, t: irfft3_pruned(*rfft3_pruned(r, t), t))
    timeit("rfft3+irfft3 pruned matmul", pair, rho, tabs)

    if len(accs) == 2:
        scale = max(np.abs(accs["xla"]).max(), 1e-30)
        err = np.abs(accs["matmul"] - accs["xla"]).max() / scale
        print(f"force parity matmul vs xla: max rel {err:.3e}", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    grids = [int(a) for a in args] or [128, 256]
    n_p = 1048576
    if "--n" in sys.argv:
        n_p = int(sys.argv[sys.argv.index("--n") + 1])
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for g in grids:
        run(g, n_p)


if __name__ == "__main__":
    main()

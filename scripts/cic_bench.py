"""CIC deposit/gather formulation shoot-out (on chip).

pm_long_range's dominant sub-phases at grav_grid=128 are NOT the FFT: the
CIC deposit scatter-add costs 68 ms and the CIC force gather 59 ms at
N=1e6 (scripts/pm_profile.py) — both in the elementwise random scatter /
gather class docs/PERF_NOTES.md measured at ~0.1 G elem/s.  This script
times alternative formulations so the rewrite lands on measured ground:

  deposit:
    a. current      — 8 per-tap .at[flat].add calls
    b. one-scatter  — single .at[].add over the concatenated [8N] taps
    c. sorted       — particles pre-sorted by mesh key,
                      indices_are_sorted=True (sortedness is free on PM
                      recompute steps: one extra 5-operand lax.sort)
    d. window       — lax.scatter_add of [2,2,2] update windows (one index
                      per particle instead of 8)
    e. scan-slab    — mesh-sorted chunks accumulated into a VMEM-sized
                      dynamic-slice window, written back with
                      dynamic_update_slice in a lax.scan (row-aligned
                      traffic only, no scatter at all)
  gather:
    f. current      — 8 per-tap flat_field[flat] gathers
    g. window       — lax.gather with slice_sizes=(2,2,2,3)
    h. sorted       — mesh-key-sorted particle order + indices_are_sorted

Usage: python scripts/cic_bench.py [grid] [n_particles]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.ops import pm_gravity as pm


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
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def taps(pos, origin, cell, n):
    """(i0 [N,3] int32, frac [N,3]) for the 2x2x2 CIC stencil."""
    u = (pos - origin) / cell - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    return i0, u - i0


def tap_lists(pos, mass, origin, cell, n):
    """(flat [8N] int32, w [8N]) concatenated tap lists."""
    i0, frac = taps(pos, origin, cell, n)
    fl, wv = [], []
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        ix = jnp.clip(i0[:, 0] + dx, 0, n - 1)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            iy = jnp.clip(i0[:, 1] + dy, 0, n - 1)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                iz = jnp.clip(i0[:, 2] + dz, 0, n - 1)
                fl.append((ix * n + iy) * n + iz)
                wv.append(mass * wx * wy * wz)
    return jnp.concatenate(fl), jnp.concatenate(wv)


def dep_one_scatter(pos, mass, origin, cell, n, sorted_flags=False):
    flat, w = tap_lists(pos, mass, origin, cell, n)
    return jnp.zeros((n * n * n,), w.dtype).at[flat].add(
        w, indices_are_sorted=sorted_flags).reshape(n, n, n)


def dep_window(pos, mass, origin, cell, n):
    """One lax.scatter_add of [2,2,2] windows per particle."""
    i0, frac = taps(pos, origin, cell, n)
    i0 = jnp.clip(i0, 0, n - 2)
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)  # [N, 2]
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
    upd = (mass[:, None, None, None] * wx[:, :, None, None]
           * wy[:, None, :, None] * wz[:, None, None, :])  # [N, 2, 2, 2]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2))
    return jax.lax.scatter_add(
        jnp.zeros((n, n, n), upd.dtype), i0, upd, dn)


def dep_scan_slab(pos, mass, origin, cell, n, chunk=8192, win_rows=None):
    """Mesh-sorted chunks -> per-chunk [win] accumulation via in-chunk
    scatter into a small window + dynamic_update_slice write-back."""
    N = pos.shape[0]
    flat8, w8 = tap_lists(pos, mass, origin, cell, n)  # [8N]
    # sort taps by flat index (the one big sort)
    flat_s, w_s = jax.lax.sort([flat8, w8], num_keys=1, is_stable=False)
    T = flat_s.shape[0]
    C = T // chunk
    win = win_rows if win_rows is not None else 2 * n * n + 2 * n + 4 + chunk
    win = -(-win // 128) * 128
    mesh = jnp.zeros((n * n * n + win,), w8.dtype)  # tail pad for windows

    f2 = flat_s.reshape(C, chunk)
    w2 = w_s.reshape(C, chunk)
    base = (f2[:, 0] // 128) * 128

    def body(mesh, it):
        f_c, w_c, b_c = it
        cur = jax.lax.dynamic_slice(mesh, (b_c,), (win,))
        cur = cur.at[jnp.minimum(f_c - b_c, win - 1)].add(
            w_c, indices_are_sorted=True)
        return jax.lax.dynamic_update_slice(mesh, cur, (b_c,)), None

    mesh = jax.lax.scan(body, mesh, (f2, w2, base))[0]
    return mesh[:n * n * n].reshape(n, n, n)


def gather_window(field, pos, origin, cell, n):
    """lax.gather of [2,2,2,3] slices + weight contraction."""
    i0, frac = taps(pos, origin, cell, n)
    i0 = jnp.clip(i0, 0, n - 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    cube = jax.lax.gather(field, i0, dn,
                          slice_sizes=(2, 2, 2, 3))  # [N, 2, 2, 2, 3]
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :])
    return jnp.sum(cube * w[..., None], axis=(1, 2, 3))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_p = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    print(f"grid={n}, N={n_p}, platform={jax.devices()[0].platform}",
          flush=True)
    rng = np.random.default_rng(0)
    # ball-ish distribution (like the disc ICs), then a mesh-key-sorted copy
    pos_np = rng.normal(0.0, 30.0, (n_p, 3))
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, (n_p,)), jnp.float32)
    origin = jnp.asarray(pos_np.min(0) - 1.0, jnp.float32)
    cell = jnp.float32((pos_np.max() - pos_np.min() + 2.0) / (n - 3))

    i0 = np.floor((pos_np - np.asarray(origin)) / float(cell) - 0.5)
    flat = ((np.clip(i0[:, 0], 0, n - 1) * n + np.clip(i0[:, 1], 0, n - 1))
            * n + np.clip(i0[:, 2], 0, n - 1)).astype(np.int64)
    order = np.argsort(flat, kind="stable")
    pos_s = jnp.asarray(pos_np[order], jnp.float32)
    mass_s = jnp.asarray(np.asarray(mass)[order], jnp.float32)

    jd = jax.jit(partial(pm._cic_deposit, n=n))
    ref, _ = timeit("deposit a: current 8x at[].add", jd, pos, mass,
                    origin, cell)

    j1 = jax.jit(partial(dep_one_scatter, n=n))
    out, _ = timeit("deposit b: one [8N] scatter", j1, pos, mass,
                    origin, cell)

    js = jax.jit(partial(dep_one_scatter, n=n, sorted_flags=True))
    out_s, _ = timeit("deposit c: mesh-sorted + sorted flag", js, pos_s,
                      mass_s, origin, cell)

    jw = jax.jit(partial(dep_window, n=n))
    out_w, _ = timeit("deposit d: [2,2,2] window scatter", jw, pos, mass,
                      origin, cell)

    jss = jax.jit(partial(dep_scan_slab, n=n))
    out_ss, _ = timeit("deposit e: scan-slab (sorted, dus)", jss, pos_s,
                       mass_s, origin, cell)

    r = np.asarray(ref)
    for name, o in (("b", out), ("c", out_s), ("d", out_w), ("e", out_ss)):
        err = np.abs(np.asarray(o) - r).max() / max(r.max(), 1e-30)
        print(f"  deposit {name} vs a: max rel err {err:.2e}", flush=True)

    field = jnp.asarray(rng.standard_normal((n, n, n, 3)), jnp.float32)
    jg = jax.jit(partial(pm._cic_gather, n=n))
    gref, _ = timeit("gather f: current 8x flat_field[flat]", jg, field,
                     pos, origin, cell)
    jgw = jax.jit(partial(gather_window, n=n))
    gw, _ = timeit("gather g: [2,2,2,3] window gather", jgw, field, pos,
                   origin, cell)
    _, _ = timeit("gather h: f on mesh-sorted order", jg, field, pos_s,
                  origin, cell)
    gr = np.asarray(gref)
    err = np.abs(np.asarray(gw) - gr).max() / max(np.abs(gr).max(), 1e-30)
    print(f"  gather g vs f: max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

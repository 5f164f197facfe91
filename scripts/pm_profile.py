"""PM long-range sub-phase microbench + matmul-DFT prototype (on chip).

pm_long_range at the config-5 production mesh costs 1897 ms/step
(scripts/c5_profile.py) but that number is the whole phase: CIC deposit
(XLA scatter-add), rfftn/irfftn on the 2x-padded mesh, the fd4 gradient
(12 rolls), and the CIC gather (elementwise random gather — the class of
op docs/PERF_NOTES.md measured at ~0.1 G elem/s).  This script times each
sub-phase separately so the optimization lands where the time actually is,
and prototypes the classic TPU alternative for the FFT part: a DFT as
batched matmuls (the MXU runs ~200 TFLOP/s bf16 / ~35 TFLOP/s f32 while
the VPU-lowered FFT is memory/transcendental bound).  The prototype keeps
real/imag as separate f32 planes — the tunneled backend raises
UNIMPLEMENTED on complex executable I/O, and the MXU wants plain f32
operands anyway.

Usage: python scripts/pm_profile.py [grid] [n_particles]
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


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def dft_mats(n, dtype=jnp.float32):
    """(C, S): [n, n] cos/sin DFT matrices, C[k, j] = cos(2 pi k j / n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * j / n
    return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))


def fft3_matmul(x, C, S):
    """Full 3-D DFT of a real cube via 6 batched matmuls on the MXU.

    x: [n, n, n] real.  Returns (re, im) of X[k0, k1, k2] with the
    e^{-i 2 pi k j / n} convention (matches np.fft.fftn).  Contractions run
    axis-by-axis on the minor dim: operands reshape to [n*n, n] matmuls.
    """
    # axis 2
    re = jnp.einsum("abj,kj->abk", x, C)
    im = -jnp.einsum("abj,kj->abk", x, S)
    # axis 1: (re + i im) @ (C - i S) along axis 1
    re, im = (jnp.einsum("ajb,kj->akb", re, C)
              + jnp.einsum("ajb,kj->akb", im, S),
              jnp.einsum("ajb,kj->akb", im, C)
              - jnp.einsum("ajb,kj->akb", re, S))
    # axis 0
    re, im = (jnp.einsum("jab,kj->kab", re, C)
              + jnp.einsum("jab,kj->kab", im, S),
              jnp.einsum("jab,kj->kab", im, C)
              - jnp.einsum("jab,kj->kab", re, S))
    return re, im


def ifft3_matmul_real(re, im, C, S):
    """Real part of the inverse 3-D DFT of (re, im), via matmuls."""
    n = C.shape[0]
    # inverse kernel e^{+i...}: conjugate transforms
    re, im = (jnp.einsum("jab,kj->kab", re, C)
              - jnp.einsum("jab,kj->kab", im, S),
              jnp.einsum("jab,kj->kab", im, C)
              + jnp.einsum("jab,kj->kab", re, S))
    re, im = (jnp.einsum("ajb,kj->akb", re, C)
              - jnp.einsum("ajb,kj->akb", im, S),
              jnp.einsum("ajb,kj->akb", im, C)
              + jnp.einsum("ajb,kj->akb", re, S))
    out = (jnp.einsum("abj,kj->abk", re, C)
           - jnp.einsum("abj,kj->abk", im, S))
    return out / (n ** 3)


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_p = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    npad = 2 * grid
    print(f"grid={grid} (npad={npad}), N={n_p}, "
          f"platform={jax.devices()[0].platform}", flush=True)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0.0, 100.0, (n_p, 3)), jnp.float32)
    mass = jnp.ones((n_p,), jnp.float32)
    origin = jnp.zeros((3,), jnp.float32)
    cell = jnp.float32(100.0 / (grid - 3))

    dep = jax.jit(lambda p, m: pm._cic_deposit(p, m, origin, cell, grid))
    rho, _ = timeit("cic_deposit", dep, pos, mass)

    pad = jax.jit(lambda r: jnp.zeros((npad,) * 3, r.dtype)
                  .at[:grid, :grid, :grid].set(r))
    rho_pad, _ = timeit("zero-pad", pad, rho)

    # real/imag planes at every jit boundary: the tunneled backend raises
    # UNIMPLEMENTED on complex executable inputs/outputs
    fwd = jax.jit(lambda r: (lambda c: (c.real, c.imag))(jnp.fft.rfftn(r)))
    (rk_re, rk_im), _ = timeit("rfftn (XLA)", fwd, rho_pad)

    cfg = SimConfig(gravity="pm", grav_grid=grid)
    kern = pm.grav_tables(cfg, jnp.float32)
    mul = jax.jit(lambda rr, ri, kk: (rr * kk * (cell * cell),
                                      ri * kk * (cell * cell)))
    (pk_re, pk_im), _ = timeit("green multiply", mul, rk_re, rk_im, kern)

    inv = jax.jit(lambda pr, pi: jnp.fft.irfftn(
        jax.lax.complex(pr, pi), s=(npad,) * 3))
    phi, _ = timeit("irfftn (XLA)", inv, pk_re, pk_im)

    grad = jax.jit(lambda ph: pm._fd4_gradient(ph, cell))
    gxyz, _ = timeit("fd4 gradient (12 rolls)", grad, phi)

    force = jnp.stack([g[:grid, :grid, :grid] for g in gxyz], axis=-1)
    gat = jax.jit(lambda f, p: pm._cic_gather(f, p, origin, cell, grid))
    timeit("cic_gather", gat, force, pos)

    # full-phase reference via the public entry
    from summersph_tpu.state import Particles
    pp = Particles.zeros(n_p, jnp.float32).replace(
        pos=pos, mass=mass, alive=jnp.ones((n_p,), bool))
    full = jax.jit(lambda particles, kk: pm.pm_long_range(
        particles, cfg, kern_k=kk)[0])
    timeit("pm_long_range (whole)", full, pp, kern)

    # --- matmul-DFT prototype ------------------------------------------
    C, S = dft_mats(npad)
    f3 = jax.jit(lambda x: fft3_matmul(x, C, S))
    (re, im), _ = timeit("fft3 matmul fwd (f32 MXU)", f3, rho_pad)

    i3 = jax.jit(lambda r, i: ifft3_matmul_real(r, i, C, S))
    phi_mm, _ = timeit("ifft3 matmul inv (f32 MXU)", i3, re, im)

    # numerics: matmul roundtrip vs the padded input
    rt = np.asarray(phi_mm)
    ref = np.asarray(rho_pad)
    err = np.abs(rt - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"matmul DFT roundtrip max rel err: {err:.3e}", flush=True)

    # spot-check fwd against XLA fft (full complex fftn on half-spectrum
    # cube is awkward; compare against rfftn on the kz <= n/2 half)
    re_ref = np.asarray(rk_re)
    re_mm = np.asarray(re[:, :, :npad // 2 + 1])
    scale = max(np.abs(re_ref).max(), 1e-30)
    print("matmul fwd vs rfftn max rel err:",
          f"{np.abs(re_mm - re_ref).max() / scale:.3e}", flush=True)


if __name__ == "__main__":
    main()

"""Pruned 3-D DFT as batched MXU matmuls — the PM Poisson solve's FFT path.

XLA's TPU FFT lowering is fine at 256^3 (15 ms measured) but falls off a
cliff at 512^3 (1.9 s, scripts/c5_profile.py) — 127x the time for 8x the
volume — which is what capped the PM mesh at grav_grid=128 and left the
short-range gravity pass burning ~8k candidate lanes/row (docs/ROUND3.md
window-extent table).  A DFT expressed as per-axis matmuls runs on the MXU
at matmul speed and, unlike a generic FFT, *prunes* for free:

  * forward: the mass mesh is [n, n, n] inside a 2x zero-padded [npad]^3
    box (isolated BCs, Hockney-Eastwood) — each axis contracts with a
    [npad, n] DFT matrix, never materialising the padded zeros;
    the z axis keeps only the rfft half spectrum H = npad/2 + 1
    (the input is real), matching the Green's table layout exactly;
  * inverse: only the n^3 mesh crop plus the 4th-order finite-difference
    stencil's 2-cell wraparound ghost ring is ever needed, so the output
    rows are pruned to m = n + 4 indices (arange(m) - 2 mod npad) per axis
    — the hermitian z inverse folds conj symmetry into [m, H] matrices.

Cost: ~2.2e11 f32 MAC at n=256 => ~15-30 ms of MXU time vs 1.9 s of XLA
FFT; at n=128 it is also faster than the XLA path (measured in
scripts/pm_profile.py).  All contractions run at Precision.HIGHEST (full
f32) — the default bf16 matmul precision costs ~4e-3 roundtrip error
(measured), far above the PM force split's 0.1% class; HIGHEST holds the
roundtrip at ~1e-6.

The DFT matrices are small ([npad, n] f32 = 0.5 MB at n=256) but are still
passed into jitted code as runtime arguments (bundled with the Green's
table by ops.pm_gravity.grav_tables) — same rule as the Green's table
itself: no multi-MB trace constants.

Replaces the reference's recursive Barnes-Hut gravity walk
(SUMMER_SPH.f90:249-290) far field at higher mesh resolution than the XLA
FFT allowed; accuracy is unchanged (same Green's function, same split).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

_EINSUM = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=4)
def dft_tables(n: int, npad: int, dtype_str: str):
    """Host-built (f64) DFT matrix bundle for the pruned transform pair.

    Keys:
      cz, sz   [H, n]    forward z (real -> half spectrum), H = npad/2 + 1
      cf, sf   [npad, n] forward x/y (zero-padded input pruned to n columns)
      ci, si   [m, npad] inverse x/y, output pruned to the m = n + 4 rows
                         (arange(m) - 2) mod npad — the mesh crop plus the
                         fd4 stencil's wraparound ghost ring
      czi, szi [m, H]    hermitian inverse z (conj-symmetry weights folded)
    """
    import numpy as np

    H = npad // 2 + 1
    m = n + 4
    j_in = np.arange(n, dtype=np.float64)
    k_half = np.arange(H, dtype=np.float64)
    k_full = np.arange(npad, dtype=np.float64)
    out_idx = (np.arange(m, dtype=np.float64) - 2.0) % npad

    tw = 2.0 * np.pi / npad
    ang_z = tw * k_half[:, None] * j_in[None, :]          # [H, n]
    ang_f = tw * k_full[:, None] * j_in[None, :]          # [npad, n]
    ang_i = tw * out_idx[:, None] * k_full[None, :]       # [m, npad]
    ang_zi = tw * out_idx[:, None] * k_half[None, :]      # [m, H]
    # hermitian fold: x[j] = (1/N) sum_k w_k (re_k cos - im_k sin),
    # w = 1 at k = 0 and k = npad/2, else 2 (the conjugate half)
    w = np.full((H,), 2.0)
    w[0] = 1.0
    w[-1] = 1.0

    dt = np.float64 if dtype_str == "float64" else np.float32
    tabs = {
        "cz": np.cos(ang_z), "sz": np.sin(ang_z),
        "cf": np.cos(ang_f), "sf": np.sin(ang_f),
        "ci": np.cos(ang_i), "si": np.sin(ang_i),
        "czi": w[None, :] * np.cos(ang_zi),
        "szi": w[None, :] * np.sin(ang_zi),
    }
    return {k: jax.device_put(v.astype(dt)) for k, v in tabs.items()}


def rfft3_pruned(rho, t):
    """rfftn(zero-pad(rho, npad^3)) without materialising the padding.

    rho: [n, n, n] real.  Returns (re, im) of shape [npad, npad, H] in
    np.fft.rfftn layout (z half spectrum minor).
    """
    cz, sz = t["cz"], t["sz"]
    cf, sf = t["cf"], t["sf"]
    # z: real input -> half spectrum
    re = _EINSUM("abj,kj->abk", rho, cz)                  # [n, n, H]
    im = -_EINSUM("abj,kj->abk", rho, sz)
    # y: complex, input pruned to n rows
    re, im = (_EINSUM("ajb,kj->akb", re, cf) + _EINSUM("ajb,kj->akb", im, sf),
              _EINSUM("ajb,kj->akb", im, cf) - _EINSUM("ajb,kj->akb", re, sf))
    # x
    re, im = (_EINSUM("jab,kj->kab", re, cf) + _EINSUM("jab,kj->kab", im, sf),
              _EINSUM("jab,kj->kab", im, cf) - _EINSUM("jab,kj->kab", re, sf))
    return re, im


def irfft3_pruned(re, im, t):
    """Real inverse of the half-spectrum (re, im), output pruned per axis to
    the m = n + 4 ghost-ringed crop rows (see dft_tables).  [m, m, m]."""
    ci, si = t["ci"], t["si"]
    npad = ci.shape[1]
    # x first: [npad, npad, H] -> [m, npad, H] (the big prune)
    re, im = (_EINSUM("jbc,aj->abc", re, ci) - _EINSUM("jbc,aj->abc", im, si),
              _EINSUM("jbc,aj->abc", im, ci) + _EINSUM("jbc,aj->abc", re, si))
    # y
    re, im = (_EINSUM("ajc,bj->abc", re, ci) - _EINSUM("ajc,bj->abc", im, si),
              _EINSUM("ajc,bj->abc", im, ci) + _EINSUM("ajc,bj->abc", re, si))
    # z: hermitian fold to real output
    phi = (_EINSUM("abk,jk->abj", re, t["czi"])
           - _EINSUM("abk,jk->abj", im, t["szi"]))
    return phi / (npad * npad * npad)


def fd4_gradient_pruned(phi_m, cell, n: int):
    """F = -grad phi via 4th-order central differences on the ghost-ringed
    m-cube (phi_m[a] = phi[(a - 2) mod npad]): for output index j in [0, n)
    the stencil reads phi_m[j .. j+4] — pure static slices, no rolls.
    Returns (gx, gy, gz), each [n, n, n]."""
    inv12c = 1.0 / (12.0 * cell)

    def d(axis):
        def sl(lo):
            idx = [slice(2, 2 + n)] * 3
            idx[axis] = slice(lo, lo + n)
            return phi_m[tuple(idx)]
        return (-sl(4) + 8.0 * sl(3) - 8.0 * sl(1) + sl(0)) * inv12c

    return -d(0), -d(1), -d(2)


__all__ = ["dft_tables", "rfft3_pruned", "irfft3_pruned",
           "fd4_gradient_pruned"]

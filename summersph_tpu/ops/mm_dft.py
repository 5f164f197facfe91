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
      ci_p, si_p [m_p, npad]  same with m padded up to a multiple of 8
                         (the extra ghost rows are discarded) so the
                         pencil-sharded solve can shard the output axis
                         over 2/4/8 devices (poisson_pencil)
      czi, szi [m, H]    hermitian inverse z (conj-symmetry weights folded)
    """
    import numpy as np

    H = npad // 2 + 1
    m = n + 4
    m_p = -(-m // 8) * 8
    j_in = np.arange(n, dtype=np.float64)
    k_half = np.arange(H, dtype=np.float64)
    k_full = np.arange(npad, dtype=np.float64)
    out_idx = (np.arange(m, dtype=np.float64) - 2.0) % npad
    out_idx_p = (np.arange(m_p, dtype=np.float64) - 2.0) % npad

    tw = 2.0 * np.pi / npad
    ang_z = tw * k_half[:, None] * j_in[None, :]          # [H, n]
    ang_f = tw * k_full[:, None] * j_in[None, :]          # [npad, n]
    ang_i = tw * out_idx[:, None] * k_full[None, :]       # [m, npad]
    ang_ip = tw * out_idx_p[:, None] * k_full[None, :]    # [m_p, npad]
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
        "ci_p": np.cos(ang_ip), "si_p": np.sin(ang_ip),
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


def poisson_pencil(rho_local, t, kern_k, scale, axis_name: str, n_dev: int):
    """Sharded (pencil) Poisson solve for the slab decomposition
    (VERDICT r3 item 6): phi_m = irfft3(kern_k * scale * rfft3(sum_d
    rho_local_d)) with the transforms' heavy middle sharded over the
    device axis instead of replicated.

    Pipeline (per device, D = n_dev):
      reduce_scatter x      rho [n,n,n] local deposits -> [n/D, n, n] owned
      z, y transforms       local einsums -> [n/D, npad, H]
      all_to_all x<->y      -> [n, npad/D, H] (the pencil transpose)
      x transform + Green   local; kern_k sliced to this device's ky block
      inverse x             local, output pruned to m_p ghost-crop rows
      all_to_all back       -> [m_p/D, npad, H]
      inverse y, z          local -> [m_p/D, m, m]
      all_gather x          -> phi_m [m, m, m] replicated (the fd4 + CIC
                            consumers read arbitrary x-planes)

    Per-device transform FLOPs and spectrum residency scale 1/D (the
    [npad, npad, H] intermediate — 539 MB at grid 256 — becomes
    [npad, npad/D, H]); the boundary stages (deposit merge, phi gather)
    stay O(n^3) bytes, same order as the replicated-mesh psum they
    replace, so total comm is unchanged while compute/memory scale.
    Requires D | npad and D | m_p (powers of two up to 8 with the padded
    tables from dft_tables); callers fall back to the replicated solve
    otherwise (ops.pm_gravity.pm_long_range).
    """
    ci, si = t["ci_p"], t["si_p"]          # [m_p, npad] padded ghost-crop
    cz, sz = t["cz"], t["sz"]
    cf, sf = t["cf"], t["sf"]
    npad = cf.shape[0]
    m_p = ci.shape[0]
    m = t["ci"].shape[0]

    rho_sh = jax.lax.psum_scatter(rho_local, axis_name,
                                  scatter_dimension=0, tiled=True)
    # z (real -> half spectrum), y: local on the x-slab
    re = _EINSUM("abj,kj->abk", rho_sh, cz)
    im = -_EINSUM("abj,kj->abk", rho_sh, sz)
    re, im = (_EINSUM("ajb,kj->akb", re, cf) + _EINSUM("ajb,kj->akb", im, sf),
              _EINSUM("ajb,kj->akb", im, cf) - _EINSUM("ajb,kj->akb", re, sf))
    # pencil transpose: x-sharded -> ky-sharded
    re = jax.lax.all_to_all(re, axis_name, split_axis=1, concat_axis=0,
                            tiled=True)
    im = jax.lax.all_to_all(im, axis_name, split_axis=1, concat_axis=0,
                            tiled=True)
    # x transform (full axis, local)
    re, im = (_EINSUM("jab,kj->kab", re, cf) + _EINSUM("jab,kj->kab", im, sf),
              _EINSUM("jab,kj->kab", im, cf) - _EINSUM("jab,kj->kab", re, sf))
    # Green multiply on this device's ky block
    d = jax.lax.axis_index(axis_name)
    kk = jax.lax.dynamic_slice_in_dim(kern_k, d * (npad // n_dev),
                                      npad // n_dev, axis=1) * scale
    re = re * kk
    im = im * kk
    # inverse x: prune to the (D-padded) ghost-crop rows
    re, im = (_EINSUM("jbc,aj->abc", re, ci) - _EINSUM("jbc,aj->abc", im, si),
              _EINSUM("jbc,aj->abc", im, ci) + _EINSUM("jbc,aj->abc", re, si))
    # transpose back: out-x-sharded, ky full
    re = jax.lax.all_to_all(re, axis_name, split_axis=0, concat_axis=1,
                            tiled=True)
    im = jax.lax.all_to_all(im, axis_name, split_axis=0, concat_axis=1,
                            tiled=True)
    # inverse y (prune to m), hermitian inverse z
    ciy, siy = t["ci"], t["si"]
    re, im = (_EINSUM("ajc,bj->abc", re, ciy) - _EINSUM("ajc,bj->abc", im, siy),
              _EINSUM("ajc,bj->abc", im, ciy) + _EINSUM("ajc,bj->abc", re, siy))
    phi = (_EINSUM("abk,jk->abj", re, t["czi"])
           - _EINSUM("abk,jk->abj", im, t["szi"]))
    phi = phi / (npad * npad * npad)
    phi = jax.lax.all_gather(phi, axis_name, tiled=True)   # [m_p, m, m]
    return phi[:m]


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

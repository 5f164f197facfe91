"""Self-gravity at scale: particle-mesh (FFT) + short-range correction.

TPU-native replacement for the reference's recursive Barnes-Hut monopole
walk (SUMMER_SPH.f90:249-290).  A pointer-chasing tree walk is hostile to
XLA; the classic accelerator-native equivalent with the same (percent-level)
accuracy is the TreePM force split (Gadget-style; PAPERS.md lists the
GPU-BH/Cornerstone lineage — we go one step further to the FFT form, which
maps onto XLA's native batched FFTs):

  F_total(r) = F_long(r) + F_short(r)

* F_long: cloud-in-cell (CIC) mass deposit on a `grav_grid`^3 mesh over the
  live bounding cube; Poisson solve with the isolated-boundary
  (Hockney-Eastwood) Green's function — the FFT of the open-space smoothed
  potential -G erf(r/(2 r_s))/r on the 2x zero-padded grid — with the CIC
  window deconvolved twice; force via 4th-order finite differences of the
  potential (`cfg.grav_gradient == 'fd'`, one inverse FFT) or the exact
  spectral gradient F(k) = -i k phi(k) (three inverse FFTs, ~2x the FFT
  cost for a fraction-of-a-percent mid-k accuracy gain); CIC-interpolated
  back to particles.  The circulant convolution leaves *valid* open-space
  potential values in the zero-padded half of the grid, so the FD stencil's
  wrap-around at the crop edges reads correct data by construction.
* F_short: direct pair sum over gravity-sized sorted key windows (the
  ops.sorted_grid machinery with cell = r_cut, run on a slim 7-operand
  sort of just x/y/z/m/h/index) of the complementary kernel

      g_short(r) = f_spline(r/h) - S(r),
      S(r) = erf(r/(2 r_s)) - r/(r_s sqrt(pi)) exp(-r^2/(4 r_s^2)),

  where S is the fraction of a Gaussian-smoothed point mass's force at r
  (what the mesh already delivers) and f_spline is the reference's
  compact-support softening (ops.kernels.grav_softening, receiver-side h as
  in "SUMMER_SPH - Variable.f90":298-301).  g_short -> 0 beyond
  r_cut = rcut_rs * r_s, so the pair sum is local.

Accuracy: the reference's one gravity-accuracy knob, the opening angle
theta (parameters.txt / SUMMER_SPH.f90:825), maps onto the split cutoff via
SimConfig.effective_rcut_rs() — smaller theta => larger r_cut => smaller
tail-truncation error, monotonically (tests/test_gravity.py).  At the
default theta=0.5 the rms total-force error vs direct summation is a few
tenths of a percent — comparable to or tighter than the reference's
theta=0.5 monopole walk (~1% typical).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from ..utils.units import G, PI
from .kernels import grav_softening
from .neighbors import SENTINEL_KEY
from .sorted_grid import LANES, PLANE_OFFSETS, _cell_key, _pad_to


@lru_cache(maxsize=4)
def green_kernel_k(npad: int, grav_split_rs: float, dtype_str: str):
    """Scale-free isolated-BC Green's function on the padded grid, in k-space.

    Hockney-Eastwood: the FFT of the *open-space* smoothed point-mass
    potential K(q) = -G erf(q / (2 r_s)) / q sampled with wrapped
    displacements in cell units (q), with the CIC assignment window
    deconvolved twice.  Scale-free: with r_s fixed in cell units, K never
    changes as the particle box rescales, so this is a true one-time table.

    Computed host-side in f64 numpy (exact, one-time: ~0.5 s at npad=256)
    and memoized as a device array keyed on (npad, grav_split_rs, dtype).
    It must be *passed into* jitted code as a runtime argument — baking a
    tens-of-MB constant into an executable sends XLA compile times
    pathological (round 2: a 384^3-padded compile was abandoned at 75 min)
    and bloats the compile cache; as an argument the same mesh compiles in
    seconds and the finer 256^3 mesh becomes usable.

    The table is returned as a REAL [npad, npad, npad/2+1] array: K(q) is
    even in every axis (it depends on the wrapped displacement only through
    q^2), so its rFFT is real to machine precision (measured max|imag| ~
    8e-18 of max|real|) — and the axon-tunneled TPU backend raises
    UNIMPLEMENTED on complex64 executable inputs/outputs, so a real table
    is not just half the transfer, it is the only kind that works.
    """
    import numpy as np
    from scipy.special import erf as np_erf

    # Disk-memoized: the host build is O(npad^3) single-core numpy — measured
    # 503 s at npad=512 on the 1-core build VM (erf + rfftn over 1.3e8 f64
    # points).  Every process start (bench, resumable config-5 passes, mesh
    # sweep) would re-pay it; a ~270 MB .npy loads in ~1 s.  Written
    # atomically (tmp + rename) so a killed process never leaves a truncated
    # table for a later run to load.
    import os

    cache_dir = os.environ.get("SUMMERSPH_GREEN_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".green_cache")
    cache_path = os.path.join(
        cache_dir, f"green_npad{npad}_rs{grav_split_rs:g}_{dtype_str}.npy")
    if os.path.exists(cache_path):
        try:
            return jax.device_put(np.load(cache_path))
        except Exception:
            os.remove(cache_path)  # truncated/corrupt: rebuild below

    idx = np.arange(npad)
    d1 = np.where(idx <= npad // 2, idx, idx - npad).astype(np.float64)
    q_grid = np.sqrt(d1[:, None, None] ** 2 + d1[None, :, None] ** 2
                     + d1[None, None, :] ** 2)
    q_safe = np.maximum(q_grid, 1.0e-30)
    kq = -G * np_erf(q_safe / (2.0 * grav_split_rs)) / q_safe
    kq[0, 0, 0] = -G / (grav_split_rs * float(np.sqrt(np.pi)))

    # Deconvolve the CIC assignment window twice (deposit + interpolation):
    # W_CIC(k) = prod_i sinc^2(k_i cell / 2), also scale-free in cell units.
    kxq = np.fft.fftfreq(npad) * np.pi  # k * cell / 2 on the padded grid
    kzq = np.fft.rfftfreq(npad) * np.pi

    def sinc2(x):
        s = np.where(np.abs(x) > 1.0e-6,
                     np.sin(x) / np.where(np.abs(x) > 1.0e-6, x, 1.0), 1.0)
        return s * s

    w_cic = (sinc2(kxq)[:, None, None] * sinc2(kxq)[None, :, None]
             * sinc2(kzq)[None, None, :])
    rdtype = np.float64 if dtype_str == "float64" else np.float32
    host = (np.fft.rfftn(kq).real
            / np.maximum(w_cic * w_cic, 0.05)).astype(rdtype)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy to .tmp
            np.save(f, host)
        os.replace(tmp, cache_path)
    except Exception:
        pass  # read-only fs: stay process-memoized only
    return jax.device_put(host)


def grav_tables(cfg: SimConfig, dtype=None):
    """The runtime gravity table bundle for `cfg` (None when gravity needs
    none).  Host-level helper: call OUTSIDE jit and pass the result down as
    the `kern_k` argument of prime/run_steps/step/force_eval — the integrate
    wrappers do this automatically.

    With cfg.grav_fft == 'matmul' the bundle is a dict pytree: the Green's
    table under 'kern_k' plus the pruned-DFT matrices (ops.mm_dft) — all
    runtime arguments for the same reason the Green's table is one."""
    if cfg.gravity not in ("bh", "pm", "treepm"):
        return None
    name = (dtype if isinstance(dtype, str)
            else jnp.dtype(dtype or cfg.np_dtype()).name)
    kern = green_kernel_k(2 * cfg.grav_grid, cfg.grav_split_rs, name)
    if cfg.grav_fft != "matmul":
        return kern
    from .mm_dft import dft_tables
    tabs = dict(dft_tables(cfg.grav_grid, 2 * cfg.grav_grid, name))
    tabs["kern_k"] = kern
    return tabs


def _cic_deposit(pos, mass, origin, cell, n):
    """CIC (trilinear) mass deposit onto an [n, n, n] mesh (flattened)."""
    u = (pos - origin) / cell - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    rho = jnp.zeros((n * n * n,), mass.dtype)
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        ix = jnp.clip(i0[:, 0] + dx, 0, n - 1)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            iy = jnp.clip(i0[:, 1] + dy, 0, n - 1)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                iz = jnp.clip(i0[:, 2] + dz, 0, n - 1)
                flat = (ix * n + iy) * n + iz
                rho = rho.at[flat].add(mass * wx * wy * wz)
    return rho.reshape(n, n, n)


def _cic_gather(field, pos, origin, cell, n):
    """CIC interpolation of a [n,n,n,3] field to particle positions."""
    u = (pos - origin) / cell - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    flat_field = field.reshape(n * n * n, 3)
    out = jnp.zeros((pos.shape[0], 3), field.dtype)
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        ix = jnp.clip(i0[:, 0] + dx, 0, n - 1)
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            iy = jnp.clip(i0[:, 1] + dy, 0, n - 1)
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                iz = jnp.clip(i0[:, 2] + dz, 0, n - 1)
                flat = (ix * n + iy) * n + iz
                w = (wx * wy * wz)[:, None]
                out = out + w * flat_field[flat]
    return out


def _fd4_gradient(phi, cell):
    """4th-order central-difference force F = -grad phi, axis by axis.

    Wrap-around reads at the crop edges hit the padded half of the circulant
    potential, which holds *correct* open-space values (module docstring).
    """
    comps = []
    for ax in range(3):
        d = (-jnp.roll(phi, -2, ax) + 8.0 * jnp.roll(phi, -1, ax)
             - 8.0 * jnp.roll(phi, 1, ax) + jnp.roll(phi, 2, ax)) / (12.0 * cell)
        comps.append(-d)
    return comps


def pm_geometry(p: Particles, cfg: SimConfig, axis_name: str | None = None,
                decomp: bool = False):
    """(origin, cell, r_s): the PM mesh box over the live bounding cube and
    the Gaussian split scale.  Deterministic in the particle state, so a
    caller that needs r_s BEFORE the long-range solve (the fused
    short-range kernel, integrate._force_eval_sorted) computes the exact
    same value pm_long_range will."""
    n = cfg.grav_grid
    inf = jnp.asarray(jnp.inf, p.pos.dtype)
    alive3 = p.alive[:, None]
    lo = jnp.min(jnp.where(alive3, p.pos, inf), axis=0)
    hi = jnp.max(jnp.where(alive3, p.pos, -inf), axis=0)
    if decomp:
        # Slab decomposition: `p` is this device's slab only; the mesh box
        # must still bound the GLOBAL live set (identical on every device).
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    # Keep all particles in mesh cells [1, n-2]: the CIC halo then never
    # touches the FFT wrap plane at index 0 / n-1 of the padded box.
    extent = jnp.maximum(jnp.max(hi - lo), 1.0e-6)
    cell = extent / (n - 3)
    origin = lo - 1.5 * cell
    return origin, cell, cfg.grav_split_rs * cell


def pm_long_range_held(p: Particles, cfg: SimConfig, pm_phase, r_s_held,
                       rows=None, axis_name: str | None = None, kern_k=None):
    """The far-field half of gas_gravity_pm_held alone (no short-range
    pair pass) — for cfg.grav_fuse_short, where the short-range complement
    is evaluated inside the SPH force kernel.  Returns (acc_long, r_s)."""
    p_dep = p if rows is None else rows[0]
    dtype = p.pos.dtype
    # acc_ext exists whenever a held far field is carried: cfg.pm_every > 1
    # OR block timesteps (cfg.dt_bins > 1, where the mesh refreshes at most
    # once per BASE step and every substep reuses it — blockstep.py).
    if p_dep.acc_ext is not None:
        recompute = (pm_phase == 0) | (r_s_held <= 0.0)

        def fresh(_):
            acc_long, _, _, r_s = pm_long_range(p, cfg, rows=rows,
                                                axis_name=axis_name,
                                                kern_k=kern_k)
            return acc_long, jnp.asarray(r_s, dtype)

        def held(_):
            return p_dep.acc_ext, jnp.asarray(r_s_held, dtype)

        return jax.lax.cond(recompute, fresh, held, None)
    acc_long, _, _, r_s = pm_long_range(p, cfg, rows=rows,
                                        axis_name=axis_name, kern_k=kern_k)
    return acc_long, jnp.asarray(r_s, dtype)


def pm_long_range(p: Particles, cfg: SimConfig, rows=None,
                  axis_name: str | None = None, kern_k=None,
                  decomp: bool = False):
    """Gaussian-filtered long-range gravitational acceleration (CIC-PM).

    Returns (acc [N,3], origin, cell, r_s) — r_s is the split scale the
    short-range pass must complement.

    `kern_k` is the precomputed Green's-function table (`grav_tables(cfg)`),
    passed in as a runtime argument.  When omitted, the memoized table is
    fetched here — fine outside jit, but *inside* a trace that bakes it
    into the executable as a constant, which is only tolerated for small
    test meshes (grav_grid < 128); larger meshes raise.

    Sharded (rows=(p_rows, offset), axis_name set): `p` is the replicated
    full set (box sizing), each device deposits only its `p_rows` slice,
    the partial meshes are psum-merged into the global mass distribution,
    and the returned acc is CIC-gathered at the local rows only.
    """
    n = cfg.grav_grid
    npad = 2 * n  # isolated (vacuum) BCs: zero-pad the mass to 2x per axis
    origin, cell, r_s = pm_geometry(p, cfg, axis_name=axis_name,
                                    decomp=decomp)

    p_dep = p if rows is None else rows[0]
    m = jnp.where(p_dep.alive, p_dep.mass, 0.0)
    rho = _cic_deposit(p_dep.pos, m, origin, cell, n) / cell ** 3

    # Pencil-sharded solve (slab decomposition + matmul transform): the
    # deposit merge becomes a reduce_scatter, the transforms' heavy middle
    # runs ky-sharded with two all_to_alls, and per-device transform FLOPs
    # and spectrum residency scale 1/D (ops.mm_dft.poisson_pencil).
    if (decomp and axis_name is not None and cfg.grav_fft == "matmul"
            and isinstance(kern_k, dict)):
        from .mm_dft import fd4_gradient_pruned, poisson_pencil
        D = jax.lax.axis_size(axis_name)
        m_p = kern_k["ci_p"].shape[0]
        if cfg.grav_gradient != "fd":
            raise ValueError("grav_fft='matmul' implements the 'fd' "
                             "gradient only")
        if n % D == 0 and m_p % D == 0:
            phi_m = poisson_pencil(rho, kern_k, kern_k["kern_k"],
                                   cell * cell, axis_name, D)
            gx, gy, gz = fd4_gradient_pruned(phi_m, cell, n)
            force = jnp.stack([gx, gy, gz], axis=-1)
            acc = _cic_gather(force, p_dep.pos, origin, cell, n)
            acc = jnp.where(p_dep.alive[:, None], acc.astype(p.pos.dtype),
                            0.0)
            return acc, origin, cell, r_s
        # fall through: device count does not tile the mesh — replicated

    if axis_name is not None:
        rho = jax.lax.psum(rho, axis_name)

    # Isolated (vacuum) boundaries, Hockney-Eastwood style: see
    # green_kernel_k.  The table is scale-free in cell units (the box
    # rescales every step as the particles move; K_k never does), so the
    # one-time host FFT covers every step of the run.
    if kern_k is None:
        if n >= 128:
            raise ValueError(
                f"pm_long_range at grav_grid={n} needs the Green's table "
                f"passed as a runtime argument (grav_tables(cfg)); baking "
                f"it as a trace constant makes XLA compiles pathological")
        kern_k = green_kernel_k(npad, cfg.grav_split_rs,
                                jnp.dtype(p.pos.dtype).name)
        if cfg.grav_fft == "matmul":
            from .mm_dft import dft_tables
            tabs = dict(dft_tables(n, npad, jnp.dtype(p.pos.dtype).name))
            tabs["kern_k"] = kern_k
            kern_k = tabs

    if cfg.grav_fft == "matmul":
        # Pruned DFT as MXU matmuls (ops.mm_dft): never materialises the
        # zero-padded input or the uncropped inverse, and does not hit
        # XLA's pathological large-FFT lowering (1.9 s at 512^3).
        from .mm_dft import (fd4_gradient_pruned, irfft3_pruned,
                             rfft3_pruned)
        if cfg.grav_gradient != "fd":
            raise ValueError("grav_fft='matmul' implements the 'fd' "
                             "gradient only (set grav_gradient='fd' or "
                             "grav_fft='xla')")
        if not isinstance(kern_k, dict):
            raise ValueError(
                "grav_fft='matmul' needs the grav_tables(cfg) dict bundle "
                "(Green's table + DFT matrices); got a bare array — the "
                "tables were built for a different grav_fft setting")
        re, im = rfft3_pruned(rho, kern_k)
        # Dimensions restored at runtime: kern = K/cell, DFT->integral
        # volume factor cell^3 => phi_k = rho_k * K_k * cell^2.
        scale = kern_k["kern_k"] * (cell * cell)
        phi_m = irfft3_pruned(re * scale, im * scale, kern_k)
        gx, gy, gz = fd4_gradient_pruned(phi_m, cell, n)
        force = jnp.stack([gx, gy, gz], axis=-1)
    else:
        rho_pad = (jnp.zeros((npad, npad, npad), rho.dtype)
                   .at[:n, :n, :n].set(rho))
        rho_k = jnp.fft.rfftn(rho_pad)
        phi_k = rho_k * kern_k * (cell * cell)

        if cfg.grav_gradient == "fd":
            # One inverse FFT + cheap stencils; the Gaussian split
            # suppresses the mid-k band where the FD operator attenuates,
            # keeping the total force error in the same
            # few-tenths-of-a-percent class (tests/test_gravity.py measures
            # it against the direct oracle).
            phi = jnp.fft.irfftn(phi_k, s=(npad, npad, npad))
            gx, gy, gz = _fd4_gradient(phi, cell)
        else:
            # Exact spectral gradient F(k) = -i k phi(k).
            kx = (jnp.fft.fftfreq(npad).astype(p.pos.dtype)
                  * (2.0 * PI)) / cell
            kz = (jnp.fft.rfftfreq(npad).astype(p.pos.dtype)
                  * (2.0 * PI)) / cell

            def spectral_force(kvec_bcast):
                return jnp.fft.irfftn((-1j) * kvec_bcast * phi_k,
                                      s=(npad, npad, npad))
            gx = spectral_force(kx[:, None, None])
            gy = spectral_force(kx[None, :, None])
            gz = spectral_force(kz[None, None, :])

        force = jnp.stack([gx[:n, :n, :n], gy[:n, :n, :n], gz[:n, :n, :n]],
                          axis=-1)

    acc = _cic_gather(force, p_dep.pos, origin, cell, n)
    acc = jnp.where(p_dep.alive[:, None], acc.astype(p.pos.dtype), 0.0)
    return acc, origin, cell, r_s


def erf_approx(x, expmx2):
    """erf(x) for x >= 0 given e^(-x^2): Abramowitz-Stegun 7.1.26.

    Max abs error 1.5e-7 — far below the PM force-split's 0.1% class.
    Used by both the XLA and Pallas short-range paths (Mosaic has no erf
    primitive), keeping them pairwise identical.
    """
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return 1.0 - poly * expmx2


def _short_factor(r, h_i, r_s):
    """g_short(r) = f_spline(r/h) - S(r): what the mesh didn't deliver."""
    x = r / (2.0 * r_s)
    expmx2 = jnp.exp(-x * x)
    s = erf_approx(x, expmx2) - r / (r_s * jnp.sqrt(PI)) * expmx2
    return grav_softening(r, h_i) - s


def _overflow_pass(cfg: SimConfig, key_s, xs, ys, zs, ms, hs,
                   starts, ends, coverage, g0, Gl, B, r_s, r_cut):
    """Compacted-worklist fallback for short-range candidates beyond the
    static window coverage (SimConfig.grav_overflow_items).

    A static two-level window plan cannot bound a condensing core: one
    r_cut stencil cell can hold ~rho r_cut^3 >> 8 * W particles
    (scripts/c5_window_audit.py measured 54% of true pairs dropped at the
    1e6 collapse's 1.22 t_ff state).  This pass turns the residual ranges
    [coverage, ends) of this device's groups into a flat worklist of
    (group, offset, 512-lane slice) items — fixed capacity K so the jitted
    shape is static — and evaluates them in a scan of small XLA pair
    blocks.  Item slices start at `coverage` (128-aligned by
    construction), so they never double-count the window pass; the per-row
    key-range mask makes membership exact, as in the main kernels.

    Returns ((ax, ay, az) [Gl*B] to add to the window sums, residual
    candidate count beyond the item budget — the new meaning of the
    grav_window_overflow stats slot when the fallback is on).
    """
    K = int(cfg.grav_overflow_items)
    WF = 512  # lanes per item (4 x 128 blocks)
    dtype = xs.dtype
    cap = key_s.shape[0]
    R = cap // LANES
    offs9 = jnp.asarray(PLANE_OFFSETS, jnp.int32)

    sl = partial(jax.lax.dynamic_slice_in_dim, start_index=g0, slice_size=Gl)
    ends_l = sl(ends)
    cov_l = jnp.minimum(sl(coverage), ends_l)  # never start past the range
    cov_l = jnp.maximum(cov_l, sl(starts))
    res = jnp.maximum(ends_l - cov_l, 0)                     # [Gl, 9]
    need = -((-res) // WF)                                   # ceil div
    cum = jnp.cumsum(need.reshape(-1))                       # [Gl*9]
    total = cum[-1]

    item = jnp.arange(K, dtype=jnp.int32)
    owner = jnp.searchsorted(cum, item, side="right").astype(jnp.int32)
    owner_c = jnp.minimum(owner, Gl * 9 - 1)
    prev = jnp.where(owner_c > 0, cum[jnp.maximum(owner_c - 1, 0)], 0)
    k_in = item - prev
    valid_it = item < total
    g_it = owner_c // 9                                      # local group
    o_it = owner_c % 9
    start_it = cov_l.reshape(-1)[owner_c] + k_in * WF        # 128-aligned

    # Residual beyond the item budget (exact: items are allocated in
    # ascending (group, offset) order, each covering <= WF lanes).
    covered_by = jnp.sum(jnp.where(
        valid_it, jnp.clip(res.reshape(-1)[owner_c] - k_in * WF, 0, WF), 0))
    n_resid = (jnp.sum(res) - covered_by).astype(jnp.int32)

    # Per-item row data: group g's B rows of this device's slice.
    row_base = (g0 + g_it) * B
    x2, y2, z2 = (a.reshape(R, LANES) for a in (xs, ys, zs))
    m2 = ms.reshape(R, LANES)
    k2 = key_s.reshape(R, LANES)
    kg = key_s.reshape(cap // B, B)

    C = max(min(64, K), 1)  # items per scan block
    S = K // C
    assert S * C == K, "grav_overflow_items must be a multiple of 64"
    blk = jnp.arange(WF // LANES, dtype=jnp.int32)[None, :]  # [1, 4]
    lane = jnp.arange(LANES, dtype=jnp.int32)

    def body(carry, it):
        g_c, o_c, st_c, rb_c, v_c = it
        # rows [C, B]
        gi_r = rb_c[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
        xi = xs[gi_r][:, :, None]
        yi = ys[gi_r][:, :, None]
        zi = zs[gi_r][:, :, None]
        hi = hs[gi_r][:, :, None]
        ki = key_s[gi_r][:, :, None]
        # columns [C, WF] via 128-block row gather
        sb = st_c[:, None] // LANES + blk                    # [C, 4]
        rows_ok = (sb >= 0) & (sb < R)
        sbc = jnp.clip(sb, 0, R - 1)
        cx = x2[sbc].reshape(-1, WF)[:, None, :]
        cy = y2[sbc].reshape(-1, WF)[:, None, :]
        cz = z2[sbc].reshape(-1, WF)[:, None, :]
        cm = m2[sbc].reshape(-1, WF)[:, None, :]
        kj = k2[sbc].reshape(-1, WF)[:, None, :]
        gi_c = (sbc[:, :, None] * LANES + lane[None, None, :]).reshape(
            -1, WF)[:, None, :]
        lim = jnp.take(ends.reshape(-1),
                       (g0 + g_c) * 9 + o_c)[:, None, None]
        okc = (jnp.repeat(rows_ok, LANES, axis=1)[:, None, :]
               & (gi_c < lim) & v_c[:, None, None])
        off_k = offs9[o_c][:, None, None]
        mask = okc & (kj >= ki + off_k - 1) & (kj <= ki + off_k + 1)

        dxx = xi - cx
        dxy = yi - cy
        dxz = zi - cz
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        r = jnp.sqrt(r2)
        vv = mask & (r > 0.0) & (r < r_cut)
        gshort = _short_factor(r, hi, r_s)
        inv_r3 = jnp.where(vv, 1.0 / jnp.where(vv, r2 * r, 1.0), 0.0)
        coef = -G * jnp.where(vv, cm, 0.0) * gshort * inv_r3
        part = jnp.stack([jnp.sum(coef * dxx, -1), jnp.sum(coef * dxy, -1),
                          jnp.sum(coef * dxz, -1)], axis=-1)  # [C, B, 3]
        return carry.at[g_c].add(part), None

    acc_g = jnp.zeros((Gl, B, 3), dtype)
    its = (g_it.reshape(S, C), o_it.reshape(S, C), start_it.reshape(S, C),
           row_base.reshape(S, C), valid_it.reshape(S, C))
    acc_g = jax.lax.scan(body, acc_g, its)[0]
    del kg
    a = acc_g.reshape(Gl * B, 3)
    return (a[:, 0], a[:, 1], a[:, 2]), n_resid


def pm_short_range(p: Particles, cfg: SimConfig, r_s, rows=None,
                   axis_name: str | None = None, active_rows=None):
    """Direct complementary pair force within r_cut, via gravity-sized
    sorted windows.  `p` may be in any order; output matches its order.

    Runs on a slim 7-operand sort (key, x, y, z, m, h, source index) —
    the gravity pass needs no other fields, and multi-operand lax.sort cost
    scales with operand count.  Returns (acc, n_window_overflow); acc is
    [N,3] in p's order, or the (offset, n_rows) slice of that order when
    rows=(p_rows, offset) is given.

    Sharded: `p` is the replicated full set; the gravity sort is replicated
    and each device computes the pair sums for its 1/D contiguous slice of
    the *gravity-sorted* order (a different partition than the caller's SPH
    rows — work split, not data locality).  The per-device partial results
    are scattered back to p's order and psum-merged, then sliced to the
    caller's rows.

    `active_rows` ([N] bool in p's order; block timesteps, single-chip
    Pallas path only): the mask rides the gravity sort as an extra operand
    and gates the pair kernel to row blocks containing an active particle
    (pallas_grav_short_sums active=); inactive rows return acc == 0 (their
    blocks' sums are undefined and zeroed here through the mask).  The
    overflow fallback pass still covers ALL groups' residuals (it is a
    fixed small worklist); inactive rows' contributions are zeroed with
    the same mask.
    """
    r_cut = cfg.effective_rcut_rs() * r_s
    dtype = p.pos.dtype
    if active_rows is not None and (axis_name is not None
                                    or not cfg.use_pallas):
        raise ValueError("pm_short_range active_rows gating is implemented "
                         "for the single-chip Pallas path")

    cap = _pad_to(p.capacity, max(cfg.sorted_block, LANES))
    B = cfg.window_group
    Gn = cap // B
    R = cap // LANES

    def pad(a, fill=0.0):
        if a.shape[0] == cap:
            return a
        return jnp.concatenate(
            [a, jnp.full((cap - a.shape[0],), fill, a.dtype)])

    inf = jnp.asarray(jnp.inf, dtype)
    origin = jnp.min(jnp.where(p.alive[:, None], p.pos, inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    cell = jnp.maximum(jnp.asarray(r_cut, dtype), 1.0e-12)
    key = jnp.where(p.alive, _cell_key(p.pos, origin, cell), SENTINEL_KEY)

    operands = [pad(key.astype(jnp.int32), SENTINEL_KEY),
                pad(p.pos[:, 0], 0.0), pad(p.pos[:, 1], 0.0),
                pad(p.pos[:, 2], 0.0),
                pad(jnp.where(p.alive, p.mass, 0.0), 0.0),
                pad(p.h, 1.0),
                pad(jnp.arange(p.capacity, dtype=jnp.int32), -1)]
    if active_rows is not None:
        operands.append(pad(active_rows.astype(jnp.int32), 0))
    key_s, xs, ys, zs, ms, hs, src, *act_tail = jax.lax.sort(
        operands, num_keys=1, is_stable=False)
    act_s = act_tail[0] > 0 if active_rows is not None else None

    # Group stencil windows (same machinery as ops.sorted_grid).
    kmin = key_s.reshape(Gn, B)[:, 0]
    kmax = key_s.reshape(Gn, B)[:, -1]
    # == count of live keys (key_s is sorted with dead == SENTINEL at the
    # end); a reduction beats a scalar bisection while-loop on this backend
    first_dead = jnp.sum(key_s != SENTINEL_KEY).astype(jnp.int32)
    offs = jnp.asarray(PLANE_OFFSETS, jnp.int32)
    lo_w = kmin[:, None] + offs[None, :] - 1
    hi_w = kmax[:, None] + offs[None, :] + 1
    from .sorted_grid import window_ranks
    starts, ends = window_ranks(key_s, lo_w, hi_w)
    starts = starts.reshape(Gn, 9)
    ends = ends.reshape(Gn, 9)
    ends = jnp.minimum(ends, first_dead)
    ends = jnp.maximum(ends, starts)
    reach = (starts // LANES) * LANES + cfg.grav_window_blocks * LANES
    n_over = jnp.sum(jnp.maximum(ends - reach, 0)).astype(jnp.int32)

    x2, y2, z2 = (a.reshape(R, LANES) for a in (xs, ys, zs))
    m2 = ms.reshape(R, LANES)
    k2 = key_s.reshape(R, LANES)

    if rows is None:
        off_g, nloc = 0, cap

        def loc(a):
            return a
    else:
        # Work-split the gravity-sorted rows 1/D per device (D from the
        # static capacities; the slice indices are traced via axis_index).
        n_shards = p.capacity // rows[0].capacity
        nloc = cap // n_shards
        if nloc % B:
            raise ValueError(
                f"sharded PM gravity needs the padded capacity ({cap}) to "
                f"split into window groups per device (window_group={B}, "
                f"devices={n_shards})")
        off_g = jax.lax.axis_index(axis_name) * nloc

        def loc(a):
            return jax.lax.dynamic_slice_in_dim(a, off_g, nloc)

    if cfg.use_pallas:
        # Pallas two-level-window kernel (ops.pallas_pairs._grav_kernel):
        # exact extents instead of slab block rows — the XLA slab path
        # below burns 9 * grav_window_blocks * 128 lanes per row.
        from .pallas_pairs import (pallas_grav_short_sums, window_plan,
                                   window_plan_exact)
        from .sorted_grid import SortedGrid

        gcfg = cfg.with_(pallas_window=cfg.grav_pallas_window,
                         pallas_fetch_window=cfg.grav_pallas_fetch)
        gridlike = SortedGrid(
            key=key_s, starts=starts, ends=ends, origin=origin,
            cell_size=cell, n_window_overflow=jnp.zeros((), jnp.int32),
            n_clamped=jnp.zeros((), jnp.int32))
        if gcfg.pallas_exact_windows:
            prog, gvecs, covered = window_plan_exact(gridlike, gcfg)
        else:
            prog, suboff, nsl, covered = window_plan(gridlike, gcfg)
            gvecs = (suboff, nsl)
        n_over = jnp.sum(jnp.maximum(ends - covered, 0)).astype(jnp.int32)
        from .pallas_pairs import _key_to_float
        key_f = _key_to_float(key_s, xs.dtype)
        rs_col = jnp.full_like(xs, jnp.asarray(r_s, xs.dtype))
        rcut_col = jnp.full_like(xs, jnp.asarray(r_cut, xs.dtype))
        packed = jnp.stack([xs, ys, zs, ms, hs, key_f, rs_col, rcut_col])
        prog_f = prog.reshape(-1)
        if rows is None:
            packed_rows, prog_l, gvecs_l = packed, prog_f, gvecs
        else:
            if nloc % cfg.sorted_block:
                raise ValueError(
                    f"sharded Pallas PM gravity needs the per-device row "
                    f"count ({nloc}) to be a multiple of sorted_block "
                    f"({cfg.sorted_block})")
            packed_rows = jax.lax.dynamic_slice_in_dim(packed, off_g, nloc,
                                                       axis=1)
            prog_l = jax.lax.dynamic_slice_in_dim(
                prog_f, off_g // cfg.sorted_block * 9, nloc // cfg.sorted_block * 9)
            gvecs_l = tuple(
                jax.lax.dynamic_slice_in_dim(g, off_g // B, nloc // B)
                for g in gvecs)
        gate = None
        if act_s is not None:
            blk_act = act_s.reshape(cap // cfg.sorted_block,
                                    cfg.sorted_block).any(axis=1)
            work = jnp.argsort(~blk_act, stable=True).astype(jnp.int32)
            n_work = jnp.sum(blk_act).astype(jnp.int32).reshape(1)
            gate = (work, n_work)
        axf, ayf, azf = pallas_grav_short_sums(
            packed_rows, packed, prog_l, gvecs_l, cfg,
            interpret=cfg.pallas_interpret, active=gate)
        coverage = covered
    else:
        Gl = nloc // B
        xi = loc(xs).reshape(Gl, B, 1)
        yi = loc(ys).reshape(Gl, B, 1)
        zi = loc(zs).reshape(Gl, B, 1)
        hi = loc(hs).reshape(Gl, B, 1)
        ki = loc(key_s).reshape(Gl, B, 1)

        sb = (jax.lax.dynamic_slice_in_dim(starts, off_g // B, Gl)
              if rows is not None else starts) // LANES
        z = jnp.zeros((Gl, B), dtype)
        ax, ay, az = z, z, z
        lane = jnp.arange(LANES, dtype=jnp.int32)[None, :]
        for o in range(9):
            lo = ki + (PLANE_OFFSETS[o] - 1)
            hi_k = ki + (PLANE_OFFSETS[o] + 1)
            for blk in range(cfg.grav_window_blocks):
                brows = jnp.clip(sb[:, o] + blk, 0, R - 1)
                cx = x2[brows][:, None, :]
                cy = y2[brows][:, None, :]
                cz = z2[brows][:, None, :]
                cm = m2[brows][:, None, :]
                kj = k2[brows][:, None, :]
                gi = ((sb[:, o, None] + blk) * LANES + lane)[:, None, :]
                mask = (kj >= lo) & (kj <= hi_k) & (gi >= 0) & (gi < cap)

                dxx = xi - cx
                dxy = yi - cy
                dxz = zi - cz
                r2 = dxx * dxx + dxy * dxy + dxz * dxz
                r = jnp.sqrt(r2)
                valid = mask & (r > 0.0) & (r < r_cut)
                gshort = _short_factor(r, hi, r_s)
                inv_r3 = jnp.where(valid,
                                   1.0 / jnp.where(valid, r2 * r, 1.0), 0.0)
                coef = -G * jnp.where(valid, cm, 0.0) * gshort * inv_r3
                ax = ax + jnp.sum(coef * dxx, axis=-1)
                ay = ay + jnp.sum(coef * dxy, axis=-1)
                az = az + jnp.sum(coef * dxz, axis=-1)
        axf, ayf, azf = ax.reshape(nloc), ay.reshape(nloc), az.reshape(nloc)
        coverage = reach

    if cfg.grav_overflow_items > 0:
        if cfg.grav_overflow_items % 64:
            raise ValueError("grav_overflow_items must be a multiple of 64")
        (dax, day, daz), n_resid = _overflow_pass(
            cfg, key_s, xs, ys, zs, ms, hs, starts, ends, coverage,
            off_g // B, nloc // B, B, r_s, r_cut)
        axf = axf + dax
        ayf = ayf + day
        azf = azf + daz
        # With the fallback on, the overflow slot counts only what exceeds
        # the item budget too.  Residuals are per-device (each covers its
        # own groups), so merge them here — the stats path treats this
        # counter as replicated (integrate._coverage_stats).
        n_over = (jax.lax.psum(n_resid, axis_name)
                  if axis_name is not None else n_resid)

    if act_s is not None:
        # gated kernel: inactive blocks' sums are undefined — zero them so
        # the scatter hands back exactly 0 for inactive rows (the caller
        # merges its stale short-range force through the same mask)
        axf = jnp.where(act_s, axf, 0.0)
        ayf = jnp.where(act_s, ayf, 0.0)
        azf = jnp.where(act_s, azf, 0.0)

    # Un-permute to the caller's order: scatter each sorted row's force to
    # its source slot (dead pad rows carry src == -1, dropped).
    acc = jnp.zeros((p.capacity, 3), dtype)
    acc = acc.at[loc(src)].set(
        jnp.stack([axf, ayf, azf], axis=-1), mode="drop")
    if rows is None:
        return jnp.where(p.alive[:, None], acc, 0.0), n_over
    # Merge the per-device partial scatters, then hand back the caller's
    # own (SPH-order) row slice.
    acc = jax.lax.psum(acc, axis_name)
    p_rows, offset = rows
    acc = jax.lax.dynamic_slice_in_dim(acc, offset, p_rows.capacity, axis=0)
    return jnp.where(p_rows.alive[:, None], acc, 0.0), n_over


def gas_gravity_pm(p: Particles, cfg: SimConfig, rows=None,
                   axis_name: str | None = None, kern_k=None):
    """Full PM + short-range self-gravity.

    `p` is the full particle set (replicated under sharding); with
    rows=(p_rows, offset) the returned acc covers only that contiguous
    slice of p's order — the device's shard.  Sharded runs psum the CIC
    mesh (long range) and the scattered partial pair sums (short range),
    so every device sees the global mass distribution.  `kern_k` is the
    Green's table from `grav_tables(cfg)` (see pm_long_range).

    Returns (acc, n_window_overflow int32 — 0 means the short-range
    windows covered every candidate; nonzero means dropped pairs, surfaced
    through SimState.stats).
    """
    acc_long, _, _, r_s = pm_long_range(p, cfg, rows=rows,
                                        axis_name=axis_name, kern_k=kern_k)
    acc_short, n_over = pm_short_range(p, cfg, r_s, rows=rows,
                                       axis_name=axis_name)
    return acc_long + acc_short, n_over


def gas_gravity_pm_held(p: Particles, cfg: SimConfig, pm_phase, r_s_held,
                        rows=None, axis_name: str | None = None, kern_k=None):
    """PM self-gravity with the long-range force recomputed every
    cfg.pm_every-th step and HELD in between (RESPA-style far-field
    subcycling; see SimConfig.pm_every).

    The mesh FFT runs under a lax.cond: on recompute steps
    (pm_phase == 0, or no valid held force: r_s_held <= 0) the fresh
    long-range acceleration and its split scale replace the carried ones;
    on held steps only the short-range pair complement is evaluated — at
    the HELD r_s, because the complement must match the split the held
    far field was built with.  The per-particle held force lives in
    p.acc_ext (rides the SFC sort), the split scale in SimState.pm_r_s.

    Returns (acc, n_window_overflow, acc_long, r_s) — the caller stores
    acc_long/r_s back into the carried state.
    """
    p_dep = p if rows is None else rows[0]
    if p_dep.acc_ext is None:
        raise ValueError(
            "gas_gravity_pm_held needs particles.acc_ext (call "
            "integrate.init_carries / prime with cfg.pm_every > 1 first)")
    dtype = p.pos.dtype
    recompute = (pm_phase == 0) | (r_s_held <= 0.0)

    def fresh(_):
        acc_long, _, _, r_s = pm_long_range(p, cfg, rows=rows,
                                            axis_name=axis_name,
                                            kern_k=kern_k)
        return acc_long, jnp.asarray(r_s, dtype)

    def held(_):
        return p_dep.acc_ext, jnp.asarray(r_s_held, dtype)

    acc_long, r_s = jax.lax.cond(recompute, fresh, held, None)
    acc_short, n_over = pm_short_range(p, cfg, r_s, rows=rows,
                                       axis_name=axis_name)
    return acc_long + acc_short, n_over, acc_long, r_s


def gas_gravity_pm_decomp(p_own: Particles, key_own, cell_sph, cfg: SimConfig,
                          axis_name: str, kern_k=None):
    """PM + short-range self-gravity under the SFC slab decomposition.

    Long range: deposit the local slab, psum the mesh (global mass), CIC
    back at the local rows — exactly the replicated-mesh option of
    VERDICT r2 item 5, with the box extents reduced over the axis.

    Short range: the r_cut stencil reaches further than the SPH kernel,
    so a wider rim (`cfg.grav_halo_rows` rows each side, in the same SPH
    rank space — every spatial ball maps into a contiguous SPH-key and
    hence rank interval) is exchanged, and `pm_short_range` runs on the
    local [rim|own|rim] set exactly as it does single-chip (it re-sorts by
    r_cut-sized keys internally); the own segment of its output is this
    slab's exact short-range force, provided the rim covered the reach —
    rows whose r_cut key interval outran a truncated rim are counted in
    the returned rim_short (the caller folds it into decomp_pressure).

    Returns (acc [nloc, 3], n_window_overflow, rim_short).
    """
    from ..parallel.decomp import KX, KY, exchange_rim, rim_short_count

    acc_long, _, cell_pm, r_s = pm_long_range(p_own, cfg,
                                              axis_name=axis_name,
                                              kern_k=kern_k, decomp=True)

    nloc = p_own.capacity
    Hg = cfg.grav_halo_rows
    rim_l, rim_r = exchange_rim(key_own, p_own, axis_name, Hg,
                                fields=("pid", "pos", "mass", "h"),
                                hops=cfg.halo_hops)

    key_c = jnp.concatenate([rim_l["key"], key_own, rim_r["key"]])
    pos_c = jnp.concatenate([rim_l["pos"], p_own.pos, rim_r["pos"]], axis=0)
    mass_c = jnp.concatenate([rim_l["mass"], p_own.mass, rim_r["mass"]])
    h_c = jnp.concatenate([rim_l["h"], p_own.h, rim_r["h"]])
    alive_c = key_c != SENTINEL_KEY
    pg = Particles.zeros(key_c.shape[0], p_own.pos.dtype).replace(
        pos=pos_c, mass=mass_c, h=jnp.where(alive_c, h_c, 1.0),
        alive=alive_c)

    acc_all, n_over = pm_short_range(pg, cfg, r_s)
    acc_short = acc_all[Hg:Hg + nloc]

    # r_cut reach in SPH-key units: candidates within r_cut sit within
    # ceil(r_cut / sph_cell) + 1 SPH cells per axis, i.e. a contiguous key
    # (and rank) interval of that many planes/columns around the row.
    r_cut = cfg.effective_rcut_rs() * r_s
    c_cells = jnp.ceil(r_cut / jnp.maximum(cell_sph, 1.0e-12)
                       ).astype(jnp.int32) + 1
    reach = c_cells * (KX + KY + 1)
    rim_short = rim_short_count(key_own, rim_l, rim_r,
                                key_own - reach, key_own + reach)

    acc = acc_long + jnp.where(p_own.alive[:, None], acc_short, 0.0)
    return acc, n_over, rim_short


__all__ = ["gas_gravity_pm", "pm_long_range", "pm_short_range",
           "gas_gravity_pm_decomp", "grav_tables", "green_kernel_k"]

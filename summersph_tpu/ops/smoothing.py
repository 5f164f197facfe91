"""Variable smoothing length: vectorised Newton h-iteration.

Solves h_i = eta (m_i / rho_i(h_i))^(1/3) per particle by the same Newton
update as the reference ("SUMMER_SPH - Variable.f90":515-546):

    h <- h * (1 + (m (eta/h)^3 / rho - 1) / (3 Omega))

re-summing rho(h) and Omega(h) between iterations.  The reference loops a
data-dependent number of times per particle under OpenMP; on TPU we run a
fixed-count `lax.scan` with a per-particle convergence mask
(`cfg.h_iter_max` iterations) — deterministic shapes (SURVEY.md §7 "hard
parts"), and scan because dynamic-trip loops are pathologically slow on the
target backend.

Matching the reference's ordering (V:1150-1152), this runs *after* the
step's forces, at the same positions — so the *first* Newton update reuses
the rho/Omega the force evaluation just computed (the reference's first
in-iteration density summation is identical to the step's own,
V:533 vs V:1131), and each further iteration re-sums once.  The final
density is left at the previous h: the next step's evaluation recomputes
rho at the post-drift positions anyway, so a closing re-summation would be
pure waste; the new h takes effect next step exactly as in the reference.

h is clamped to [0.01, min(cfg.max_length, stencil reach)] — the lower/upper
bounds mirror V:531; the stencil bound (half the neighbour-structure cell
size, which the step's sort built with `cfg.sort_h_pad` headroom) guarantees
the shared grid still covers every neighbour even as h grows during the
iteration.

Returns (particles, n_unconverged): the count of live particles whose last
unclamped Newton step still exceeded `cfg.convergence_criteria` — surfaced
through SimState.stats so a too-small `h_iter_max` is visible at runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from .density import compute_density
from .neighbors import CellGrid, build_grid


def _newton(h, rho, omega, m, eta):
    """Safeguarded Newton update (deliberate deviation from V:529).

    The raw reference step h*(1 + (target/rho - 1)/(3 Omega)) diverges where
    Omega <= 0 — at a cloud rim the grad-h sum of a half-empty kernel makes
    Omega ~ 0 or negative, the step flips sign, and h crashes to the floor
    in one iteration.  Measured consequence (scripts/collapse_diag.py, N=8k
    collapse): rim particles' h fell 5.0 -> 0.01-0.2 within 8 steps, their
    code density m(eta/h)^3 spiked past the sink threshold, and 63 spurious
    sinks spawned AT THE RIM before t=0.002 — the round-2 config-5 death.
    Production SPH codes safeguard exactly this (e.g. Phantom's h-iteration
    falls back to fixed-point when Omega misbehaves):

    - Omega <= 0.01 (unphysical / catastrophic): drop the grad-h correction
      for this iteration (Omega := 1), which recovers the fixed-point update
      h <- h (target/rho)^(1/3) to first order — always the right direction.
    - Trust region: one iteration may at most halve or double h, so a bad
      density estimate cannot teleport h to the clamp rails.
    """
    target = m * (eta / h) ** 3
    om = jnp.where(omega > 0.01, omega, 1.0)
    h_new = h * (1.0 + (target / rho - 1.0) / (3.0 * om))
    return jnp.clip(h_new, 0.5 * h, 2.0 * h)


def update_smoothing(p: Particles, cfg: SimConfig,
                     cols: Particles | None = None, grid=None,
                     axis_name: str | None = None, key_rows=None,
                     active=None, act_mask=None):
    """Newton-iterate h on `p`.

    `grid` is the step's sorted-window structure (ops.sorted_grid) for the
    shared-sort fast path: `p` must already be in that grid's sorted order
    with rho/omega freshly computed (force_eval guarantees both).  Under
    sharding (`axis_name` set) `p` is this device's contiguous slice of
    that order and `cols` (the tiled all_gather of the shards) is the full
    sorted set the re-summations read their neighbours from; with
    `key_rows` (slab decomposition, parallel.decomp) `cols` is the local
    rim-extended column set and the grid's windows are the row groups'.
    Without a grid, `cols` is the neighbour pool and a hashed grid is
    built here.

    Returns (particles, n_unconverged int32).
    """
    if grid is not None and cfg.neighbor_mode == "sorted":
        if cols is None:
            return _update_smoothing_shared(p, cfg, grid, active=active,
                                            act_mask=act_mask)
        second = (key_rows if key_rows is not None
                  else jax.lax.axis_index(axis_name) * p.capacity)
        return _update_smoothing_shared(p, cfg, grid, cols=cols,
                                        offset=second)
    if cfg.neighbor_mode == "sorted" and cols is None:
        return _update_smoothing_sorted(p, cfg)
    cols = cols if cols is not None else p
    # Build a grid with headroom so h can grow during the iteration and the
    # 27-cell stencil still covers the enlarged support.
    headroom = 1.25
    hgrid: CellGrid = build_grid(cols.replace(h=cols.h * headroom), cfg)
    h_cap = jnp.minimum(cfg.max_length, hgrid.cell_size / 2.0)

    def dens(q):
        return compute_density(q, cfg.with_(fixed_h=None), hgrid, cols=cols)

    # The caller (force_eval via step) computed rho/omega at these positions
    # already only on the single-chip sorted path; here the first iteration
    # must re-sum (multi-chip cols or standalone use).
    return _newton_scan(p, cfg, dens, h_cap, resum_first=True)


def _newton_scan(p: Particles, cfg: SimConfig, dens, h_cap,
                 resum_first: bool, act_mask=None):
    """Shared fixed-count masked-convergence Newton scan.

    Every iteration: (re-sum rho/Omega unless first && !resum_first), Newton
    update, clamp, convergence mask.  Convergence is judged on the
    *unclamped* step so a particle pinned at the cap keeps tracking the cap.
    `act_mask` restricts the iteration to the block-timestep substep's
    active rows (blockstep.py) — inactive rows' h (and everything derived)
    is untouched.
    """
    def body(carry, resum):
        q, active, _ = carry
        q = jax.lax.cond(resum, dens, lambda x: x, q)
        h_raw = _newton(q.h, q.rho, q.omega, q.mass, cfg.eta)
        h_new = jnp.clip(h_raw, 0.01, h_cap)
        rel = jnp.abs(h_raw - q.h) / q.h
        h_next = jnp.where(active & q.alive, h_new, q.h)
        still = active & q.alive & (rel > cfg.convergence_criteria)
        return (q.replace(h=h_next), still,
                jnp.sum(still, dtype=jnp.int32)), None

    resums = jnp.arange(cfg.h_iter_max) >= (1 if not resum_first else 0)
    start = p.alive if act_mask is None else (p.alive & act_mask)
    (p_out, _, n_open), _ = jax.lax.scan(
        body, (p, start, jnp.zeros((), jnp.int32)), resums)
    return p_out, n_open.astype(jnp.int32)


def _update_smoothing_shared(p: Particles, cfg: SimConfig, grid,
                             cols: Particles | None = None, offset=None,
                             active=None, act_mask=None):
    """Fast path: reuse the step's sorted grid AND its rho/omega.

    No sort, and the first Newton update consumes the force evaluation's
    density — `cfg.h_iter_max` iterations cost `h_iter_max - 1` density
    re-summations.  With `cols`/`offset`, rows are the (p, offset) slice of
    the full sorted set `cols` (sharded runs); the iteration only changes
    the rows' h, and rho_i depends on h_i alone (gather formulation), so
    the replicated columns stay valid throughout.

    Block-timestep gating (`active`=(worklist, count) + `act_mask`,
    blockstep.py; single-chip only): the re-summations skip inactive row
    blocks and the Newton updates freeze inactive rows' h.  The returned
    rho/omega are only meaningful on active rows — blockstep takes just h
    and restores its own (stale-consistent) density fields.
    """
    from .sorted_grid import sorted_density
    vcfg = cfg.with_(fixed_h=None)

    if cfg.use_pallas:
        from .pallas_pairs import pallas_density

        def dens(q):
            if cols is None:
                return pallas_density(q, vcfg, grid,
                                      interpret=cfg.pallas_interpret,
                                      active=active, act_mask=act_mask)
            return pallas_density(cols, vcfg, grid,
                                  interpret=cfg.pallas_interpret,
                                  rows=(q, offset))
    else:
        def dens(q):
            if cols is None:
                return sorted_density(q, vcfg, grid)
            return sorted_density(cols, vcfg, grid, rows=(q, offset))

    h_cap = jnp.minimum(cfg.max_length, grid.cell_size / 2.0)
    return _newton_scan(p, cfg, dens, h_cap, resum_first=False,
                        act_mask=act_mask)


def _update_smoothing_sorted(p: Particles, cfg: SimConfig):
    """Standalone sorted-engine h iteration (no shared grid): one sort with
    `cfg.sort_h_pad` headroom, then the same scan with a first re-summation.
    Used by cold starts (ICs with guessed h) and tests; the in-step path is
    _update_smoothing_shared."""
    from .sorted_grid import sort_particles, sorted_density

    cap0 = p.capacity
    vcfg = cfg.with_(fixed_h=None)
    p2, grid = sort_particles(p, cfg, h_pad=max(cfg.sort_h_pad, 1.25))
    h_cap = jnp.minimum(cfg.max_length, grid.cell_size / 2.0)

    if cfg.use_pallas:
        from .pallas_pairs import pallas_density

        def dens(q):
            return pallas_density(q, vcfg, grid,
                                  interpret=cfg.pallas_interpret)
    else:
        def dens(q):
            return sorted_density(q, vcfg, grid)

    p_out, n_open = _newton_scan(p2, cfg, dens, h_cap, resum_first=True)
    p_out = dens(p_out)  # standalone contract: rho/Omega consistent with h
    if p_out.capacity != cap0:
        p_out = jax.tree_util.tree_map(lambda a: a[:cap0], p_out)
    return p_out, n_open


__all__ = ["update_smoothing"]

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

h is clamped to [0.01, min(cfg.max_length, stencil reach)] — the lower/upper
bounds mirror V:531; the stencil bound (half the neighbour-grid cell size)
guarantees the fixed cell grid built at entry still covers every neighbour
even as h grows during the iteration.  Matching the reference's ordering
(V:1150-1152), this runs *after* the step's forces: the new h takes effect
next step, and the final density/Omega from the last re-summation are kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from .density import compute_density
from .neighbors import CellGrid, build_grid


def update_smoothing(p: Particles, cfg: SimConfig,
                     cols: Particles | None = None) -> Particles:
    """Newton-iterate h on `p`; `cols` is the neighbour pool (multi-chip:
    rows = local shard, cols = all-gathered global set)."""
    if cfg.neighbor_mode == "sorted" and cols is None:
        return _update_smoothing_sorted(p, cfg)
    cols = cols if cols is not None else p
    # Build a grid with headroom so h can grow during the iteration and the
    # 27-cell stencil still covers the enlarged support.
    headroom = 1.25
    grid: CellGrid = build_grid(cols.replace(h=cols.h * headroom), cfg)
    h_cap = jnp.minimum(cfg.max_length, grid.cell_size / 2.0)

    def newton(h, rho, omega, m):
        target = m * (cfg.eta / h) ** 3
        return h * (1.0 + (target / rho - 1.0) / (3.0 * omega))

    # Fixed-count scan with a per-particle convergence mask: the target
    # backend runs dynamic-trip loops ~100x slower than their bodies, so a
    # small fixed iteration count (Newton converges quadratically from the
    # previous step's h) beats while_loop early exit.
    def body(carry, _):
        q, active = carry
        q = compute_density(q, cfg.with_(fixed_h=None), grid, cols=cols)
        h_raw = newton(q.h, q.rho, q.omega, q.mass)
        h_new = jnp.clip(h_raw, 0.01, h_cap)
        # Convergence judged on the *unclamped* step: a particle pinned at
        # the cap must stay active so it keeps tracking the cap as it moves.
        rel = jnp.abs(h_raw - q.h) / q.h
        h_next = jnp.where(active & q.alive, h_new, q.h)
        still = active & q.alive & (rel > cfg.convergence_criteria)
        return (q.replace(h=h_next), still), None

    (p_out, _), _ = jax.lax.scan(body, (p, p.alive), None,
                                 length=cfg.h_iter_max)

    # Final consistency: density/Omega at the accepted h.
    p_out = compute_density(p_out, cfg.with_(fixed_h=None), grid, cols=cols)
    return p_out


def _update_smoothing_sorted(p: Particles, cfg: SimConfig) -> Particles:
    """Sorted-engine h iteration (the TPU production path).

    One sort with h_pad headroom; h is clamped to cell_size/2 so the fixed
    windows cover the growing support throughout the scan.  The order of `p`
    is permuted by the sort (identity in pid), matching force_eval's
    behaviour in sorted mode.
    """
    from .sorted_grid import sort_particles, sorted_density
    try:
        from .pallas_pairs import pallas_density
    except Exception:  # pragma: no cover
        pallas_density = None

    cap0 = p.capacity
    vcfg = cfg.with_(fixed_h=None)
    p2, grid = sort_particles(p, cfg, h_pad=1.25)
    h_cap = jnp.minimum(cfg.max_length, grid.cell_size / 2.0)

    def dens(q):
        if cfg.use_pallas and pallas_density is not None:
            return pallas_density(q, vcfg, grid)
        return sorted_density(q, vcfg, grid)

    def newton(h, rho, omega, m):
        target = m * (cfg.eta / h) ** 3
        return h * (1.0 + (target / rho - 1.0) / (3.0 * omega))

    def body(carry, _):
        q, active = carry
        q = dens(q)
        h_raw = newton(q.h, q.rho, q.omega, q.mass)
        h_new = jnp.clip(h_raw, 0.01, h_cap)
        rel = jnp.abs(h_raw - q.h) / q.h
        h_next = jnp.where(active & q.alive, h_new, q.h)
        still = active & q.alive & (rel > cfg.convergence_criteria)
        return (q.replace(h=h_next), still), None

    (p_out, _), _ = jax.lax.scan(body, (p2, p2.alive), None,
                                 length=cfg.h_iter_max)
    p_out = dens(p_out)
    if p_out.capacity != cap0:
        p_out = jax.tree_util.tree_map(lambda a: a[:cap0], p_out)
    return p_out


__all__ = ["update_smoothing"]

"""SPH pressure + artificial-viscosity force drivers.

Gather-formulated equivalents of the reference's `get_SPH` / `SPH_tree_search`
half-pair loops (SUMMER_SPH.f90:295-395, grad-h version
"SUMMER_SPH - Variable.f90":324-432).  Outputs: hydro acceleration, du/dt,
and the Morris-Monaghan alpha rate.  Same dense/grid duality as
`ops.density`; all pair math lives in `ops.pairs`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from ..utils.jax_utils import pick_block, row_blocks, unblock
from . import pairs
from .neighbors import STENCIL, CellGrid, candidate_cell_check, stencil_candidates


def _pair_block(idx, j, valid, p: Particles, cfg: SimConfig):
    """Force sums for row particles idx [B] against candidates j [B, C]."""
    col = lambda a: a[j]                       # [B, C]
    row = lambda a: a[idx][:, None]            # [B, 1]
    dx = p.pos[idx][:, None, :] - p.pos[j]     # [B, C, 3]
    vij = p.vel[idx][:, None, :] - p.vel[j]
    return pairs.force_sums(
        dx, vij,
        row(p.h), col(p.h),
        row(p.pressure), col(p.pressure),
        row(p.rho), col(p.rho),
        row(p.omega), col(p.omega),
        row(p.cs), col(p.cs),
        row(p.alpha), col(p.alpha),
        col(p.mass), valid, cfg,
    )


def _dense_block(idx, p: Particles, cfg: SimConfig):
    n = p.capacity
    j = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                         (idx.shape[0], n))
    valid = p.alive[None, :] & jnp.ones_like(j, bool)
    return _pair_block(idx, j, valid, p, cfg)


def _grid_block(idx, p: Particles, grid: CellGrid, cfg: SimConfig):
    ci = grid.coords[idx]
    acc = jnp.zeros(idx.shape + (3,), p.pos.dtype)
    du = jnp.zeros(idx.shape, p.pos.dtype)
    araw = jnp.zeros(idx.shape, p.pos.dtype)
    for off in STENCIL:
        j, valid, expected = stencil_candidates(grid, ci, off)
        valid = candidate_cell_check(grid, j, valid, expected)
        a, d, r = _pair_block(idx, j, valid, p, cfg)
        acc, du, araw = acc + a, du + d, araw + r
    return acc, du, araw


def compute_sph_forces(
    p: Particles, cfg: SimConfig, grid: CellGrid | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return (acc_hydro [N,3], du [N], dalpha [N]) for all particles.

    dalpha includes the decay/source cleanup applied after the pair loop in
    the reference (SUMMER_SPH.f90:315-318).
    """
    cap = p.capacity
    if grid is None:
        cols = cap
        fn = partial(_dense_block, p=p, cfg=cfg)
    else:
        cols = grid.cell_cap * 4
        fn = partial(_grid_block, p=p, grid=grid, cfg=cfg)

    block = pick_block(cap, cols)
    blocks = row_blocks(cap, block)
    acc_b, du_b, araw_b = jax.lax.map(fn, blocks)
    acc = unblock(acc_b, cap)
    du = unblock(du_b, cap)
    araw = unblock(araw_b, cap)

    dalpha = pairs.alpha_rate(araw, p.rho, p.alpha, p.cs, p.h, cfg)
    alive = p.alive
    return (
        jnp.where(alive[:, None], acc, 0.0),
        jnp.where(alive, du, 0.0),
        jnp.where(alive, dalpha, 0.0),
    )


__all__ = ["compute_sph_forces"]

"""SPH pressure + artificial-viscosity force drivers.

Gather-formulated equivalents of the reference's `get_SPH` / `SPH_tree_search`
half-pair loops (SUMMER_SPH.f90:295-395, grad-h version
"SUMMER_SPH - Variable.f90":324-432).  Outputs: hydro acceleration, du/dt,
and the Morris-Monaghan alpha rate.  Same dense/grid duality, row/column
split and component-wise layout as `ops.density`; all pair math lives in
`ops.pairs`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from ..utils.jax_utils import pick_block, row_blocks, unblock
from . import pairs
from .neighbors import STENCIL, CellGrid, cell_coords_of, stencil_candidates


class ColFields(NamedTuple):
    """Column-side pair fields as separate [N] arrays (gather-friendly)."""
    x: jax.Array
    y: jax.Array
    z: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    h: jax.Array
    p: jax.Array
    rho: jax.Array
    om: jax.Array
    cs: jax.Array
    al: jax.Array
    m: jax.Array
    alive: jax.Array

    @classmethod
    def of(cls, c: Particles) -> "ColFields":
        return cls(
            x=c.pos[:, 0], y=c.pos[:, 1], z=c.pos[:, 2],
            vx=c.vel[:, 0], vy=c.vel[:, 1], vz=c.vel[:, 2],
            h=c.h, p=c.pressure, rho=c.rho, om=c.omega, cs=c.cs,
            al=c.alpha, m=jnp.where(c.alive, c.mass, 0.0), alive=c.alive,
        )


def _pair_block(idx, j, valid, rows: Particles, cf: ColFields,
                cfg: SimConfig):
    """Force sums for row particles idx [B] against candidates j [B, C]."""
    row = lambda a: a[idx][:, None]            # [B, 1]
    xi, yi, zi = (rows.pos[idx][:, k:k + 1] for k in range(3))
    vxi, vyi, vzi = (rows.vel[idx][:, k:k + 1] for k in range(3))
    return pairs.force_sums(
        xi - cf.x[j], yi - cf.y[j], zi - cf.z[j],
        vxi - cf.vx[j], vyi - cf.vy[j], vzi - cf.vz[j],
        row(rows.h), cf.h[j],
        row(rows.pressure), cf.p[j],
        row(rows.rho), cf.rho[j],
        row(rows.omega), cf.om[j],
        row(rows.cs), cf.cs[j],
        row(rows.alpha), cf.al[j],
        cf.m[j], valid, cfg,
    )


def _dense_block(idx, rows: Particles, cf: ColFields, cfg: SimConfig):
    n = cf.x.shape[0]
    j = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                         (idx.shape[0], n))
    valid = cf.alive[None, :] & jnp.ones_like(j, bool)
    return _pair_block(idx, j, valid, rows, cf, cfg)


def _grid_block(idx, rows: Particles, cf: ColFields, grid: CellGrid,
                cfg: SimConfig):
    ci = cell_coords_of(grid, rows.pos[idx])
    z = jnp.zeros(idx.shape, rows.pos.dtype)
    ax, ay, az, du, araw = z, z, z, z, z
    for off in STENCIL:
        j, valid = stencil_candidates(grid, ci, off)
        dax, day, daz, ddu, dar = _pair_block(idx, j, valid, rows, cf, cfg)
        ax, ay, az = ax + dax, ay + day, az + daz
        du, araw = du + ddu, araw + dar
    return ax, ay, az, du, araw


def compute_sph_forces(
    rows: Particles, cfg: SimConfig, grid: CellGrid | None = None,
    cols: Particles | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return (acc_hydro [N,3], du [N], dalpha [N]) for the row particles.

    dalpha includes the decay/source cleanup applied after the pair loop in
    the reference (SUMMER_SPH.f90:315-318).
    """
    cols = cols if cols is not None else rows
    cf = ColFields.of(cols)
    cap = rows.capacity
    if grid is None:
        work = cols.capacity
        fn = partial(_dense_block, rows=rows, cf=cf, cfg=cfg)
    else:
        work = grid.cell_cap * 4
        fn = partial(_grid_block, rows=rows, cf=cf, grid=grid, cfg=cfg)

    block = pick_block(cap, work)
    blocks = row_blocks(cap, block)
    ax_b, ay_b, az_b, du_b, araw_b = jax.lax.map(fn, blocks)
    acc = jnp.stack([unblock(ax_b, cap), unblock(ay_b, cap),
                     unblock(az_b, cap)], axis=-1)
    du = unblock(du_b, cap)
    araw = unblock(araw_b, cap)

    dalpha = pairs.alpha_rate(araw, rows.rho, rows.alpha, rows.cs, rows.h, cfg)
    alive = rows.alive
    return (
        jnp.where(alive[:, None], acc, 0.0),
        jnp.where(alive, du, 0.0),
        jnp.where(alive, dalpha, 0.0),
    )


__all__ = ["compute_sph_forces", "ColFields"]

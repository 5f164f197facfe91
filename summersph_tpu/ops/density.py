"""Density (+ grad-h Omega) summation drivers.

rho_i = sum_j m_j W(r_ij, h_i), including the self term W(0) — matching the
reference where each particle's own tree leaf contributes
(SUMMER_SPH.f90:398-457; Omega accumulation "SUMMER_SPH - Variable.f90":440-496).

Two execution paths share the pair math in `ops.pairs`:

* `dense`  — chunked all-pairs (O(N^2)); exact, used for small N and as the
  brute-force oracle in neighbour-search parity tests;
* `grid`   — hashed cell grid (ops.neighbors): each row block gathers the 27
  stencil cells' candidates and accumulates masked partial sums, one stencil
  offset at a time (so nothing of size [B, 27*cell_cap] is materialised).

Row/column split: `rows` are the particles receiving sums, `cols` the
candidate neighbour pool (defaults to rows).  The multi-chip data-parallel
step passes rows = this device's shard, cols = the all-gathered global set
(parallel.sharded); single-chip callers never notice.

Layout: column fields are pre-split into per-component [N] arrays so every
pairwise tensor is [rows, candidates] with a lane-aligned minor dim (see
ops.pairs docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from ..utils.jax_utils import pick_block, row_blocks, unblock
from . import pairs
from .neighbors import STENCIL, CellGrid, cell_coords_of, stencil_candidates


def _dense_block(idx, rows: Particles, cx, cy, cz, cm, calive):
    """Density sums for row particles `idx` [B] against all columns."""
    xi = rows.pos[idx]                    # [B, 3]
    hi = rows.h[idx][:, None]             # [B, 1]
    dxx = xi[:, 0:1] - cx[None, :]
    dxy = xi[:, 1:2] - cy[None, :]
    dxz = xi[:, 2:3] - cz[None, :]
    return pairs.density_sums(dxx, dxy, dxz, hi, cm[None, :], calive[None, :])


def _grid_block(idx, rows: Particles, cx, cy, cz, cm, grid: CellGrid):
    """Density sums for rows `idx` [B] over the 27-cell stencil."""
    xi = rows.pos[idx]
    hi = rows.h[idx][:, None]
    ci = cell_coords_of(grid, xi)
    rho = jnp.zeros(idx.shape, rows.pos.dtype)
    omega_raw = jnp.zeros(idx.shape, rows.pos.dtype)
    for off in STENCIL:
        j, valid = stencil_candidates(grid, ci, off)
        dxx = xi[:, 0:1] - cx[j]
        dxy = xi[:, 1:2] - cy[j]
        dxz = xi[:, 2:3] - cz[j]
        r, o = pairs.density_sums(dxx, dxy, dxz, hi, cm[j], valid)
        rho = rho + r
        omega_raw = omega_raw + o
    return rho, omega_raw


def compute_density(rows: Particles, cfg: SimConfig,
                    grid: CellGrid | None = None,
                    cols: Particles | None = None) -> Particles:
    """Fill rho and Omega on `rows`; dead lanes become inert (rho=1, Omega=1).

    `grid`, when given, must have been built over `cols` (or `rows` if cols
    is None).
    """
    cols = cols if cols is not None else rows
    cap = rows.capacity
    cx, cy, cz = cols.pos[:, 0], cols.pos[:, 1], cols.pos[:, 2]
    cm = jnp.where(cols.alive, cols.mass, 0.0)
    if grid is None:
        work = cols.capacity
        fn = partial(_dense_block, rows=rows, cx=cx, cy=cy, cz=cz, cm=cm,
                     calive=cols.alive)
    else:
        work = grid.cell_cap * 4  # effective working set per offset
        fn = partial(_grid_block, rows=rows, cx=cx, cy=cy, cz=cz, cm=cm,
                     grid=grid)

    block = pick_block(cap, work)
    blocks = row_blocks(cap, block)
    rho_b, omega_b = jax.lax.map(fn, blocks)
    rho = unblock(rho_b, cap)
    omega_raw = unblock(omega_b, cap)

    rho, omega = pairs.finalize_density(rho, omega_raw, rows.h, rows.alive,
                                        rows.mass)
    if cfg.fixed_h is not None:
        omega = jnp.ones_like(omega)
    return rows.replace(rho=rho, omega=omega)


__all__ = ["compute_density"]

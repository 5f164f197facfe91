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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles
from ..utils.jax_utils import pick_block, row_blocks, unblock
from . import pairs
from .neighbors import STENCIL, CellGrid, candidate_cell_check, stencil_candidates


def _dense_block(idx, p: Particles):
    """Density sums for rows `idx` [B] against all columns."""
    xi = p.pos[idx]                       # [B, 3]
    hi = p.h[idx][:, None]                # [B, 1]
    dx = xi[:, None, :] - p.pos[None, :, :]   # [B, N, 3]
    mask = p.alive[None, :]
    return pairs.density_sums(dx, hi, p.mass[None, :], mask)


def _grid_block(idx, p: Particles, grid: CellGrid):
    """Density sums for rows `idx` [B] over the 27-cell stencil."""
    xi = p.pos[idx]
    hi = p.h[idx][:, None]
    ci = grid.coords[idx]
    rho = jnp.zeros(idx.shape, p.pos.dtype)
    omega_raw = jnp.zeros(idx.shape, p.pos.dtype)
    for off in STENCIL:
        j, valid, expected = stencil_candidates(grid, ci, off)
        valid = candidate_cell_check(grid, j, valid, expected)
        dx = xi[:, None, :] - p.pos[j]        # [B, cap, 3]
        r, o = pairs.density_sums(dx, hi, p.mass[j], valid)
        rho = rho + r
        omega_raw = omega_raw + o
    return rho, omega_raw


def compute_density(p: Particles, cfg: SimConfig,
                    grid: CellGrid | None = None) -> Particles:
    """Fill rho and Omega; dead lanes become inert (rho=1, Omega=1)."""
    cap = p.capacity
    if grid is None:
        cols = cap
        fn = partial(_dense_block, p=p)
    else:
        cols = grid.cell_cap * 4  # effective working set per offset
        fn = partial(_grid_block, p=p, grid=grid)

    block = pick_block(cap, cols)
    blocks = row_blocks(cap, block)
    rho_b, omega_b = jax.lax.map(fn, blocks)
    rho = unblock(rho_b, cap)
    omega_raw = unblock(omega_b, cap)

    rho, omega = pairs.finalize_density(rho, omega_raw, p.h, p.alive)
    if cfg.fixed_h is not None:
        omega = jnp.ones_like(omega)
    return p.replace(rho=rho, omega=omega)


__all__ = ["compute_density"]

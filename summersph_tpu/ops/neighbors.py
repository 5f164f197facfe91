"""Hashed cell-grid neighbour search (TPU-native octree replacement).

The reference prunes neighbour searches with a recursive octree AABB-overlap
walk (SUMMER_SPH.f90:149-246 build, :323-457 walks) — pointer-chasing that
maps terribly onto XLA.  The engine instead uses the standard space-filling
/ spatial-hash cell grid (PAPERS.md: Gadget3 SFC neighbour search, GPU cell
lists): bin particles into cubic cells of side = the largest kernel support
(2 h_max), so every interacting pair lies within the 3x3x3 cell stencil of
either endpoint.  All shapes are static:

* cells are *hashed* into a fixed power-of-two table (Teschner-style spatial
  hash), so the grid needs no bounded domain and no data-dependent cell
  count;
* each bucket holds at most `cell_cap` particle slots; the build counts
  overflow (dropped slots) so callers can detect an undersized table —
  correctness degrades loudly, not silently;
* hash collisions merely add far-away candidates, which the pair kernels'
  cutoff + exact-cell check discard: every candidate is verified to lie in
  the exact integer cell being queried, so a collision can never double-count
  or miss a pair.

Dead particles are excluded at build time (their park position never enters
the table), so stencils contain live candidates only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..state import Particles

# Teschner et al. spatial-hash primes.
_HX = jnp.int32(73856093)
_HY = jnp.int32(19349663)
_HZ = jnp.int32(83492791)

# 3x3x3 stencil offsets, a Python-level constant (unrolled in traced code).
STENCIL = [(ox, oy, oz)
           for ox in (-1, 0, 1) for oy in (-1, 0, 1) for oz in (-1, 0, 1)]


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@struct.dataclass
class CellGrid:
    table: jax.Array       # [num_buckets, cell_cap] int32 particle ids; == cap => empty
    coords: jax.Array      # [N, 3] int32 cell coords per particle
    origin: jax.Array      # [3] grid origin
    cell_size: jax.Array   # scalar
    n_dropped: jax.Array   # scalar int32: live particles that overflowed their bucket

    @property
    def num_buckets(self) -> int:
        return self.table.shape[0]

    @property
    def cell_cap(self) -> int:
        return self.table.shape[1]


def _hash_coords(cx, cy, cz, num_buckets: int):
    h = (cx * _HX) ^ (cy * _HY) ^ (cz * _HZ)
    return h & jnp.int32(num_buckets - 1)


def _cell_coords(pos, origin, cell_size):
    # Clamp to a generous integer range so parked/outlier positions can't
    # overflow int32; they land in a far corner cell nobody queries.
    c = jnp.floor((pos - origin) / cell_size)
    return jnp.clip(c, -1.0e6, 1.0e6).astype(jnp.int32)


def build_grid(p: Particles, cfg: SimConfig, num_buckets: int | None = None) -> CellGrid:
    """Bin live particles into the hashed cell table.

    Cell side = support radius 2 * max(h) over live particles, so the 27-cell
    stencil covers every pair with r <= 2 * max(h_i, h_j) — the variable-h
    analogue of the reference's per-node `max_len` prune
    ("SUMMER_SPH - Variable.f90":368,380).
    """
    cap = p.capacity
    nb = num_buckets or next_pow2(max(cap // 4, 64))

    inf = jnp.asarray(jnp.inf, p.pos.dtype)
    alive3 = p.alive[:, None]
    origin = jnp.min(jnp.where(alive3, p.pos, inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    h_max = jnp.max(jnp.where(p.alive, p.h, 0.0))
    cell_size = jnp.maximum(2.0 * h_max, 1.0e-12)

    coords = _cell_coords(p.pos, origin, cell_size)
    bucket = _hash_coords(coords[:, 0], coords[:, 1], coords[:, 2], nb)

    # Rank of each particle within its bucket: sort by bucket, then
    # rank = position_in_sorted - first_position_of_bucket.
    order = jnp.argsort(bucket)
    bucket_sorted = bucket[order]
    first = jnp.searchsorted(bucket_sorted, bucket_sorted, side="left")
    rank_sorted = jnp.arange(cap, dtype=jnp.int32) - first.astype(jnp.int32)
    alive_sorted = p.alive[order]

    cell_cap = cfg.cell_cap
    keep = alive_sorted & (rank_sorted < cell_cap)
    # Scatter into the flat table; out-of-range targets are dropped.
    flat_idx = jnp.where(
        keep,
        bucket_sorted * cell_cap + jnp.minimum(rank_sorted, cell_cap - 1),
        nb * cell_cap,  # out of bounds => dropped
    )
    table = jnp.full((nb * cell_cap,), cap, dtype=jnp.int32)
    table = table.at[flat_idx].set(order.astype(jnp.int32), mode="drop")
    n_dropped = jnp.sum(alive_sorted & (rank_sorted >= cell_cap)).astype(jnp.int32)

    return CellGrid(
        table=table.reshape(nb, cell_cap),
        coords=coords,
        origin=origin,
        cell_size=cell_size,
        n_dropped=n_dropped,
    )


def stencil_candidates(
    grid: CellGrid, coords_block: jax.Array, offset: Tuple[int, int, int],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Candidate particle ids for one stencil offset.

    coords_block: [B, 3] int32 cell coords of the querying particles.
    Returns (idx [B, cell_cap] clipped for safe gathering,
             valid [B, cell_cap] slot-occupied mask,
             expected [B, 3] the exact cell coords being queried — callers
             must verify candidates truly belong to this cell to make hash
             collisions harmless).
    """
    off = jnp.asarray(offset, jnp.int32)
    expected = coords_block + off
    b = _hash_coords(expected[:, 0], expected[:, 1], expected[:, 2],
                     grid.num_buckets)
    idx = grid.table[b]                      # [B, cell_cap]
    valid = idx < grid.coords.shape[0]
    return jnp.minimum(idx, grid.coords.shape[0] - 1), valid, expected


def candidate_cell_check(grid: CellGrid, idx, valid, expected):
    """valid AND candidate's true cell == expected (collision dedupe)."""
    cand_coords = grid.coords[idx]            # [B, cell_cap, 3]
    same = jnp.all(cand_coords == expected[:, None, :], axis=-1)
    return valid & same


__all__ = [
    "CellGrid", "build_grid", "stencil_candidates", "candidate_cell_check",
    "STENCIL", "next_pow2",
]

"""Hashed cell-grid neighbour search (TPU-native octree replacement).

The reference prunes neighbour searches with a recursive octree AABB-overlap
walk (SUMMER_SPH.f90:149-246 build, :323-457 walks) — pointer-chasing that
maps terribly onto XLA.  The engine instead uses the standard space-filling
/ spatial-hash cell grid (PAPERS.md: Gadget3 SFC neighbour search, GPU cell
lists): bin particles into cubic cells of side = the largest kernel support
(2 h_max), so every interacting pair lies within the 3x3x3 cell stencil of
either endpoint.  All shapes are static.

Design (TPU-tuned):

* cells are addressed by a packed 30-bit linear key: integer coords in a
  1024^3 window anchored at the live-particle minimum, clamped at the window
  border.  Clamping is monotone, so it never separates truly-close pairs —
  far outliers merge into border cells and are rejected by the kernels'
  distance cutoff (only a perf cost, counted in `n_clamped`);
* keys hash into a fixed power-of-two bucket table holding up to `cell_cap`
  particle ids per bucket; build counts overflow (`n_dropped`) so an
  undersized table degrades loudly, never silently;
* candidate validity is a single int32 compare: gather the candidate's
  stored key and match it against the queried cell's key.  This makes hash
  collisions harmless (a collision's candidates fail the key match) at the
  cost of one [rows, cap] integer gather — the layout-friendly replacement
  for comparing three coordinate planes.

Dead particles get the sentinel key (matches nothing) and are dropped from
the table, so stencils contain live candidates only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..state import Particles

WINDOW_BITS = 10
WINDOW = 1 << WINDOW_BITS                      # 1024 cells per axis
SENTINEL_KEY = 1 << 30                         # dead / invalid (int32 range)

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
    table: jax.Array       # [num_buckets, cell_cap] int32 particle ids; == n => empty
    key: jax.Array         # [N] int32 packed cell key per particle (sentinel if dead)
    origin: jax.Array      # [3] grid origin
    cell_size: jax.Array   # scalar
    n_dropped: jax.Array   # live particles that overflowed their bucket
    n_clamped: jax.Array   # live particles clamped to the window border

    @property
    def num_buckets(self) -> int:
        return self.table.shape[0]

    @property
    def cell_cap(self) -> int:
        return self.table.shape[1]

    @property
    def n(self) -> int:
        return self.key.shape[0]


def cell_coords_of(grid: CellGrid, pos):
    """Integer cell coords (clamped window) of arbitrary positions."""
    return _coords(pos, grid.origin, grid.cell_size)


def _coords(pos, origin, cell_size):
    c = jnp.floor((pos - origin) / cell_size)
    return jnp.clip(c, 0.0, WINDOW - 1).astype(jnp.int32)


def pack_key(cx, cy, cz):
    return (cx << (2 * WINDOW_BITS)) | (cy << WINDOW_BITS) | cz


def _hash_key(key, num_buckets: int):
    """Multiplicative (Knuth) hash of the packed key -> bucket id."""
    h = key.astype(jnp.uint32) * jnp.uint32(2654435761)
    shift = 32 - (num_buckets.bit_length() - 1)
    return (h >> shift).astype(jnp.int32) & jnp.int32(num_buckets - 1)


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

    coords = _coords(p.pos, origin, cell_size)
    key = jnp.where(p.alive,
                    pack_key(coords[:, 0], coords[:, 1], coords[:, 2]),
                    SENTINEL_KEY)
    raw = (p.pos - origin) / cell_size
    n_clamped = jnp.sum(p.alive & jnp.any(raw >= WINDOW, axis=-1)).astype(jnp.int32)

    bucket = _hash_key(key, nb)

    # Rank of each particle within its bucket: sort by bucket, then
    # rank = position_in_sorted - first_position_of_bucket.
    order = jnp.argsort(bucket)
    bucket_sorted = bucket[order]
    first = jnp.searchsorted(bucket_sorted, bucket_sorted, side="left")
    rank_sorted = jnp.arange(cap, dtype=jnp.int32) - first.astype(jnp.int32)
    alive_sorted = p.alive[order]

    cell_cap = cfg.cell_cap
    keep = alive_sorted & (rank_sorted < cell_cap)
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
        key=key,
        origin=origin,
        cell_size=cell_size,
        n_dropped=n_dropped,
        n_clamped=n_clamped,
    )


def stencil_candidates(
    grid: CellGrid, coords_block: jax.Array, offset: Tuple[int, int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Candidate particle ids for one stencil offset.

    coords_block: [B, 3] int32 cell coords of the querying particles.
    Returns (idx [B, cell_cap] clipped for safe gathering,
             valid [B, cell_cap]): valid requires the candidate's stored key
    to equal the queried cell's key, so hash collisions can neither
    double-count nor alias.
    """
    off = jnp.asarray(offset, jnp.int32)
    e = coords_block + off
    in_window = jnp.all((e >= 0) & (e < WINDOW), axis=-1)
    ekey = jnp.where(in_window, pack_key(e[:, 0], e[:, 1], e[:, 2]),
                     jnp.int32(-1))
    b = _hash_key(ekey, grid.num_buckets)
    idx = grid.table[b]                        # [B, cell_cap]
    n = grid.n
    idx_c = jnp.minimum(idx, n - 1)
    valid = (idx < n) & (grid.key[idx_c] == ekey[:, None])
    return idx_c, valid


__all__ = [
    "CellGrid", "build_grid", "stencil_candidates", "cell_coords_of",
    "pack_key", "STENCIL", "next_pow2", "WINDOW", "WINDOW_BITS",
]

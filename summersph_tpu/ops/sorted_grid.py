"""Sorted space-filling-curve neighbour engine (the production TPU path).

The hashed cell grid (ops.neighbors) is correct but gather-bound: its
stencil lookups are elementwise random gathers, which XLA TPU executes at
~0.1 G elem/s.  Row-aligned slice gathers (`f2d[rows]` with 128-wide rows)
run ~500x faster, so the production engine restructures neighbour search
around them — the TPU translation of the reference's octree walk
(SUMMER_SPH.f90:323-457) by way of the Gadget3-style SFC ordering
(PAPERS.md):

1. particles are sorted by a packed linear cell key
   key = (cx << 20) | (cy << 10) | cz  (z fastest; 1024^3 clamped window
   anchored at the live minimum; dead particles carry a sentinel key and
   sort to the end);
2. in sorted order, the neighbours of any cell at (dx, dy) offset occupy a
   *contiguous key range* of 3 z-cells: [key + dx KX + dy KY - 1, ... + 1];
3. rows are processed in groups of `cfg.window_group` consecutive sorted
   particles; each group's 9 (dx, dy) candidate windows are found with two
   searchsorted calls and gathered as `cfg.window_blocks` 128-row-aligned
   slices — no random gathers anywhere.  (The window group is deliberately
   smaller than the Pallas program block `cfg.sorted_block`: a window must
   cover its group's own key span plus two 3-cell column occupancies plus
   DMA alignment slop, so shrinking the group from 128 to 32 rows roughly
   halves the candidate lanes per row at equal coverage — measured on ball
   geometry, N-independent.  Pallas programs sub-block their rows into
   sorted_block/window_group window groups.);
4. candidate membership is decided per row by an exact key-range test:
   candidate j belongs to row i's offset-o stencil iff
   key_i + off - 1 <= key_j <= key_i + off + 1.  These per-row ranges are
   pairwise disjoint across the 9 offsets (offsets differ by >= 1024 while
   each range spans 3), so no pair is ever double counted even though the
   shared group windows overlap when a group straddles a y-column; coverage
   follows from [k + off +- 1] being inside the queried group window
   [kmin + off - 1, kmax + off + 1] for every row key k in [kmin, kmax].
   Candidates dropped by window clamping are counted in
   `n_window_overflow` — correctness degrades loudly.

The whole particle pytree is sorted with one multi-operand lax.sort and
*stays* sorted across the step (particle identity lives in `pid`,
mirroring the reference's `number` field, SUMMER_SPH.f90:15).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..state import Particles
from . import pairs
from .neighbors import SENTINEL_KEY, WINDOW, WINDOW_BITS

KX = 1 << (2 * WINDOW_BITS)
KY = 1 << WINDOW_BITS

# (dx, dy) plane offsets; each covers dz in {-1, 0, 1} as one key range.
PLANE_OFFSETS = [dx * KX + dy * KY
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

LANES = 128


@struct.dataclass
class SortedGrid:
    key: jax.Array          # [Np] int32 sorted cell keys (padded; dead = sentinel)
    starts: jax.Array       # [G, 9] int32 window start (G = Np / window_group)
    ends: jax.Array         # [G, 9] int32 window end (exclusive, <= first dead)
    origin: jax.Array       # [3]
    cell_size: jax.Array    # scalar
    n_window_overflow: jax.Array  # candidates beyond the static window size
    n_clamped: jax.Array    # live particles clamped to the window border

    @property
    def padded_n(self) -> int:
        return self.key.shape[0]


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _cell_key(pos, origin, cell_size):
    c = jnp.floor((pos - origin) / cell_size)
    c = jnp.clip(c, 0.0, WINDOW - 1).astype(jnp.int32)
    return (c[..., 0] << (2 * WINDOW_BITS)) | (c[..., 1] << WINDOW_BITS) | c[..., 2]


# Fields that must ride the sort: inputs of the density/EOS/force passes
# that run *after* sorting.  rho/pressure/cs/omega/acc/du/dalpha are outputs
# of those passes (and the carried acc/du/dalpha rates were already consumed
# by the pre-sort kick), so they are zero-filled instead of sorted — the
# multi-operand lax.sort cost scales with operand count (12 vs 22 operands
# is ~40% cheaper at N=1e6, measured).
_SORT_FIELDS = ("mass", "u", "alpha", "h")
_ZERO_FIELDS = ("rho", "pressure", "cs", "du", "dalpha")


def window_ranks(key_s, lo, hi):
    """(starts, ends) = searchsorted(key_s, lo, 'left'/'right' for hi).

    Counting-sort formulation with a sort-based unpermute: rank of a query
    in the combined (keys + queries) sorted order minus its rank among
    queries equals its searchsorted position.  jnp.searchsorted's default
    bisection lowers to a log2(N)-iteration XLA while loop (9.6 ms/step at
    N=131k) and its method='sort' unpermutes through an XLA scatter
    (~19 ms/step at N=1e6); two multi-operand lax.sorts + a cumsum do the
    same work in ~5 ms.  Assumes int32 keys/queries (cell keys).
    """
    n = key_s.shape[0]
    q = lo.size
    vals = jnp.concatenate([key_s, lo.reshape(-1), hi.reshape(-1)])
    # tiebreak: 'left' queries sort before equal keys, 'right' after
    tie = jnp.concatenate([
        jnp.ones((n,), jnp.int32),
        jnp.zeros((q,), jnp.int32),
        jnp.full((q,), 2, jnp.int32)])
    qid = jnp.concatenate([
        jnp.full((n,), 2 * q, jnp.int32),
        jnp.arange(q, dtype=jnp.int32),
        jnp.arange(q, 2 * q, dtype=jnp.int32)])
    _, t_s, q_s = jax.lax.sort([vals, tie, qid], num_keys=2,
                               is_stable=False)
    is_key = (t_s == 1).astype(jnp.int32)
    before = jnp.cumsum(is_key) - is_key  # keys strictly before each slot
    q_o, pos = jax.lax.sort([q_s, before], num_keys=1, is_stable=False)
    return pos[:q], pos[q:2 * q]


def sort_particles(p: Particles, cfg: SimConfig, h_pad: float = 1.0,
                   cell_size_override=None, carry_derived: bool = False,
                   extra=None) -> Tuple[Particles, SortedGrid]:
    """Sort the particle pytree by cell key and precompute stencil windows.

    Returns (sorted particles — possibly padded with dead slots to a
    multiple of sorted_block*128, grid) — plus the sorted `extra` array as a
    third element when `extra` is given.  `h_pad` inflates the cell size
    (headroom for the variable-h Newton iteration, ops.smoothing);
    `cell_size_override` replaces the 2*h_max kernel-support sizing entirely
    (the PM short-range pass sorts by r_cut-sized cells,
    ops.pm_gravity).

    Only the pair-pass *inputs* survive the sort (see _SORT_FIELDS); the
    derived fields (rho, P, cs, omega, acc, du, dalpha) come back zeroed and
    must be recomputed by the caller — force_eval always does.  EXCEPT with
    `carry_derived=True` (the block-timestep substep sort, blockstep.py):
    inactive rows keep serving their last evaluation's rho/P/cs/omega to
    their active neighbours and their carried acc/du/dalpha rates to their
    own eventual kicks, so ALL derived fields ride the sort as extra
    operands (~10 more; multi-operand lax.sort cost scales with operand
    count — measured +40% from 12 to 22 operands at N=1e6).  `extra` is an
    optional [N] int32 array sorted alongside (the per-particle rung).
    """
    cap = p.capacity
    B = cfg.sorted_block
    wg = cfg.window_group
    if B % wg or LANES % wg:
        raise ValueError(
            f"cfg.window_group ({wg}) must divide both cfg.sorted_block "
            f"({B}) and {LANES} so window groups tile the padded capacity")
    padded = _pad_to(cap, max(B, LANES))
    if padded != cap:
        base = Particles.zeros(padded, p.pos.dtype)
        if p.u_c is not None:  # match the optional-carry pytree structure
            base = base.replace(u_c=jnp.zeros((padded,), p.pos.dtype))
        if p.acc_ext is not None:
            base = base.replace(acc_ext=jnp.zeros((padded, 3), p.pos.dtype))
        p = jax.tree_util.tree_map(
            lambda full, part: full.at[:cap].set(part), base, p)
        if extra is not None:
            extra = jnp.zeros((padded,), extra.dtype).at[:cap].set(extra)
        cap = padded

    inf = jnp.asarray(jnp.inf, p.pos.dtype)
    origin = jnp.min(jnp.where(p.alive[:, None], p.pos, inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    if cell_size_override is not None:
        cell_size = jnp.maximum(jnp.asarray(cell_size_override, p.pos.dtype),
                                1.0e-12)
    else:
        q = cfg.cell_h_quantile
        if q >= 1.0:
            h_cell = jnp.max(jnp.where(p.alive, p.h, 0.0))
        else:
            # quantile of LIVE h: dead slots sort as 0 to the front, live
            # occupy [cap - n_live, cap); q indexes within that span
            hs = jnp.sort(jnp.where(p.alive, p.h, 0.0))
            n_live = jnp.sum(p.alive).astype(jnp.int32)
            idx = (cap - n_live
                   + (q * jnp.maximum(n_live - 1, 0).astype(p.pos.dtype))
                   .astype(jnp.int32))
            h_cell = hs[jnp.clip(idx, 0, cap - 1)]
        cell_size = jnp.maximum(2.0 * h_cell * h_pad, 1.0e-12)

    key = jnp.where(p.alive, _cell_key(p.pos, origin, cell_size),
                    SENTINEL_KEY)
    raw = (p.pos - origin) / cell_size
    # n_clamped: particles the grid cannot fully represent — position past
    # the 1024^3 key window, or (cell_h_quantile < 1) kernel support wider
    # than the +-1-cell stencil this step (their h gets clamped to cell/2
    # by the epilogue's h_cap; the violation lasts one step).
    reach_over = p.alive & (2.0 * p.h * h_pad > cell_size)
    pos_over = p.alive & jnp.any(raw >= WINDOW, axis=-1)
    n_clamped = jnp.sum(pos_over | reach_over).astype(jnp.int32)

    # One fused sort of the pair-pass inputs (alive rides implicitly: live
    # particles carry key < SENTINEL_KEY by construction, dead carry exactly
    # SENTINEL_KEY, so alive == (key != SENTINEL_KEY) after the sort).
    sort_fields = _SORT_FIELDS + (("u_c",) if p.u_c is not None else ())
    if carry_derived:
        sort_fields = sort_fields + _ZERO_FIELDS + ("omega",)
    operands = [key]
    operands += [p.pos[:, k] for k in range(3)]
    operands += [p.vel[:, k] for k in range(3)]
    operands += [getattr(p, f) for f in sort_fields]
    operands += [p.pid]
    if p.acc_ext is not None:  # held PM force rides the sort (cfg.pm_every)
        operands += [p.acc_ext[:, k] for k in range(3)]
    n_tail = len(operands)
    if carry_derived:
        operands += [p.acc[:, k] for k in range(3)]
    if extra is not None:
        operands += [extra]
    out = jax.lax.sort(operands, num_keys=1, is_stable=False)
    key_s = out[0]
    pos = jnp.stack(out[1:4], axis=-1)
    vel = jnp.stack(out[4:7], axis=-1)
    rest = dict(zip(sort_fields, out[7:7 + len(sort_fields)]))
    pid = out[7 + len(sort_fields)]
    acc_ext = (jnp.stack(out[8 + len(sort_fields):11 + len(sort_fields)],
                         axis=-1) if p.acc_ext is not None else None)
    zero = jnp.zeros_like(key_s, p.pos.dtype)
    if carry_derived:
        acc_s = jnp.stack(out[n_tail:n_tail + 3], axis=-1)
        p_s = p.replace(pos=pos, vel=vel, acc=acc_s,
                        alive=key_s != SENTINEL_KEY, pid=pid,
                        acc_ext=acc_ext, **rest)
    else:
        p_s = p.replace(pos=pos, vel=vel, acc=jnp.zeros_like(pos),
                        alive=key_s != SENTINEL_KEY, pid=pid,
                        omega=jnp.ones_like(zero), acc_ext=acc_ext,
                        **rest, **{f: zero for f in _ZERO_FIELDS})
    extra_s = out[-1] if extra is not None else None

    # Group stencil windows.
    G = cap // wg
    kmin = key_s.reshape(G, wg)[:, 0]
    kmax = key_s.reshape(G, wg)[:, -1]
    # == count of live keys (key_s is sorted with dead == SENTINEL at the
    # end); a reduction beats a scalar bisection while-loop on this backend
    first_dead = jnp.sum(key_s != SENTINEL_KEY).astype(jnp.int32)
    offs = jnp.asarray(PLANE_OFFSETS, jnp.int32)                 # [9]
    lo = kmin[:, None] + offs[None, :] - 1                       # [G, 9]
    hi = kmax[:, None] + offs[None, :] + 1
    starts, ends = window_ranks(key_s, lo, hi)
    starts = starts.reshape(G, 9)
    ends = ends.reshape(G, 9)
    ends = jnp.minimum(ends, first_dead)
    ends = jnp.maximum(ends, starts)

    reach = (starts // LANES) * LANES + cfg.window_blocks * LANES
    n_over = jnp.sum(jnp.maximum(ends - reach, 0)).astype(jnp.int32)

    grid = SortedGrid(
        key=key_s, starts=starts, ends=ends, origin=origin,
        cell_size=cell_size, n_window_overflow=n_over, n_clamped=n_clamped,
    )
    if extra is not None:
        return p_s, grid, extra_s
    return p_s, grid


def _window_gather(f2d, sb, blk):
    """Gather one 128-wide block row per group: [G] -> [G, 128]."""
    rows = jnp.clip(sb + blk, 0, f2d.shape[0] - 1)
    return f2d[rows]


def _gi_valid(sb, blk, cap):
    """[G, 1, 128] mask: global index of this gathered lane is in range
    (rejects the duplicate lanes produced by clamping near the array top)."""
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    gi = (sb[:, None] + blk) * LANES + lane                      # [G, 128]
    return ((gi >= 0) & (gi < cap))[:, None, :]


def _rows_view(p: Particles, cfg: SimConfig, grid: SortedGrid, rows):
    """(p_rows, key_rows, starts_rows, n_rows): the row-side arrays for a
    pair pass.  Three forms:

    * rows=None — rows are the whole sorted set `p`;
    * rows=(p_rows, offset) with a scalar offset — this device's
      contiguous slice of the replicated sorted order (parallel.sharded:
      grid covers all of `p`, slice the plan at offset);
    * rows=(p_rows, key_rows) with a [n_rows] key array — the rows are a
      separate set from the columns `p` and `grid.starts/ends` were built
      for the ROW groups directly (parallel.decomp.build_cols).
    """
    if rows is None:
        return p, grid.key, grid.starts, p.capacity
    p_rows, second = rows
    n_rows = p_rows.capacity
    if jnp.ndim(second) == 1:        # decomp: (p_rows, key_rows)
        return p_rows, second, grid.starts, n_rows
    offset = second
    wg = cfg.window_group
    key_rows = jax.lax.dynamic_slice(grid.key, (offset,), (n_rows,))
    starts_rows = jax.lax.dynamic_slice_in_dim(
        grid.starts, offset // wg, n_rows // wg)
    return p_rows, key_rows, starts_rows, n_rows


def sorted_density(p: Particles, cfg: SimConfig, grid: SortedGrid,
                   rows=None) -> Particles:
    """Density + Omega over the sorted windows (cols = p, sorted; rows = p
    or its rows=(p_rows, offset) slice).  Returns the updated row set."""
    cap = p.capacity
    B = cfg.window_group
    pr, key_r, starts_r, n_rows = _rows_view(p, cfg, grid, rows)
    G = n_rows // B
    R = cap // LANES

    x2 = p.pos[:, 0].reshape(R, LANES)
    y2 = p.pos[:, 1].reshape(R, LANES)
    z2 = p.pos[:, 2].reshape(R, LANES)
    m2 = jnp.where(p.alive, p.mass, 0.0).reshape(R, LANES)
    k2 = grid.key.reshape(R, LANES)

    xi = pr.pos[:, 0].reshape(G, B, 1)
    yi = pr.pos[:, 1].reshape(G, B, 1)
    zi = pr.pos[:, 2].reshape(G, B, 1)
    hi = pr.h.reshape(G, B, 1)
    ki = key_r.reshape(G, B, 1)

    sb = starts_r // LANES
    rho = jnp.zeros((G, B), p.pos.dtype)
    omega_raw = jnp.zeros((G, B), p.pos.dtype)
    for o in range(9):
        lo = ki + (PLANE_OFFSETS[o] - 1)
        hi_k = ki + (PLANE_OFFSETS[o] + 1)
        for blk in range(cfg.window_blocks):
            cx = _window_gather(x2, sb[:, o], blk)[:, None, :]   # [G, 1, 128]
            cy = _window_gather(y2, sb[:, o], blk)[:, None, :]
            cz = _window_gather(z2, sb[:, o], blk)[:, None, :]
            cm = _window_gather(m2, sb[:, o], blk)[:, None, :]
            kj = _window_gather(k2, sb[:, o], blk)[:, None, :]
            mask = (kj >= lo) & (kj <= hi_k) & _gi_valid(sb[:, o], blk, cap)
            r, w = pairs.density_sums(xi - cx, yi - cy, zi - cz, hi, cm, mask)
            rho = rho + r
            omega_raw = omega_raw + w

    rho, omega = pairs.finalize_density(
        rho.reshape(n_rows), omega_raw.reshape(n_rows), pr.h, pr.alive,
        pr.mass)
    if cfg.fixed_h is not None:
        omega = jnp.ones_like(omega)
    return pr.replace(rho=rho, omega=omega)


def sorted_forces(p: Particles, cfg: SimConfig, grid: SortedGrid, rows=None):
    """SPH pressure+viscosity force pass over the sorted windows.

    Returns (acc [N,3], du [N], dalpha [N]) in the sorted order of `p`
    (row-sliced like sorted_density when rows=(p_rows, offset) is given).
    """
    cap = p.capacity
    B = cfg.window_group
    pr, key_r, starts_r, n_rows = _rows_view(p, cfg, grid, rows)
    G = n_rows // B
    R = cap // LANES

    def two_d(a):
        return a.reshape(R, LANES)

    cols = dict(
        x=two_d(p.pos[:, 0]), y=two_d(p.pos[:, 1]), z=two_d(p.pos[:, 2]),
        vx=two_d(p.vel[:, 0]), vy=two_d(p.vel[:, 1]), vz=two_d(p.vel[:, 2]),
        h=two_d(p.h), P=two_d(p.pressure), rho=two_d(p.rho),
        om=two_d(p.omega), cs=two_d(p.cs), al=two_d(p.alpha),
        m=two_d(jnp.where(p.alive, p.mass, 0.0)),
    )
    k2 = grid.key.reshape(R, LANES)

    def rshape(a):
        return a.reshape(G, B, 1)

    xi, yi, zi = rshape(pr.pos[:, 0]), rshape(pr.pos[:, 1]), rshape(pr.pos[:, 2])
    vxi, vyi, vzi = rshape(pr.vel[:, 0]), rshape(pr.vel[:, 1]), rshape(pr.vel[:, 2])
    hi, Pi, rhoi = rshape(pr.h), rshape(pr.pressure), rshape(pr.rho)
    omi, csi, ali = rshape(pr.omega), rshape(pr.cs), rshape(pr.alpha)
    ki = key_r.reshape(G, B, 1)

    sb = starts_r // LANES
    z = jnp.zeros((G, B), p.pos.dtype)
    ax, ay, az, du, araw = z, z, z, z, z
    for o in range(9):
        lo = ki + (PLANE_OFFSETS[o] - 1)
        hi_k = ki + (PLANE_OFFSETS[o] + 1)
        for blk in range(cfg.window_blocks):
            g = {k: _window_gather(v, sb[:, o], blk)[:, None, :]
                 for k, v in cols.items()}
            kj = _window_gather(k2, sb[:, o], blk)[:, None, :]
            mask = (kj >= lo) & (kj <= hi_k) & _gi_valid(sb[:, o], blk, cap)
            dax, day, daz, ddu, dar = pairs.force_sums(
                xi - g["x"], yi - g["y"], zi - g["z"],
                vxi - g["vx"], vyi - g["vy"], vzi - g["vz"],
                hi, g["h"], Pi, g["P"], rhoi, g["rho"],
                omi, g["om"], csi, g["cs"], ali, g["al"],
                g["m"], mask, cfg,
            )
            ax, ay, az = ax + dax, ay + day, az + daz
            du, araw = du + ddu, araw + dar

    acc = jnp.stack([ax.reshape(n_rows), ay.reshape(n_rows),
                     az.reshape(n_rows)], axis=-1)
    du = du.reshape(n_rows)
    araw = araw.reshape(n_rows)
    dalpha = pairs.alpha_rate(araw, pr.rho, pr.alpha, pr.cs, pr.h, cfg)
    alive = pr.alive
    return (
        jnp.where(alive[:, None], acc, 0.0),
        jnp.where(alive, du, 0.0),
        jnp.where(alive, dalpha, 0.0),
    )


__all__ = ["SortedGrid", "sort_particles", "sorted_density", "sorted_forces",
           "PLANE_OFFSETS", "LANES"]

"""SFC slab domain decomposition: rim-exchange multi-chip scaling.

The first sharded engine (parallel.sharded + integrate.
_force_eval_sorted_sharded) replicates the global sort and all_gathers the
full particle set twice per step — pair math scales 1/D but memory and
comm are O(N) per device, capping the reachable N.  This module is the
scaling mode that removes that ceiling (SURVEY.md §2.3; the reference has
no distributed mode at all — its only parallelism is OpenMP threads over
one shared array, SUMMER_SPH.f90:302-313):

* **Ownership = contiguous global SFC-rank slabs.**  Every particle key
  interval is a contiguous interval of the global sorted order, so device
  d owning ranks [d N/D, (d+1) N/D) owns a spatially coherent blob, and
  everything any of its particles can interact with through the ±1-cell
  stencil lives within a bounded number of ranks of the slab edges — the
  *rim*.  For a quasi-uniform distribution the rim is ~3 x-planes of
  particles, i.e. O(N^(2/3)), not O(N).

* **Redistribution by sampled splitters + all_to_all.**  Each device
  sorts its slab locally by the (globally consistent) cell key, strides a
  sample of its live keys, and the all_gathered sample's quantiles become
  the D-1 key splitters.  Because `dest = searchsorted(splitters, key)`
  is monotone in key, the local sort already groups migrants by
  destination: per-destination chunks are dynamic slices, exchanged with
  one `all_to_all` of fixed-size [D, migrate_rows] buffers, and merged
  with one local sort.  Chunk overflow keeps the particle *home* (counted
  in the decomp stats — mis-owned, never lost); slab overflow (more live
  particles than a slab holds) is likewise counted loudly.

* **Rim (halo) exchange by ppermute.**  After the merge each device's
  slab is sorted; its first/last `halo_rows` live rows are exactly the
  rim its rank-neighbours need.  One ppermute right and one left build
  the local column set [left rim | own | right rim]; a final local sort
  (key, pid — a deterministic total order, so the later density-field
  attach sort reproduces the identical permutation) orders it for the
  standard window machinery (ops.sorted_grid.window_ranks), which needs
  no modification: window starts/ends are computed for the *own* row
  groups against the local column keys.

Everything fixed-capacity and loudly counted, like the rest of the
engine: migration chunk overflow, slab capacity overflow, and rim
under-coverage (an own row whose stencil reaches past what a truncated
neighbour rim delivered) all land in the step's stats vector.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..ops.neighbors import SENTINEL_KEY, WINDOW
from ..ops.sorted_grid import LANES, PLANE_OFFSETS, _cell_key
from ..state import Particles

KX = 1 << 20
KY = 1 << 10


@struct.dataclass
class DecompAux:
    """Per-step decomposition context threaded from force_eval to the
    step epilogue (the h-iteration re-sums against the same local columns
    and windows; `pressure` sums this step's fixed-capacity pressure
    events — chunk-full migrants kept home, slab-full drops, rim
    under-coverage — for the `decomp_pressure` stats slot)."""
    grid: "object"          # ops.sorted_grid.SortedGrid (local, row windows)
    cols: Particles         # [nloc + 2 halo] sorted local column set
    key_rows: jax.Array     # [nloc] own sorted keys
    pressure: jax.Array     # int32 scalar


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def global_geometry(p: Particles, cfg: SimConfig, axis_name: str,
                    h_pad: float = 1.0):
    """(origin [3], cell_size scalar): the global grid geometry, identical
    on every device (collectives over local extremes).

    Mirrors sort_particles' sizing: cell = 2 * h_pad * quantile(h_live, q)
    with q = cfg.cell_h_quantile.  The quantile is computed from a psum'd
    256-bin histogram between the global live h extremes and rounded UP to
    its bin's upper edge — deterministic, replicated, and conservative
    (a slightly larger cell only widens windows).
    """
    inf = jnp.asarray(jnp.inf, p.pos.dtype)
    lo = jnp.min(jnp.where(p.alive[:, None], p.pos, inf), axis=0)
    origin = jax.lax.pmin(jnp.where(jnp.isfinite(lo), lo, inf), axis_name)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)

    h_live = jnp.where(p.alive, p.h, 0.0)
    h_max = jax.lax.pmax(jnp.max(h_live), axis_name)
    q = cfg.cell_h_quantile
    if q >= 1.0:
        h_cell = h_max
    else:
        h_min = jax.lax.pmin(
            jnp.min(jnp.where(p.alive, p.h, jnp.inf)), axis_name)
        h_min = jnp.where(jnp.isfinite(h_min), h_min, 0.0)
        nbins = 256
        width = jnp.maximum(h_max - h_min, 1.0e-12)
        idx = jnp.clip(((h_live - h_min) / width * nbins).astype(jnp.int32),
                       0, nbins - 1)
        hist = jnp.zeros((nbins,), jnp.int32).at[idx].add(
            p.alive.astype(jnp.int32))
        hist = jax.lax.psum(hist, axis_name)
        n_live = jnp.sum(hist)
        csum = jnp.cumsum(hist)
        target = (q * n_live.astype(p.pos.dtype)).astype(jnp.int32)
        bin_i = jnp.argmax(csum >= jnp.maximum(target, 1))
        h_cell = h_min + (bin_i + 1).astype(p.pos.dtype) / nbins * width
        h_cell = jnp.minimum(h_cell, h_max)
    cell_size = jnp.maximum(2.0 * h_cell * h_pad, 1.0e-12)
    return origin, cell_size


# Fields that ride the redistribution / merge sort, in operand order after
# the key: pos, vel, then these scalars, then pid (int32, last).
_RIDE_FIELDS = ("mass", "u", "alpha", "h")


def _sort_bundle(p: Particles, key):
    """The lax.sort operand list [key, pid, x,y,z, vx,vy,vz, scalars...,
    (u_c)] for this particle set.  pid rides SECOND so every decomp sort
    uses the same deterministic total order (key, pid) — the density-field
    attach sort must reproduce the column sort's permutation exactly, and
    duplicate cell keys are the common case."""
    ops = [key, p.pid]
    ops += [p.pos[:, k] for k in range(3)]
    ops += [p.vel[:, k] for k in range(3)]
    ops += [getattr(p, f) for f in _RIDE_FIELDS]
    if p.u_c is not None:
        ops.append(p.u_c)
    return ops


def _unbundle(p_like: Particles, out):
    """Rebuild a Particles pytree from a sorted _sort_bundle, zeroing the
    derived fields exactly like ops.sorted_grid.sort_particles."""
    key_s = out[0]
    pid = out[1]
    pos = jnp.stack(out[2:5], axis=-1)
    vel = jnp.stack(out[5:8], axis=-1)
    nf = len(_RIDE_FIELDS)
    rest = dict(zip(_RIDE_FIELDS, out[8:8 + nf]))
    u_c = out[8 + nf] if p_like.u_c is not None else None
    zero = jnp.zeros_like(key_s, pos.dtype)
    p_s = p_like.replace(
        pos=pos, vel=vel, acc=jnp.zeros_like(pos),
        alive=key_s != SENTINEL_KEY, pid=pid, u_c=u_c,
        omega=jnp.ones_like(zero), rho=zero, pressure=zero, cs=zero,
        du=zero, dalpha=zero, **rest)
    return key_s, p_s


def _like(p: Particles, n: int) -> Particles:
    base = Particles.zeros(n, p.pos.dtype)
    if p.u_c is not None:
        base = base.replace(u_c=jnp.zeros((n,), p.pos.dtype))
    return base


def redistribute(p: Particles, cfg: SimConfig, axis_name: str,
                 origin, cell_size):
    """Re-own particles by global SFC rank slabs.

    Returns (key_own [nloc] sorted, p_own sorted Particles, splitters
    [D-1], n_misowned, n_slab_overflow).  The own slab is sorted by
    (key, pid) with dead rows (SENTINEL key) at the end.
    """
    D = _axis_size(axis_name)
    nloc = p.capacity
    C = min(cfg.migrate_rows, nloc)

    key = jnp.where(p.alive, _cell_key(p.pos, origin, cell_size),
                    SENTINEL_KEY)
    # Local (key, pid) sort: groups live rows by destination (dest is
    # monotone in key) and puts the live prefix first for sampling.
    out = jax.lax.sort(_sort_bundle(p, key), num_keys=2, is_stable=False)
    key_s, p_s = _unbundle(p, out)
    n_live = jnp.sum(key_s != SENTINEL_KEY).astype(jnp.int32)

    if D == 1:
        z = jnp.zeros((), jnp.int32)
        return key_s, p_s, jnp.zeros((0,), jnp.int32), z, z

    # Splitters: stratified sample of each device's live prefix,
    # all_gathered with per-device LIVE counts as weights; splitter j is
    # the weighted (j+1)/D quantile.  Weighting matters: an imbalanced
    # start (e.g. every live particle on one device) would otherwise
    # dilute the sample with empty devices' SENTINELs and send everything
    # to slab 0 forever.
    S = cfg.decomp_samples
    # Midpoint-stratified over the live prefix: idx_i = (2i+1) n_live / 2S.
    # (A floor-strided sample covers only [0, S * (n_live // S)) and biases
    # every splitter low, systematically overfilling the top slab.)
    samp_idx = jnp.minimum(
        ((2 * jnp.arange(S, dtype=jnp.int32) + 1) * n_live) // (2 * S),
        jnp.maximum(n_live - 1, 0))
    samples = jnp.where(n_live > 0, key_s[samp_idx], SENTINEL_KEY)
    # each sample represents ~n_live/S live rows; int32 cumsum stays ~N
    weights = jnp.full((S,), jnp.maximum((n_live + S - 1) // S, 1),
                       jnp.int32)
    all_samp = jax.lax.all_gather(samples, axis_name).reshape(-1)
    all_w = jnp.where(all_samp == SENTINEL_KEY, 0,
                      jax.lax.all_gather(weights, axis_name).reshape(-1))
    all_samp, all_w = jax.lax.sort([all_samp, all_w], num_keys=1,
                                   is_stable=False)
    cumw = jnp.cumsum(all_w)
    total = cumw[-1]
    targets = (jnp.arange(1, D, dtype=jnp.int32) * total) // D
    # first sample index where cumw > target  ->  weighted quantile key
    idx = jnp.searchsorted(cumw, targets, side="right",
                           method="compare_all")
    splitters = all_samp[jnp.clip(idx, 0, D * S - 1)]

    # Chunk bounds in my sorted order: rows [b[j], b[j+1]) belong to slab j.
    bounds = jnp.searchsorted(key_s, splitters, side="left",
                              method="compare_all").astype(jnp.int32)
    bounds = jnp.minimum(bounds, n_live)
    b_full = jnp.concatenate([jnp.zeros((1,), jnp.int32), bounds,
                              n_live[None]])
    counts = b_full[1:] - b_full[:-1]                       # [D]
    me = jax.lax.axis_index(axis_name)

    # Send chunks: C rows per destination, my own chunk masked dead (it
    # stays), rows beyond C masked dead AND kept home (mis-owned, counted).
    send_cap = counts  # alias for clarity
    n_misowned = jnp.sum(
        jnp.where(jnp.arange(D) == me, 0, jnp.maximum(send_cap - C, 0))
    ).astype(jnp.int32)

    fields = [key_s] + list(out[1:])    # key + 10-12 ride operands
    k = jnp.arange(C, dtype=jnp.int32)

    def chunk(j):
        start = jnp.clip(b_full[j], 0, nloc - C)
        valid = ((k + start >= b_full[j]) & (k < counts[j] + b_full[j] - start)
                 & (j != me))
        rows = [jax.lax.dynamic_slice_in_dim(f, start, C) for f in fields]
        rows[0] = jnp.where(valid, rows[0], SENTINEL_KEY)
        return rows, valid

    chunks, valids = [], []
    for j in range(D):
        rj, vj = chunk(jnp.asarray(j, jnp.int32))
        chunks.append(rj)
        valids.append(vj)
    send = [jnp.stack([c[f] for c in chunks]) for f in range(len(fields))]
    sent_any = jnp.zeros((nloc,), bool)
    for j in range(D):
        start = jnp.clip(b_full[j], 0, nloc - C)
        m = jnp.zeros((nloc,), bool)
        m = jax.lax.dynamic_update_slice_in_dim(m, valids[j], start, 0)
        sent_any = sent_any | m

    recv = [jax.lax.all_to_all(s, axis_name, split_axis=0, concat_axis=0,
                               tiled=False).reshape(D * C) for s in send]

    # Merge: kept home rows (sent ones masked dead) + received, one sort.
    key_home = jnp.where(sent_any, SENTINEL_KEY, key_s)
    merged = [jnp.concatenate([key_home, recv[0]])]
    for f in range(1, len(fields)):
        merged.append(jnp.concatenate([fields[f], recv[f]]))
    out_m = jax.lax.sort(merged, num_keys=2, is_stable=False)
    key_m, p_m = _unbundle(_like(p, nloc + D * C), out_m)
    n_live_m = jnp.sum(key_m != SENTINEL_KEY).astype(jnp.int32)
    n_slab_overflow = jnp.maximum(n_live_m - nloc, 0)

    take = jax.tree_util.tree_map(lambda a: a[:nloc], p_m)
    return key_m[:nloc], take, splitters, n_misowned, n_slab_overflow


def _ppermute(x, axis_name, shift: int):
    """Ring-free neighbour shift: device d receives from d - shift; edge
    devices receive zeros (ppermute's missing-source semantics)."""
    D = _axis_size(axis_name)
    perm = [(s, s + shift) for s in range(D) if 0 <= s + shift < D]
    return jax.lax.ppermute(x, axis_name, perm)


def exchange_rim(key_own, p_own: Particles, axis_name: str, halo: int,
                 fields=("pos", "vel", "mass", "alpha", "h", "pid"),
                 hops: int = 1):
    """(rim_left, rim_right): each a dict {key, <fields>..., truncated} of
    `hops * halo` rows — the `halo` boundary rows of each of the `hops`
    nearest rank-neighbours per side, farthest hop first (so the left
    rim's keys ascend toward the own slab).

    Rank-space coverage must stay CONTIGUOUS for the shortage accounting
    to be exact: if an inner hop's neighbour holds more live rows than
    `halo` (its middle would be a hole between its boundary slice and the
    next hop's), every hop beyond it is masked dead, and `truncated` is
    computed exactly from the all_gathered per-device live counts:
    True iff live rows exist beyond what the kept rim delivered.  A row
    whose stencil outreaches a truncated rim is counted by
    rim_short_count; a non-truncated rim covers everything that exists on
    that side, however many devices away.

    Deterministic and identical across calls with the same (key_own,
    p_own-aliveness, halo, hops): attach_density relies on reproducing
    build_cols' exact rim row multiset.
    """
    nloc = p_own.capacity
    n_live = jnp.sum(key_own != SENTINEL_KEY).astype(jnp.int32)
    me = jax.lax.axis_index(axis_name)
    D = _axis_size(axis_name)
    counts = jax.lax.all_gather(n_live, axis_name)            # [D]
    hops = min(hops, D - 1) if D > 1 else 0

    def take(start):
        d = {"key": jax.lax.dynamic_slice_in_dim(key_own, start, halo)}
        for f in fields:
            arr = getattr(p_own, f)
            d[f] = jax.lax.dynamic_slice_in_dim(arr, start, halo, axis=0)
        return d

    lo_src = take(jnp.zeros((), jnp.int32))                   # my first rows
    hi_src = take(jnp.clip(n_live - halo, 0, nloc - halo))    # my last live

    def side(src_slice, shift_sign, src_of):
        """One side's rim: hops ppermutes, hole masking, exact truncated."""
        parts = []
        delivered = jnp.zeros((), jnp.int32)
        blocked = jnp.zeros((), bool)   # an inner hop had a hole
        for s in range(1, hops + 1):
            rim = jax.tree_util.tree_map(
                lambda x: _ppermute(x, axis_name, shift_sign * s),
                src_slice)
            src = src_of(s)
            valid = (src >= 0) & (src < D) & ~blocked
            n_src = counts[jnp.clip(src, 0, D - 1)]
            rim["key"] = jnp.where(valid, rim["key"], SENTINEL_KEY)
            parts.append(rim)
            delivered += jnp.where(valid, jnp.minimum(n_src, halo), 0)
            blocked = blocked | (valid & (n_src > halo))
        if not parts:
            empty = {"key": jnp.full((max(halo, 1),), SENTINEL_KEY,
                                     jnp.int32)}
            for f in fields:
                arr = getattr(p_own, f)
                empty[f] = jnp.zeros((max(halo, 1),) + arr.shape[1:],
                                     arr.dtype)
            if "h" in empty:
                empty["h"] = jnp.ones_like(empty["h"])
            empty["truncated"] = jnp.zeros((), bool)
            return empty
        # exact: live rows on this side not delivered by the kept rim
        dev = jnp.arange(D, dtype=jnp.int32)
        on_side = jnp.where(shift_sign > 0, dev < me, dev > me)
        total = jnp.sum(jnp.where(on_side, counts, 0))
        merged = {k: jnp.concatenate([p[k] for p in reversed(parts)])
                  for k in parts[0]}
        merged["truncated"] = total > delivered
        return merged

    rim_left = side(hi_src, +1, lambda s: me - s)
    rim_right = side(lo_src, -1, lambda s: me + s)
    return rim_left, rim_right


RIM_FIELDS = ("pid", "pos", "vel", "mass", "alpha", "h")


def build_cols(key_own, p_own: Particles, rim_l, rim_r, cfg: SimConfig,
               origin, cell_size, h_pad: float):
    """Local column set + window grid for the own row groups.

    Returns (p_cols, grid, rim_short): p_cols is the (key, pid)-sorted
    [nloc + 2 halo] column particle set (rho/P/cs/omega zeroed — attach
    them with `attach_density`); grid is a SortedGrid whose key is the
    column keys and whose starts/ends are the OWN row groups' stencil
    windows into the columns (ops.sorted_grid's machinery, locally);
    rim_short counts own rows whose stencil outreached a truncated rim.
    """
    from ..ops.sorted_grid import SortedGrid, window_ranks

    nloc = p_own.capacity
    wg = cfg.window_group
    dtype = p_own.pos.dtype

    def cat(f):
        return jnp.concatenate([rim_l[f], getattr(p_own, f), rim_r[f]],
                               axis=0)

    key_c = jnp.concatenate([rim_l["key"], key_own, rim_r["key"]])
    ops = [key_c, cat("pid")]
    pos_c, vel_c = cat("pos"), cat("vel")
    ops += [pos_c[:, k] for k in range(3)]
    ops += [vel_c[:, k] for k in range(3)]
    ops += [cat("mass"), cat("alpha"), cat("h")]
    out = jax.lax.sort(ops, num_keys=2, is_stable=False)
    key_cs = out[0]
    nc = key_cs.shape[0]
    zero = jnp.zeros((nc,), dtype)
    alive_c = key_cs != SENTINEL_KEY
    p_cols = _like(p_own, nc).replace(
        pid=out[1],
        pos=jnp.stack(out[2:5], axis=-1), vel=jnp.stack(out[5:8], axis=-1),
        # dead-slot invariant (state.Particles.zeros): h=1, never 0 — a
        # zero h in a gathered column lane NaNs kernel_w_dw even fully
        # masked (0 * NaN), and the edge devices' missing-source rims
        # arrive as ppermute zeros.
        mass=out[8], alpha=out[9], h=jnp.where(alive_c, out[10], 1.0),
        alive=alive_c,
        u=zero, rho=zero, pressure=zero, cs=zero, du=zero, dalpha=zero,
        omega=jnp.ones((nc,), dtype), acc=jnp.zeros((nc, 3), dtype))
    if p_cols.u_c is not None:
        p_cols = p_cols.replace(u_c=jnp.zeros((nc,), dtype))

    # Own row groups' stencil windows into the local columns — the same
    # construction as sort_particles', searched over the column keys.
    G = nloc // wg
    kmin = key_own.reshape(G, wg)[:, 0]
    kmax = key_own.reshape(G, wg)[:, -1]
    first_dead = jnp.sum(key_cs != SENTINEL_KEY).astype(jnp.int32)
    offs = jnp.asarray(PLANE_OFFSETS, jnp.int32)
    lo = kmin[:, None] + offs[None, :] - 1
    hi = kmax[:, None] + offs[None, :] + 1
    starts, ends = window_ranks(key_cs, lo, hi)
    starts = starts.reshape(G, 9)
    ends = jnp.maximum(jnp.minimum(ends.reshape(G, 9), first_dead), starts)
    reach = (starts // LANES) * LANES + cfg.window_blocks * LANES
    n_over = jnp.sum(jnp.maximum(ends - reach, 0)).astype(jnp.int32)

    # n_clamped: the quantile-cell reach clamp, counted on own rows only
    # (mirrors sort_particles; pos_over is irrelevant here — the origin is
    # the global live minimum, and WINDOW overflow is caught by the key).
    reach_over = p_own.alive & (2.0 * p_own.h * h_pad > cell_size)
    n_clamped = jnp.sum(reach_over).astype(jnp.int32)

    rim_short = rim_short_count(
        key_own, rim_l, rim_r,
        key_own - (KX + KY + 1), key_own + (KX + KY + 1))

    grid = SortedGrid(key=key_cs, starts=starts, ends=ends, origin=origin,
                      cell_size=cell_size, n_window_overflow=n_over,
                      n_clamped=n_clamped)
    return p_cols, grid, rim_short


def attach_density(key_own, p_own: Particles, p_cols: Particles,
                   axis_name: str, cfg: SimConfig):
    """Rim-exchange the freshly computed density fields (rho, P, cs,
    omega) and attach them to the sorted columns.

    The attach sort's operands carry the identical (key, pid) multiset as
    build_cols' column sort (same halo/hops slices, same masking), and
    (key, pid) is a total order over live rows, so the permutation is
    reproduced exactly; dead rows may permute among themselves, but their
    values are never read (SENTINEL keys fail every stencil range test).
    """
    fields = ("pid", "rho", "pressure", "cs", "omega")
    rim_l, rim_r = exchange_rim(key_own, p_own, axis_name, cfg.halo_rows,
                                fields=fields, hops=cfg.halo_hops)

    def cat(f):
        return jnp.concatenate([rim_l[f], getattr(p_own, f), rim_r[f]],
                               axis=0)

    key_c = jnp.concatenate([rim_l["key"], key_own, rim_r["key"]])
    out = jax.lax.sort(
        [key_c, cat("pid"), cat("rho"), cat("pressure"), cat("cs"),
         cat("omega")], num_keys=2, is_stable=False)
    return p_cols.replace(rho=out[2], pressure=out[3], cs=out[4],
                          omega=out[5])


def rim_short_count(key_rows, rim_left, rim_right, reach_lo, reach_hi):
    """Count own rows whose stencil key range outreached a truncated rim.

    reach_lo/reach_hi: per-row lowest/highest candidate key the stencil
    can touch.  A row is under-covered when its reach extends past the
    farthest rim key AND the rim was truncated (more rows existed beyond).
    """
    live = key_rows != SENTINEL_KEY
    left_live = rim_left["key"] != SENTINEL_KEY
    right_live = rim_right["key"] != SENTINEL_KEY
    # farthest (smallest) key the left rim delivered; +inf-like when empty
    left_min = jnp.min(jnp.where(left_live, rim_left["key"],
                                 SENTINEL_KEY))
    right_max = jnp.max(jnp.where(right_live, rim_right["key"], -1))
    short_l = rim_left["truncated"] & live & (reach_lo < left_min)
    short_r = rim_right["truncated"] & live & (reach_hi > right_max)
    return jnp.sum(short_l | short_r).astype(jnp.int32)


__all__ = ["DecompAux", "global_geometry", "redistribute", "exchange_rim",
           "build_cols", "attach_density", "rim_short_count", "KX", "KY"]

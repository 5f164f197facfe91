"""Pallas TPU kernels for the SPH pair passes (density + forces).

Same sorted-window neighbour structure as ops.sorted_grid, but the candidate
windows are fetched by explicit DMA at their *exact* (unaligned) extents:
the XLA path must round windows to 128-aligned block rows (slice-gather fast
path), padding every row's candidate set to >= 2304 lanes; the Pallas kernel
DMAs [fields, W] windows at arbitrary starts, so W only has to cover
`rows_per_program + 2 x occupancy` — typically 3-4x fewer wasted VPU lanes.

Data layout: pair fields are packed [F, N] (field-major, particle minor) in
sorted order, so each stencil window is one 2-D strided DMA.  The int32 cell
key rides in an f32 lane via bitcast.

Two-level, variable-depth windows (B = sorted_block rows per program,
S = B/window_group window groups per program):

  * DMA granularity is the *program*: 9 fetch windows of WB =
    cfg.pallas_fetch_window lanes each, sized to cover the whole program's
    key span, land in VMEM scratch [9, F, WB] — 10 DMA descriptors per
    program (descriptor issue cost is a first-order term at ~100 B/descr).
  * compute granularity is the *window group*: each group/offset computes
    on one or more 128-aligned W = cfg.pallas_window slices of the program
    fetch.  Slice 0 (3-bit packed sub-offset) runs unconditionally in the
    register-accumulating main pass; the 2-bit packed slice count sends
    heavy-tail groups (SFC column jumps, clustered cells) through extra
    pl.when-guarded slices that read-modify-write the output VMEM —
    adaptive depth, so the common case stays at W lanes while coverage
    extends to the whole fetch (window_plan).
  * per slice: [window_group, W] pair math with the exact per-row
    key-range mask (ops.sorted_grid disjointness argument).

Scalar prefetch carries per-program starts [G_p * 9] plus two packed
int32s per group (sub-offsets, slice counts) — ~550 KB of SMEM at
N = 1e6 (the per-group starts layout overflowed the 1 MB SMEM there).

Exact-start mode (cfg.pallas_exact_windows): compute slices are always 128
lanes anchored at each group window's TRUE start — the kernel reads the
aligned [fields, 256] block below the start and lane-rotates it
(pltpu.roll, a cheap VPU permute) so lane 0 is the first real candidate.
This removes both the 128-lane alignment slop and the W-granularity
padding: aligned windows burn ~256 lanes/offset against true spans of
p50 72 / p99 110 (wg=32, docs/ROUND3.md), exact windows cover p99 in one
128-lane slice — ~2x fewer pair lanes at the same coverage.  The plan
packs (11-bit start offset, 3-bit slice count) per offset, two offsets
per int32, five words per group (window_plan_exact; ~950 KB SMEM at
N = 1e6 with wg=32, ~620 KB at wg=64).

Correctness contract: candidates beyond a group's planned slices are
*dropped*; the caller checks `window_overflow(grid, cfg)` == 0 (tests
assert it) and can raise cfg.pallas_window / cfg.pallas_fetch_window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..state import Particles
from . import pairs
from .kernels import dw_shape, w_shape
from .sorted_grid import LANES, PLANE_OFFSETS, SortedGrid
from ..utils.units import PI

# Packed field indices (density uses the first DF, forces all FF).
_IX, _IY, _IZ, _IM, _IH, _IKEY = 0, 1, 2, 3, 4, 5
DF = 8  # density pack: x y z m h key pad pad
_IRS, _IRCUT = 6, 7  # gravity pack reuses the pads for (r_s, r_cut)
_IVX, _IVY, _IVZ, _IP, _IRHO, _IOM, _ICS, _IAL = 6, 7, 8, 9, 10, 11, 12, 13
_IFRS, _IFRC = 14, 15  # fused-gravity split scalars in the force pack pads
FF = 16  # force pack: x y z m h key vx vy vz P rho om cs al (r_s) (r_cut)


def _key_to_float(key, dtype):
    """Cell key as a float lane of the pack: int32 <-> f32 bitcast, or
    widened int64 <-> f64 for float64 validation runs (interpret mode)."""
    if jnp.dtype(dtype) == jnp.float64:
        return jax.lax.bitcast_convert_type(key.astype(jnp.int64),
                                            jnp.float64)
    return jax.lax.bitcast_convert_type(key, jnp.float32)


def _float_to_key(kf):
    """Inverse of _key_to_float (int64 keys compare fine vs int32 refs)."""
    if kf.dtype == jnp.float64:
        return jax.lax.bitcast_convert_type(kf, jnp.int64)
    return jax.lax.bitcast_convert_type(kf, jnp.int32)


def _pack(p: Particles, key: jax.Array, n_fields: int) -> jax.Array:
    """[F, N] field-major pack of the sorted particle fields."""
    key_f = _key_to_float(key, p.pos.dtype)
    cols = [p.pos[:, 0], p.pos[:, 1], p.pos[:, 2],
            jnp.where(p.alive, p.mass, 0.0), p.h, key_f]
    if n_fields == FF:
        cols += [p.vel[:, 0], p.vel[:, 1], p.vel[:, 2],
                 p.pressure, p.rho, p.omega, p.cs, p.alpha]
    while len(cols) < n_fields:
        cols.append(jnp.zeros_like(cols[0]))
    return jnp.stack(cols, axis=0)


def _effective_windows(cfg: SimConfig, n_cols: int):
    """(W, WB): compute window / fetch window clamped to the array size."""
    WB = min(cfg.pallas_fetch_window, n_cols)
    W = min(cfg.pallas_window, WB)
    return W, WB


def window_plan(grid: SortedGrid, cfg: SimConfig):
    """Two-level, variable-depth window plan for the kernels.

    Returns (prog_starts [G_p, 9] int32, suboff_packed [G] int32,
    nslice_packed [G] int32, covered_ends [G, 9] int32):
      * prog_starts — 128-aligned per-program fetch starts (DMA bounds
        clamped to n - WB); Mosaic requires lane-dim DMA slice starts to be
        128-divisible, so all starts round down to LANES and the windows
        absorb the <= 127-lane slop,
      * suboff_packed — per group, 9 x 3-bit sub-offsets (in 128-lane
        units) of the group's first compute slice inside its program's
        fetch,
      * nslice_packed — per group, 9 x 3-bit (n_slices - 1): how many
        W-wide compute slices this group/offset needs to cover its
        candidate range, bounded by what fits in the fetch (up to 8).  The
        kernels run slice 0 unconditionally and slices 1.. under `pl.when`,
        so the heavy tail of window extents (SFC column jumps, clustered
        cells, a condensing collapse core) costs VPU time only where it
        occurs instead of fattening W for every group,
      * covered_ends — eff + n_sl * W, for overflow accounting: candidates
        beyond this are dropped (counted by window_overflow).
    """
    n = grid.key.shape[0]
    S = cfg.sorted_block // cfg.window_group
    W, WB = _effective_windows(cfg, n)
    aligned = (grid.starts // LANES) * LANES                 # [G, 9]
    G = aligned.shape[0]
    G_p = G // S
    a3 = aligned.reshape(G_p, S, 9)
    prog = jnp.minimum(a3.min(axis=1), max(n - WB, 0))       # [G_p, 9]
    # first-slice start: 3-bit packed, and slice 0 must fit in the fetch;
    # a clipped-down start only widens coverage leftward (harmless)
    sub = jnp.clip((a3 - prog[:, None, :]) // LANES, 0,
                   min((WB - W) // LANES, 7))
    eff = (prog[:, None, :] + sub * LANES).reshape(G, 9)
    # slices this group needs, bounded by the fetch it can reach
    need = -((eff - grid.ends) // W)                         # ceil div
    fit = (WB - sub.reshape(G, 9) * LANES) // W
    nsl = jnp.clip(need, 1, jnp.minimum(fit, 8))
    covered = eff + nsl * W
    lanes9 = jnp.arange(9, dtype=jnp.int32)
    sub_packed = jnp.sum(sub << (3 * lanes9), axis=-1,
                         dtype=jnp.int32).reshape(G)
    nsl_packed = jnp.sum((nsl - 1) << (3 * lanes9), axis=-1,
                         dtype=jnp.int32).reshape(G)
    return prog, sub_packed, nsl_packed, covered


def window_plan_exact(grid: SortedGrid, cfg: SimConfig):
    """Exact-start window plan (cfg.pallas_exact_windows).

    Compute slices are always 128 lanes, anchored at each group window's
    TRUE start: the kernel reads the aligned [fields, 256] block below the
    start and lane-rotates it by the start's 128-remainder (pltpu.roll), so
    neither the DMA-alignment slop nor the W-granularity padding costs VPU
    lanes.  Aligned windows burn ~256 lanes/offset against true spans of
    p50 72 / p99 110 (wg=32 ball geometry, docs/ROUND3.md) — exact windows
    cover p99 in ONE 128-lane slice.

    Returns (prog_starts [G_p, 9], (pk0..pk4) [G] each, covered_ends
    [G, 9]).  Encoding: 14 bits per offset, two offsets per int32 word
    (offset o lives in word o//2, half o%2):
      * bits 0-10  — s_rel, the window's true start relative to the
        program fetch (clipped to the encodable/readable range; clipping
        moves coverage leftward only, and anything past the covered end is
        counted by window_overflow, never silent).  The kernel derives
        base = min(s_rel >> 7, (WB-256)//128) * 128 (the 128-aligned
        256-lane read) and shift = s_rel - base (in [0, 128]) itself.
      * bits 11-13 — n_slices - 1; slice k covers
        [start + k*128, start + (k+1)*128) via the read at base + k*128
        with the same shift.
    """
    n = grid.key.shape[0]
    S = cfg.sorted_block // cfg.window_group
    WB = min(cfg.pallas_fetch_window, n)
    if WB < 2 * LANES:
        raise ValueError(
            f"pallas_exact_windows needs pallas_fetch_window >= 256 "
            f"(rotated reads are 256 lanes); got effective {WB}")
    aligned = (grid.starts // LANES) * LANES                 # [G, 9]
    G = aligned.shape[0]
    G_p = G // S
    a3 = aligned.reshape(G_p, S, 9)
    prog = jnp.minimum(a3.min(axis=1), max(n - WB, 0))       # [G_p, 9]
    s_rel = grid.starts.reshape(G_p, S, 9).astype(jnp.int32) \
        - prog[:, None, :]
    # Slice k re-bases its 256-lane read per k (decode: base_k =
    # min(rel_k // 128, (WB-256)//128), shift <= 128) and the at-most-one
    # slice whose logical start lands in (WB-128, WB) clamps its read to
    # WB-128 and masks lanes below its logical start — so coverage reaches
    # WB exactly.  The 11-bit start field caps at 2047.
    s_cap = min(WB - LANES, 2047)
    s_rel = jnp.clip(s_rel, 0, s_cap).reshape(G, 9)
    eff = prog.reshape(G_p, 1, 9).repeat(S, 1).reshape(G, 9) + s_rel
    need = -((eff - grid.ends) // LANES)                     # ceil div
    fit = -((s_rel - WB) // LANES)    # slices with logical start < WB
    nsl = jnp.clip(need, 1, jnp.minimum(fit, 8))
    covered = jnp.minimum(eff + nsl * LANES,
                          prog.reshape(G_p, 1, 9).repeat(S, 1)
                          .reshape(G, 9) + WB)
    v14 = s_rel + ((nsl - 1) << 11)                          # [G, 9]
    packs = []
    for j in range(4):
        packs.append(jnp.sum(
            v14[:, 2 * j:2 * j + 2]
            << (14 * jnp.arange(2, dtype=jnp.int32)),
            axis=-1, dtype=jnp.int32))
    packs.append(v14[:, 8])
    return prog, tuple(packs), covered


def _plan(grid: SortedGrid, cfg: SimConfig):
    """(prog_flat [G_p*9], gvecs tuple of per-group [G] scalar arrays) for
    the configured window mode — the kernels' scalar-prefetch operands."""
    if cfg.pallas_exact_windows:
        prog, gvecs, _ = window_plan_exact(grid, cfg)
    else:
        prog, suboff, nsl, _ = window_plan(grid, cfg)
        gvecs = (suboff, nsl)
    return prog.reshape(-1), gvecs


def window_overflow(grid: SortedGrid, cfg: SimConfig) -> jax.Array:
    """Candidates beyond the planned slices (must be 0 for exactness)."""
    if cfg.pallas_exact_windows:
        _, _, covered = window_plan_exact(grid, cfg)
    else:
        _, _, _, covered = window_plan(grid, cfg)
    return jnp.sum(jnp.maximum(grid.ends - covered, 0))


def _issue_window_dmas(starts_ref, rows_hbm, cols_hbm, rows_scr, win_scr,
                       rsems, wsems, prog, slot, window_big: int, b: int,
                       nf: int):
    """Start the rows + 9 program-fetch-window copies for `prog` into `slot`.

    Rows come from `rows_hbm` (this device's row pack — a slice of the
    global sorted order under sharding, the whole pack single-chip);
    windows always come from the full `cols_hbm` pack.  `nf` is the field
    count the kernel consumes — a 16-row shared pack feeds the 8-field
    kernels by DMAing only its first 8 rows.
    """
    pltpu.make_async_copy(
        rows_hbm.at[:nf, pl.ds(pl.multiple_of(prog * b, 128), b)],
        rows_scr.at[slot], rsems.at[slot]).start()
    for o in range(9):
        st = pl.multiple_of(starts_ref[prog * 9 + o], 128)
        pltpu.make_async_copy(
            cols_hbm.at[:nf, pl.ds(st, window_big)], win_scr.at[slot, o],
            wsems.at[slot, o]).start()


def _wait_window_dmas(starts_ref, rows_hbm, cols_hbm, rows_scr, win_scr,
                      rsems, wsems, prog, slot, window_big: int, b: int,
                      nf: int):
    pltpu.make_async_copy(
        rows_hbm.at[:nf, pl.ds(pl.multiple_of(prog * b, 128), b)],
        rows_scr.at[slot], rsems.at[slot]).wait()
    for o in range(9):
        st = pl.multiple_of(starts_ref[prog * 9 + o], 128)
        pltpu.make_async_copy(
            cols_hbm.at[:nf, pl.ds(st, window_big)], win_scr.at[slot, o],
            wsems.at[slot, o]).wait()


def _decode_plan(grefs, exact: bool, window_big: int, window: int):
    """decode(gidx, o, k=0) -> (base_lanes, shift_or_None, nsl_minus_1,
    lane_lo_or_None): slice k's column read position for the kernel's
    scalar plan refs — aligned 3-bit sub-offsets + 3-bit slice counts
    (window_plan) or exact-start 14-bit packs (window_plan_exact).

    Exact slices re-base per k: base = min(rel_eff // 128, (WB-256)//128)
    with rel_eff = min(s_rel + k*128, WB-128), keeping the rotate shift in
    [0, 128].  When the logical start exceeds the readable max the read
    clamps down and lane_lo = rel - rel_eff masks the already-covered
    lanes below the logical start (at most one slice per window clamps —
    starts step by 128 — so no pair is double counted)."""
    if exact:
        base_max = (window_big - 2 * LANES) // LANES
        rel_max = window_big - LANES

        def decode(gidx, o, k=0):
            v = (grefs[o // 2][gidx] >> (14 * (o % 2))) & 0x3FFF
            rel = (v & 2047) + k * LANES
            rel_eff = jnp.minimum(rel, rel_max)
            base = jnp.minimum(rel_eff >> 7, base_max) * LANES
            lane_lo = (rel - rel_eff) if k else None
            return base, rel_eff - base, v >> 11, lane_lo
    else:
        def decode(gidx, o, k=0):
            base = ((grefs[0][gidx] >> (3 * o)) & 7) * LANES + k * window
            return base, None, (grefs[1][gidx] >> (3 * o)) & 7, None
    return decode


def _col_reader(win_scr, slot, o, base, sh, window: int):
    """col(idx) -> [window] column-field slice.  Aligned mode (sh None)
    reads per-field at the 128-aligned base; exact mode reads the whole
    [fields, 256] block once, lane-rotates it so lane 0 is the window's
    TRUE start, and serves fields from the rotated block."""
    scratch = win_scr.at[slot, o]
    if sh is None:
        return lambda idx: scratch[idx, pl.ds(base, window)]
    blk = scratch[:, pl.ds(pl.multiple_of(base, 128), 2 * LANES)]
    blk = pltpu.roll(blk, 2 * LANES - sh, 1)
    return lambda idx: blk[idx, :window]


def _max_slices(window: int, window_big: int, exact: bool) -> int:
    if exact:
        return min((window_big - LANES) // LANES + 1, 8)
    return min(window_big // window, 8)


def _gate_plan(refs, gated: bool):
    """(grefs, blk, blk_next, first_blk, issue0, issue_next, run, hbm_refs):
    the shared program-indirection prologue of the three pair kernels.

    Ungated (the production single-rate path): program i owns row block i
    and every program runs — blk == i, run == None.  Gated (block
    timesteps, blockstep.py): the LAST TWO scalar-prefetch refs are a
    [G] worklist of row-block ids (active blocks compacted to the front in
    ascending order) and its [1] count; program i owns block worklist[i]
    and only the first `count` programs do any DMA or compute — the
    substep's cost scales with the ACTIVE blocks, not N.  Output blocks not
    on the worklist are left unwritten (undefined) — callers must merge
    results through the activity mask.
    """
    starts_ref = refs[0]
    ns = len(refs) - 9
    i = pl.program_id(0)
    ng = pl.num_programs(0)
    if gated:
        grefs = refs[1:ns - 2]
        work_ref, nwork_ref = refs[ns - 2], refs[ns - 1]
        cnt = nwork_ref[0]
        blk = work_ref[i]
        blk_next = work_ref[jnp.minimum(i + 1, ng - 1)]
        first = work_ref[0]
        issue0 = (i == 0) & (cnt > 0)
        issue_next = i + 1 < cnt
        run = i < cnt
    else:
        grefs = refs[1:ns]
        blk, blk_next, first = i, i + 1, 0
        issue0 = i == 0
        issue_next = i + 1 < ng
        run = None
    return starts_ref, grefs, blk, blk_next, first, issue0, issue_next, run


def _density_kernel(*refs, window: int, window_big: int, b: int, s_sub: int,
                    exact: bool, gated: bool, fixed_h: bool):
    (starts_ref, grefs, blk, blk_next, first, issue0, issue_next,
     run) = _gate_plan(refs, gated)
    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    decode = _decode_plan(grefs, exact, window_big, window)
    # Double-buffered across grid programs: program i issues i+1's DMAs
    # before computing on i's slot, hiding the (10 copies) DMA latency.
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))
    args = (starts_ref, rows_hbm, cols_hbm, rows_scr, win_scr, rsems, wsems)

    @pl.when(issue0)
    def _():
        _issue_window_dmas(*args, first, 0, window_big=window_big, b=b,
                           nf=DF)

    @pl.when(issue_next)
    def _():
        _issue_window_dmas(*args, blk_next, nslot, window_big=window_big,
                           b=b, nf=DF)

    if run is not None:
        pl.when(run)(lambda: _density_body(
            args, blk, slot, refs, decode, window=window,
            window_big=window_big, b=b, s_sub=s_sub, exact=exact,
            fixed_h=fixed_h))
    else:
        _density_body(args, blk, slot, refs, decode, window=window,
                      window_big=window_big, b=b, s_sub=s_sub, exact=exact,
                      fixed_h=fixed_h)


def _density_body(args, blk, slot, refs, decode, *, window: int,
                  window_big: int, b: int, s_sub: int, exact: bool,
                  fixed_h: bool):
    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    _wait_window_dmas(*args, blk, slot, window_big=window_big, b=b, nf=DF)
    rows_ref = rows_scr.at[slot]
    wg = b // s_sub
    max_slices = _max_slices(window, window_big, exact)

    def row_fields(s):
        sub = slice(s * wg, (s + 1) * wg)
        xi = rows_ref[_IX, sub]
        yi = rows_ref[_IY, sub]
        zi = rows_ref[_IZ, sub]
        hi = rows_ref[_IH, sub]
        ki = _float_to_key(rows_ref[_IKEY, sub])
        return xi, yi, zi, hi, ki

    def tile(fields, o, base, sh, lane_lo=None):
        """[wg] (rho, omega) contributions of one W-slice window."""
        xi, yi, zi, hi, ki = fields
        inv_hi = 1.0 / hi
        inv_pi_h3 = (1.0 / PI) * inv_hi * inv_hi * inv_hi
        col = _col_reader(win_scr, slot, o, base, sh, window)
        xw = col(_IX)
        yw = col(_IY)
        zw = col(_IZ)
        mw = col(_IM)
        kw = _float_to_key(col(_IKEY))

        mask = ((kw[None, :] >= ki[:, None] + (PLANE_OFFSETS[o] - 1))
                & (kw[None, :] <= ki[:, None] + (PLANE_OFFSETS[o] + 1)))
        if lane_lo is not None:
            # the one clamped slice of a deep window: lanes below its
            # logical start were covered by the previous slice
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
            mask = mask & (lane >= lane_lo)
        dxx = xi[:, None] - xw[None, :]
        dxy = yi[:, None] - yw[None, :]
        dxz = zi[:, None] - zw[None, :]
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        # rsqrt + mul instead of sqrt (and q via per-row 1/h): the VPU
        # pair loop is compute-bound, transcendental slots count
        r = r2 * jax.lax.rsqrt(jnp.maximum(r2, 1.0e-12))
        q = r * inv_hi[:, None]
        w = w_shape(q)
        # self excluded here, added analytically in finalize_density
        # (pairs.density_sums explains why: windows may truncate, the
        # self term must survive regardless)
        m = jnp.where(mask & (r2 > 0.0), mw[None, :], 0.0)
        rho = jnp.sum(m * w, axis=1) * inv_pi_h3
        if fixed_h:
            # Omega == 1 with fixed h (no grad-h correction,
            # pairs.py:23): skip the dW/dh sum — ~40% of this tile's
            # VPU ops (dw_shape + the second masked reduction).
            return rho, None
        # dW/dh = -(3 W + r dW/dr)/h; dW/dr = dw_shape/(pi h^4)
        dwdh_shape = -(3.0 * w + q * dw_shape(q))
        om = jnp.sum(m * dwdh_shape, axis=1) * inv_pi_h3 * inv_hi
        return rho, om

    # pass 1: every group/offset's first slice, register-accumulated
    rho_subs = []
    om_subs = []
    for s in range(s_sub):
        fields = row_fields(s)
        rho = jnp.zeros((wg,), rows_ref.dtype)
        om = jnp.zeros((wg,), rows_ref.dtype)
        for o in range(9):
            base, sh, _, _ = decode(blk * s_sub + s, o)
            crho, com = tile(fields, o, pl.multiple_of(base, 128), sh)
            rho = rho + crho
            if com is not None:
                om = om + com
        rho_subs.append(rho)
        om_subs.append(om)

    out_vmem[0, :] = jnp.concatenate(rho_subs)
    out_vmem[1, :] = jnp.concatenate(om_subs)
    for _pad_row in range(2, 8):
        out_vmem[_pad_row, :] = jnp.zeros((b,), rows_ref.dtype)

    # pass 2: extra slices for the heavy-tail groups only (pl.when skips
    # the tile at runtime when the group's candidates fit in slice 0)
    for s in range(s_sub):
        if max_slices == 1:
            break
        fields = row_fields(s)
        sl = slice(s * wg, (s + 1) * wg)
        for o in range(9):
            _, _, nsl_m1, _ = decode(blk * s_sub + s, o)
            for k in range(1, max_slices):
                @pl.when(k <= nsl_m1)
                def _(_o=o, _k=k, _g=blk * s_sub + s, _sl=sl,
                      _fields=fields):
                    base_k, sh_k, _, lo_k = decode(_g, _o, _k)
                    crho, com = tile(_fields, _o,
                                     pl.multiple_of(base_k, 128), sh_k,
                                     lane_lo=lo_k)
                    out_vmem[0, _sl] = out_vmem[0, _sl] + crho
                    if com is not None:
                        out_vmem[1, _sl] = out_vmem[1, _sl] + com

    ocopy = pltpu.make_async_copy(
        out_vmem, out_hbm.at[:, pl.ds(pl.multiple_of(blk * b, 128), b)],
        osem)
    ocopy.start()
    ocopy.wait()


def _row_slices(p: Particles, cfg: SimConfig, grid: SortedGrid, rows,
                n_fields: int):
    """(packed_rows, packed_cols, prog_starts, gvecs, n_rows) for a kernel
    launch — gvecs is the per-group scalar-plan tuple (mode-dependent; see
    _plan).

    rows=None: rows are the whole sorted set.  rows=(p_rows, offset) with
    a scalar offset: compute sums only for the `p_rows.capacity` sorted
    rows starting at `offset` (traced) — this device's contiguous slice of
    the replicated sorted order under sharding (parallel.sharded).
    rows=(p_rows, key_rows) with a [n_rows] key array: rows are a separate
    set from the columns and grid.starts/ends are already the ROW groups'
    windows into the columns (parallel.decomp.build_cols).
    """
    packed_cols = _pack(p, grid.key, n_fields)
    prog, gvecs = _plan(grid, cfg)
    if rows is None:
        return packed_cols, packed_cols, prog, gvecs, p.capacity
    p_rows, second = rows
    if jnp.ndim(second) == 1:        # decomp: (p_rows, key_rows)
        packed_rows = _pack(p_rows, second, n_fields)
        return packed_rows, packed_cols, prog, gvecs, p_rows.capacity
    offset = second
    n_rows = p_rows.capacity
    B, wg = cfg.sorted_block, cfg.window_group
    key_rows = jax.lax.dynamic_slice(grid.key, (offset,), (n_rows,))
    packed_rows = _pack(p_rows, key_rows, n_fields)
    prog_local = jax.lax.dynamic_slice(
        prog, (offset // B * 9,), (n_rows // B * 9,))
    gvecs_local = tuple(
        jax.lax.dynamic_slice(g, (offset // wg,), (n_rows // wg,))
        for g in gvecs)
    return packed_rows, packed_cols, prog_local, gvecs_local, n_rows


def pallas_density_sums(p: Particles, cfg: SimConfig, grid: SortedGrid,
                        interpret: bool = False, rows=None, prebuilt=None,
                        active=None):
    """(rho, omega_raw) for the sorted particles via the Pallas kernel.

    With rows=(p_rows, offset), sums are computed for that contiguous slice
    of the sorted order only (columns stay the full set `p`).  `prebuilt`
    short-circuits pack construction: (packed_rows, packed_cols, prog,
    suboff, nsl, n_rows) from a previous launch this step (packs may carry
    more than DF rows — the kernel DMAs only the first DF).  `active` =
    (worklist [G] int32, count [1] int32) gates the kernel to the listed
    row blocks (block timesteps, blockstep.py); rows outside the worklist
    come back UNDEFINED and the caller must merge through its activity
    mask."""
    n = p.capacity
    B = cfg.sorted_block
    S = B // cfg.window_group
    W, WB = _effective_windows(cfg, n)
    if cfg.pallas_exact_windows:
        W = LANES
    packed_rows, packed_cols, prog, gvecs, n_rows = (
        prebuilt if prebuilt is not None
        else _row_slices(p, cfg, grid, rows, DF))
    G = n_rows // B
    gate = () if active is None else tuple(active)
    # scalar operands are 1-D: SMEM pads the minor dim of 2-D scalar
    # operands to 128 lanes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + len(gvecs) + len(gate),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, DF, B), packed_cols.dtype),
            pltpu.VMEM((2, 9, DF, WB), packed_cols.dtype),
            pltpu.VMEM((8, B), packed_cols.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_density_kernel, window=W, window_big=WB, b=B,
                          s_sub=S, exact=cfg.pallas_exact_windows,
                          gated=active is not None,
                          fixed_h=cfg.fixed_h is not None),
        out_shape=jax.ShapeDtypeStruct((8, n_rows), packed_cols.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(prog, *gvecs, *gate, packed_rows, packed_cols)
    return out[0], out[1]


def _force_kernel(*refs, window: int, window_big: int, b: int, s_sub: int,
                  av_eps: float, beta_factor: float, exact: bool,
                  fuse_grav: bool, gated: bool, fixed_h: bool):
    """SPH pressure+AV pair force; with fuse_grav also the short-range
    (TreePM complement) gravity sums over the SAME windows and pair
    geometry — valid when r_cut <= the SPH cell size, so the +-1-cell
    stencil bounds every gravity pair (integrate guards this; violations
    are counted loudly).  Reuses dxx/r2/inv_r from the SPH math: ~14 extra
    VPU ops per lane instead of a second sort + kernel + window pass.
    The traced split scalars ride the rows pack's two pad fields
    (_IFRS/_IFRC), exactly like the standalone gravity kernel's."""
    (starts_ref, grefs, blk, blk_next, first, issue0, issue_next,
     run) = _gate_plan(refs, gated)
    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    decode = _decode_plan(grefs, exact, window_big, window)
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))
    args = (starts_ref, rows_hbm, cols_hbm, rows_scr, win_scr, rsems, wsems)

    @pl.when(issue0)
    def _():
        _issue_window_dmas(*args, first, 0, window_big=window_big, b=b,
                           nf=FF)

    @pl.when(issue_next)
    def _():
        _issue_window_dmas(*args, blk_next, nslot, window_big=window_big,
                           b=b, nf=FF)

    kw = dict(window=window, window_big=window_big, b=b, s_sub=s_sub,
              av_eps=av_eps, beta_factor=beta_factor, exact=exact,
              fuse_grav=fuse_grav, fixed_h=fixed_h)
    if run is not None:
        pl.when(run)(lambda: _force_body(args, blk, slot, refs, decode,
                                         **kw))
    else:
        _force_body(args, blk, slot, refs, decode, **kw)


def _force_body(args, blk, slot, refs, decode, *, window: int,
                window_big: int, b: int, s_sub: int, av_eps: float,
                beta_factor: float, exact: bool, fuse_grav: bool,
                fixed_h: bool):
    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    _wait_window_dmas(*args, blk, slot, window_big=window_big, b=b, nf=FF)
    rows_ref = rows_scr.at[slot]
    wg = b // s_sub
    max_slices = _max_slices(window, window_big, exact)
    nc = 8 if fuse_grav else 5  # output components per row

    if fuse_grav:
        from .kernels import grav_shape
        from .pm_gravity import erf_approx
        from ..utils.units import G
        r_s = rows_scr[slot, _IFRS, 0]
        r_cut2 = rows_scr[slot, _IFRC, 0]
        r_cut2 = r_cut2 * r_cut2
        inv_2rs = 0.5 / r_s
        inv_rs_sqrtpi = 1.0 / (r_s * jnp.sqrt(r_s.dtype.type(PI)))

    def row_fields(s):
        sub = slice(s * wg, (s + 1) * wg)

        def row(idx, _sub=sub):
            return rows_ref[idx, _sub]

        ki = _float_to_key(rows_ref[_IKEY, sub])
        return (row(_IX), row(_IY), row(_IZ), row(_IVX), row(_IVY),
                row(_IVZ), row(_IH), row(_IP), row(_IRHO), row(_IOM),
                row(_ICS), row(_IAL), ki)

    def tile(fields, o, base, sh, lane_lo=None):
        """[wg] (ax, ay, az, du, alpha_raw) contributions of one slice."""
        (xi, yi, zi, vxi, vyi, vzi, hi, pi_, rhoi, omi, csi, ali,
         ki) = fields
        pterm_i = pi_ / (omi * rhoi * rhoi)
        inv_hi = 1.0 / hi
        inv_pi_hi4 = (1.0 / PI) * inv_hi * inv_hi * inv_hi * inv_hi

        col = _col_reader(win_scr, slot, o, base, sh, window)

        xw, yw, zw = col(_IX), col(_IY), col(_IZ)
        mw = col(_IM)
        vxw, vyw, vzw = col(_IVX), col(_IVY), col(_IVZ)
        pw, rhow, omw = col(_IP), col(_IRHO), col(_IOM)
        csw, alw = col(_ICS), col(_IAL)
        kw = _float_to_key(col(_IKEY))

        # per-column ([W]-shaped, cheap) reciprocals replace per-pair
        # ([wg, W]) divisions; maximum-guards replace select chains —
        # masked pairs carry m = 0, and every guarded quantity stays
        # finite, so 0 * huge = 0 (never 0 * inf = NaN)
        if not fixed_h:
            hw = col(_IH)
            inv_hw = 1.0 / hw
            inv_pi_hw4 = ((1.0 / PI) * inv_hw * inv_hw) * (inv_hw * inv_hw)
        pterm_j = (pw / jnp.maximum(omw * rhow * rhow, 1.0e-30))[None, :]

        mask = ((kw[None, :] >= ki[:, None] + (PLANE_OFFSETS[o] - 1))
                & (kw[None, :] <= ki[:, None] + (PLANE_OFFSETS[o] + 1)))
        if lane_lo is not None:
            # the one clamped slice of a deep window: lanes below its
            # logical start were covered by the previous slice
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
            mask = mask & (lane >= lane_lo)

        dxx = xi[:, None] - xw[None, :]
        dxy = yi[:, None] - yw[None, :]
        dxz = zi[:, None] - zw[None, :]
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1.0e-12))
        r = r2 * inv_r

        dw_i = dw_shape(r * inv_hi[:, None]) * inv_pi_hi4[:, None]
        if fixed_h:
            # h_i == h_j everywhere: the j-side gradient and the
            # symmetrised mean collapse onto dw_i — one dw_shape eval
            # per pair instead of two (~12% of this tile's VPU ops).
            dw_j = dw_i
            dwbar = dw_i
        else:
            dw_j = dw_shape(r * inv_hw[None, :]) * inv_pi_hw4[None, :]
            dwbar = 0.5 * (dw_i + dw_j)

        vx = vxi[:, None] - vxw[None, :]
        vy = vyi[:, None] - vyw[None, :]
        vz = vzi[:, None] - vzw[None, :]
        vdotr = vx * dxx + vy * dxy + vz * dxz
        vdotr_neg = jnp.minimum(vdotr, 0.0)

        hbar = (hi[:, None] if fixed_h
                else 0.5 * (hi[:, None] + hw[None, :]))
        mu = hbar * vdotr_neg / (r2 + av_eps * hbar * hbar)
        cbar = 0.5 * (csi[:, None] + csw[None, :])
        abar = 0.5 * (ali[:, None] + alw[None, :])
        rhobar = 0.5 * (rhoi[:, None] + rhow[None, :])
        visc = ((-abar * cbar * mu + beta_factor * abar * mu * mu)
                / jnp.maximum(rhobar, 1.0e-30))

        # self-pairs (r == 0) vanish without an explicit r > 0 guard:
        # dw_shape(0) == 0 kills the pressure terms and vdotr == 0
        # kills the viscous/heating terms
        m = jnp.where(mask, mw[None, :], 0.0)
        if fixed_h:  # common dw factor (dw_i == dw_j == dwbar)
            scal = (pterm_i[:, None] + pterm_j + visc) * dw_i
        else:
            scal = pterm_i[:, None] * dw_i + pterm_j * dw_j + visc * dwbar
        coef = -m * scal * inv_r
        vdotgradw = vdotr * inv_r * dwbar
        out = [jnp.sum(coef * dxx, axis=1),
               jnp.sum(coef * dxy, axis=1),
               jnp.sum(coef * dxz, axis=1),
               jnp.sum(m * vdotgradw * (pterm_i[:, None] + 0.5 * visc),
                       axis=1),
               jnp.sum(m * vdotgradw, axis=1)]
        if fuse_grav:
            # complementary short-range gravity on the same pair geometry
            # (ops.pm_gravity._short_factor, receiver-side softening h)
            x = r * inv_2rs
            expmx2 = jnp.exp(-x * x)
            s_mesh = erf_approx(x, expmx2) - r * inv_rs_sqrtpi * expmx2
            gshort = grav_shape(r * inv_hi[:, None]) - s_mesh
            mg = jnp.where(mask & (r2 > 0.0) & (r2 < r_cut2),
                           mw[None, :], 0.0)
            gcoef = (-G) * mg * gshort * (inv_r * inv_r * inv_r)
            out += [jnp.sum(gcoef * dxx, axis=1),
                    jnp.sum(gcoef * dxy, axis=1),
                    jnp.sum(gcoef * dxz, axis=1)]
        return out

    acc_subs = []
    for s in range(s_sub):
        fields = row_fields(s)
        acc = [jnp.zeros((wg,), rows_ref.dtype) for _ in range(nc)]
        for o in range(9):
            base, sh, _, _ = decode(blk * s_sub + s, o)
            contrib = tile(fields, o, pl.multiple_of(base, 128), sh)
            acc = [a + c for a, c in zip(acc, contrib)]
        acc_subs.append(acc)

    for c in range(nc):
        out_vmem[c, :] = jnp.concatenate([t[c] for t in acc_subs])
    for _pad_row in range(nc, 8):
        out_vmem[_pad_row, :] = jnp.zeros((b,), rows_ref.dtype)

    for s in range(s_sub):
        if max_slices == 1:
            break
        fields = row_fields(s)
        sl = slice(s * wg, (s + 1) * wg)
        for o in range(9):
            _, _, nsl_m1, _ = decode(blk * s_sub + s, o)
            for k in range(1, max_slices):
                @pl.when(k <= nsl_m1)
                def _(_o=o, _k=k, _g=blk * s_sub + s, _sl=sl,
                      _fields=fields):
                    base_k, sh_k, _, lo_k = decode(_g, _o, _k)
                    contrib = tile(_fields, _o, pl.multiple_of(base_k, 128),
                                   sh_k, lane_lo=lo_k)
                    for c in range(nc):
                        out_vmem[c, _sl] = out_vmem[c, _sl] + contrib[c]

    ocopy = pltpu.make_async_copy(
        out_vmem, out_hbm.at[:, pl.ds(pl.multiple_of(blk * b, 128), b)],
        osem)
    ocopy.start()
    ocopy.wait()


def pallas_force_sums(p: Particles, cfg: SimConfig, grid: SortedGrid,
                      interpret: bool = False, rows=None, prebuilt=None,
                      grav_split=None, active=None):
    """(ax, ay, az, du, alpha_raw[, gx, gy, gz]) for the sorted particles
    (or the rows=(p_rows, offset) slice of them).  `prebuilt` as in
    pallas_density_sums (must carry all FF rows).  `grav_split` =
    (r_s, r_cut) traced scalars turns on the fused short-range gravity
    sums (cfg.grav_fuse_short; requires r_cut <= the SPH cell size — the
    caller guards and counts violations).  `active` gates row blocks as in
    pallas_density_sums."""
    n = p.capacity
    B = cfg.sorted_block
    S = B // cfg.window_group
    W, WB = _effective_windows(cfg, n)
    if cfg.pallas_exact_windows:
        W = LANES
    packed_rows, packed_cols, prog, gvecs, n_rows = (
        prebuilt if prebuilt is not None
        else _row_slices(p, cfg, grid, rows, FF))
    if grav_split is not None:
        r_s, r_cut = grav_split
        dt = packed_rows.dtype
        packed_rows = (packed_rows
                       .at[_IFRS].set(jnp.asarray(r_s, dt))
                       .at[_IFRC].set(jnp.asarray(r_cut, dt)))
    G = n_rows // B
    gate = () if active is None else tuple(active)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + len(gvecs) + len(gate),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FF, B), packed_cols.dtype),
            pltpu.VMEM((2, 9, FF, WB), packed_cols.dtype),
            pltpu.VMEM((8, B), packed_cols.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_force_kernel, window=W, window_big=WB, b=B,
                          s_sub=S, av_eps=cfg.av_eps,
                          beta_factor=cfg.beta_factor,
                          exact=cfg.pallas_exact_windows,
                          fuse_grav=grav_split is not None,
                          gated=active is not None,
                          fixed_h=cfg.fixed_h is not None),
        out_shape=jax.ShapeDtypeStruct((8, n_rows), packed_cols.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(prog, *gvecs, *gate, packed_rows, packed_cols)
    if grav_split is not None:
        return out[0], out[1], out[2], out[3], out[4], (out[5], out[6],
                                                        out[7])
    return out[0], out[1], out[2], out[3], out[4]


def _grav_kernel(*refs, window: int, window_big: int, b: int, s_sub: int,
                 exact: bool, gated: bool):
    """Short-range (TreePM complement) gravity pair sums.

    Same two-level window structure as the SPH kernels; pair math is the
    softened spline gravity minus the mesh's Gaussian-filtered share
    (ops.pm_gravity._short_factor, the kernel-side twin).  The traced
    scalars r_s / r_cut (the mesh rescales with the particle extent every
    step) ride the two pad fields of the rows pack — Mosaic cannot bitcast
    SMEM scalars.
    """
    (starts_ref, grefs, blk, blk_next, first, issue0, issue_next,
     run) = _gate_plan(refs, gated)
    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    decode = _decode_plan(grefs, exact, window_big, window)
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))
    args = (starts_ref, rows_hbm, cols_hbm, rows_scr, win_scr, rsems, wsems)

    @pl.when(issue0)
    def _():
        _issue_window_dmas(*args, first, 0, window_big=window_big, b=b,
                           nf=DF)

    @pl.when(issue_next)
    def _():
        _issue_window_dmas(*args, blk_next, nslot, window_big=window_big,
                           b=b, nf=DF)

    kw = dict(window=window, window_big=window_big, b=b, s_sub=s_sub,
              exact=exact)
    if run is not None:
        pl.when(run)(lambda: _grav_body(args, blk, slot, refs, decode,
                                        **kw))
    else:
        _grav_body(args, blk, slot, refs, decode, **kw)


def _grav_body(args, blk, slot, refs, decode, *, window: int,
               window_big: int, b: int, s_sub: int, exact: bool):
    from .kernels import grav_shape
    from .pm_gravity import erf_approx
    from ..utils.units import G

    (rows_hbm, cols_hbm, out_hbm, rows_scr, win_scr, out_vmem, rsems,
     wsems, osem) = refs[len(refs) - 9:]
    _wait_window_dmas(*args, blk, slot, window_big=window_big, b=b, nf=DF)
    rows_ref = rows_scr.at[slot]
    wg = b // s_sub
    max_slices = _max_slices(window, window_big, exact)

    r_s = rows_scr[slot, _IRS, 0]
    r_cut2 = rows_scr[slot, _IRCUT, 0]
    r_cut2 = r_cut2 * r_cut2
    inv_2rs = 0.5 / r_s
    inv_rs_sqrtpi = 1.0 / (r_s * jnp.sqrt(r_s.dtype.type(PI)))

    def row_fields(s):
        sub = slice(s * wg, (s + 1) * wg)
        xi = rows_ref[_IX, sub]
        yi = rows_ref[_IY, sub]
        zi = rows_ref[_IZ, sub]
        inv_hi = 1.0 / rows_ref[_IH, sub]
        ki = _float_to_key(rows_ref[_IKEY, sub])
        return xi, yi, zi, inv_hi, ki

    def tile(fields, o, base, sh, lane_lo=None):
        xi, yi, zi, inv_hi, ki = fields
        col = _col_reader(win_scr, slot, o, base, sh, window)
        xw = col(_IX)
        yw = col(_IY)
        zw = col(_IZ)
        mw = col(_IM)
        kw = _float_to_key(col(_IKEY))

        mask = ((kw[None, :] >= ki[:, None] + (PLANE_OFFSETS[o] - 1))
                & (kw[None, :] <= ki[:, None] + (PLANE_OFFSETS[o] + 1)))
        if lane_lo is not None:
            # the one clamped slice of a deep window: lanes below its
            # logical start were covered by the previous slice
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
            mask = mask & (lane >= lane_lo)
        dxx = xi[:, None] - xw[None, :]
        dxy = yi[:, None] - yw[None, :]
        dxz = zi[:, None] - zw[None, :]
        r2 = dxx * dxx + dxy * dxy + dxz * dxz
        valid = mask & (r2 > 0.0) & (r2 < r_cut2)
        # clamp keeps inv_r^3 finite in f32 (masked pairs would
        # otherwise produce 0 * inf = NaN); 1e-6 AU is far below any
        # physical pair separation
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1.0e-12))
        r = r2 * inv_r
        x = r * inv_2rs
        expmx2 = jnp.exp(-x * x)
        s_mesh = (erf_approx(x, expmx2)
                  - r * inv_rs_sqrtpi * expmx2)
        gshort = grav_shape(r * inv_hi[:, None]) - s_mesh
        m = jnp.where(valid, mw[None, :], 0.0)
        coef = (-G) * m * gshort * (inv_r * inv_r * inv_r)
        return (jnp.sum(coef * dxx, axis=1),
                jnp.sum(coef * dxy, axis=1),
                jnp.sum(coef * dxz, axis=1))

    acc_subs = []
    for s in range(s_sub):
        fields = row_fields(s)
        acc = [jnp.zeros((wg,), rows_ref.dtype) for _ in range(3)]
        for o in range(9):
            base, sh, _, _ = decode(blk * s_sub + s, o)
            contrib = tile(fields, o, pl.multiple_of(base, 128), sh)
            acc = [a + c for a, c in zip(acc, contrib)]
        acc_subs.append(acc)

    for c in range(3):
        out_vmem[c, :] = jnp.concatenate([t[c] for t in acc_subs])
    for _pad_row in range(3, 8):
        out_vmem[_pad_row, :] = jnp.zeros((b,), rows_ref.dtype)

    for s in range(s_sub):
        if max_slices == 1:
            break
        fields = row_fields(s)
        sl = slice(s * wg, (s + 1) * wg)
        for o in range(9):
            _, _, nsl_m1, _ = decode(blk * s_sub + s, o)
            for k in range(1, max_slices):
                @pl.when(k <= nsl_m1)
                def _(_o=o, _k=k, _g=blk * s_sub + s, _sl=sl,
                      _fields=fields):
                    base_k, sh_k, _, lo_k = decode(_g, _o, _k)
                    contrib = tile(_fields, _o, pl.multiple_of(base_k, 128),
                                   sh_k, lane_lo=lo_k)
                    for c in range(3):
                        out_vmem[c, _sl] = out_vmem[c, _sl] + contrib[c]

    ocopy = pltpu.make_async_copy(
        out_vmem, out_hbm.at[:, pl.ds(pl.multiple_of(blk * b, 128), b)],
        osem)
    ocopy.start()
    ocopy.wait()


def pallas_grav_short_sums(packed_rows, packed_cols, prog, gvecs,
                           cfg: SimConfig, interpret: bool = False,
                           active=None):
    """(ax, ay, az) short-range gravity sums over pre-packed [8, N] arrays.

    `packed_rows`/`packed_cols` use the gravity pack layout
    (x y z m h key r_s r_cut) in *gravity-sorted* order — the two traced
    split scalars broadcast into the pad fields; `prog`/`gvecs` are the
    window plan for the gravity grid with cfg.grav_pallas_window /
    cfg.grav_pallas_fetch as the window pair (ops.pm_gravity builds both;
    gvecs is the mode-dependent per-group scalar tuple, see _plan).
    `active` gates row blocks as in pallas_density_sums (worklist in the
    GRAVITY-sorted program space).
    """
    B = cfg.sorted_block
    S = B // cfg.window_group
    n_cols = packed_cols.shape[1]
    n_rows = packed_rows.shape[1]
    gcfg = cfg.with_(pallas_window=cfg.grav_pallas_window,
                     pallas_fetch_window=cfg.grav_pallas_fetch)
    W, WB = _effective_windows(gcfg, n_cols)
    if cfg.pallas_exact_windows:
        W = LANES
    G = n_rows // B
    gate = () if active is None else tuple(active)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + len(gvecs) + len(gate),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, DF, B), packed_cols.dtype),
            pltpu.VMEM((2, 9, DF, WB), packed_cols.dtype),
            pltpu.VMEM((8, B), packed_cols.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_grav_kernel, window=W, window_big=WB, b=B,
                          s_sub=S, exact=cfg.pallas_exact_windows,
                          gated=active is not None),
        out_shape=jax.ShapeDtypeStruct((8, n_rows), packed_cols.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(prog, *gvecs, *gate, packed_rows, packed_cols)
    return out[0], out[1], out[2]


def pallas_density(p: Particles, cfg: SimConfig, grid: SortedGrid,
                   interpret: bool = False, rows=None,
                   active=None, act_mask=None) -> Particles:
    """Drop-in for sorted_density on the Pallas path.

    Returns the updated rows particle set: `p` itself, or `rows[0]` when a
    (p_rows, offset) slice is given.  With active=(worklist, count) +
    act_mask [N] bool (block timesteps): only the listed row blocks are
    computed, and rows outside `act_mask` keep their incoming rho/omega
    (the gated kernel leaves their sums undefined)."""
    rho, omega_raw = pallas_density_sums(p, cfg, grid, interpret=interpret,
                                         rows=rows, active=active)
    tgt = p if rows is None else rows[0]
    rho, omega = pairs.finalize_density(rho, omega_raw, tgt.h, tgt.alive,
                                        tgt.mass)
    if cfg.fixed_h is not None:
        omega = jnp.ones_like(omega)
    if act_mask is not None:
        rho = jnp.where(act_mask, rho, tgt.rho)
        omega = jnp.where(act_mask, omega, tgt.omega)
    return tgt.replace(rho=rho, omega=omega)


def pallas_forces(p: Particles, cfg: SimConfig, grid: SortedGrid,
                  interpret: bool = False, rows=None):
    """Drop-in for sorted_forces on the Pallas path (row-sliced like
    pallas_density when rows is given)."""
    ax, ay, az, du, araw = pallas_force_sums(p, cfg, grid, interpret=interpret,
                                             rows=rows)
    tgt = p if rows is None else rows[0]
    acc = jnp.stack([ax, ay, az], axis=-1)
    dalpha = pairs.alpha_rate(araw, tgt.rho, tgt.alpha, tgt.cs, tgt.h, cfg)
    alive = tgt.alive
    return (jnp.where(alive[:, None], acc, 0.0),
            jnp.where(alive, du, 0.0),
            jnp.where(alive, dalpha, 0.0))


def pallas_pair_eval(p: Particles, cfg: SimConfig, grid: SortedGrid,
                     interpret: bool = False, grav_split=None,
                     active=None, act_mask=None):
    """Fused density -> EOS -> forces with ONE shared [FF, N] pack.

    The separate pallas_density/pallas_forces entry points each rebuild
    their field pack; the pack is jnp.stack over strided [N, 3] component
    reads — measured at several ms per build at N=131k, comparable to the
    pair kernels themselves.  Here the pack is built once; the density
    kernel DMAs its first DF rows, EOS runs on [N] arrays, and the four
    density-derived rows are written back in place for the force kernel.

    Single-chip only (the sharded path interleaves all_gathers between the
    passes — integrate._force_eval_sorted_sharded).  Returns
    (p with rho/omega/pressure/cs, acc, du, dalpha[, acc_grav]) — the
    last only with grav_split=(r_s, r_cut): the fused short-range gravity
    acceleration (cfg.grav_fuse_short).

    Block-timestep gating (active=(worklist, count) + act_mask, see
    pallas_density_sums): only the listed row blocks run; rows outside
    `act_mask` keep their incoming (stale) rho/omega from `p` — which the
    substep sort carried (sort_particles carry_derived) — and their
    returned acc/du/dalpha are ZERO, NOT undefined (masked here), so a
    caller merging through a superset mask stays safe.  EOS runs on the
    merged full array: for inactive rows P(stale rho, unchanged u) is
    bit-identical to their stale pressure, so the force pack's columns are
    exactly the stale values their active neighbours should see.
    """
    from .eos import eos_update

    prebuilt = _row_slices(p, cfg, grid, None, FF)
    pack = prebuilt[0]
    rho_raw, omega_raw = pallas_density_sums(
        p, cfg, grid, interpret=interpret, prebuilt=prebuilt, active=active)
    rho, omega = pairs.finalize_density(rho_raw, omega_raw, p.h, p.alive,
                                        p.mass)
    if cfg.fixed_h is not None:
        omega = jnp.ones_like(omega)
    if act_mask is not None:
        rho = jnp.where(act_mask, rho, p.rho)
        omega = jnp.where(act_mask, omega, p.omega)
    p = p.replace(rho=rho, omega=omega)
    p = eos_update(p, cfg)

    pack = (pack.at[_IP].set(p.pressure).at[_IRHO].set(rho)
            .at[_IOM].set(p.omega).at[_ICS].set(p.cs))
    prebuilt = (pack, pack) + prebuilt[2:]
    out = pallas_force_sums(
        p, cfg, grid, interpret=interpret, prebuilt=prebuilt,
        grav_split=grav_split, active=active)
    ax, ay, az, du, araw = out[:5]
    acc = jnp.stack([ax, ay, az], axis=-1)
    dalpha = pairs.alpha_rate(araw, rho, p.alpha, p.cs, p.h, cfg)
    alive = p.alive if act_mask is None else (p.alive & act_mask)
    res = (p,
           jnp.where(alive[:, None], acc, 0.0),
           jnp.where(alive, du, 0.0),
           jnp.where(alive, dalpha, 0.0))
    if grav_split is not None:
        acc_g = jnp.stack(out[5], axis=-1)
        res = res + (jnp.where(alive[:, None], acc_g, 0.0),)
    return res


__all__ = ["pallas_density", "pallas_forces", "pallas_density_sums",
           "pallas_force_sums", "pallas_pair_eval", "window_overflow"]

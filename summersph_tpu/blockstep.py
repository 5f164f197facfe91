"""Hierarchical block timesteps: power-of-two dt rungs under one base step.

The reference advances every particle at ONE global dt, the minimum over
all particles' four timestep criteria (SUMMER_SPH.f90:831-860).  In a
gravitational collapse that minimum is set by the densest knot: the r3
flagship run's dt spanned [1.25e-6, 3.84e-3] yr (docs/results/collapse1m),
a 3000x spread, so in the late phase 10^6 particles all stepped at the
dt of the ~10^3 that needed it.  Block timesteps are the standard remedy
(GADGET-2 §4 / Hernquist & Katz 1989, PAPERS.md): a DELIBERATE,
opt-in deviation from the reference (cfg.dt_bins > 1; the default 1 keeps
the reference's global scheme bit-for-bit).

Scheme (the classic block KDK, synchronized at base-step boundaries):

  * rungs r in [0, B): particle i steps at dt_r = dt_base / 2^r with
    r_i = ceil(log2(dt_base / cand_i)) clipped to [0, B-1], assigned once
    per base step from the SAME per-particle candidates the global
    controller reduces (ops.timestep.dt_candidates).
  * the base step runs M = 2^(B-1) substeps of delta = dt_base / M.
    At substep j, rung r is "closing" iff (j+1) % 2^(B-1-r) == 0 (and
    "opening" at j with the same phase test on j).  Every particle DRIFTS
    every substep; KICKS happen only at the particle's own rung
    boundaries, with forces evaluated exactly there.
  * dt_base itself keeps the reference's hysteresis controller, with the
    candidate bound relaxed by 2^(B-1) (the tightest particle now steps
    on the deepest rung, not at dt_base) — ops.timestep.next_timestep's
    cand_scale.

What a substep force evaluation costs is the point: only the CLOSING
rows need forces, and deep-rung particles are exactly the spatially
clustered ones — contiguous in the SFC sort — so activity is compacted
at Pallas-program granularity (sorted_block rows) into a scalar-prefetch
worklist and the pair kernels skip inactive blocks entirely
(ops.pallas_pairs._gate_plan).  Each substep still pays the sort (which
must carry the inactive rows' stale rho/P/cs/omega + rates,
sort_particles carry_derived) and the plan build; the pair math — the
dominant cost at every measured scale (docs/PERF_NOTES.md) — scales with
the active fraction.

Accuracy contract (standard for block-timestep SPH): an active row reads
its inactive neighbours' positions CURRENT (everyone drifts) but their
rho/P/cs/omega STALE (frozen at the neighbour's last close).  Pairwise
momentum antisymmetry therefore holds only between same-substep-active
pairs; the cross-rung error is O(dt_r * d(state)/dt) and is bounded in
tests/test_blockstep.py against the global-dt engine.  The far-field PM
force is refreshed once per cfg.pm_every BASE steps (at the first
substep) and held in particles.acc_ext otherwise — the RESPA split
already validated for the global engine (tests/test_pm_every.py), with
the hold now spanning the base step's substeps too.

Sinks always live on the deepest cadence: they kick/drift every substep
at delta (their count is tiny, [S,N] passes are cheap), and the sink
lifecycle (creation, accretion, merging, culling) runs every substep —
the same per-force-evaluation cadence the reference runs it at.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DBG = bool(os.environ.get("BLOCKSTEP_DEBUG"))


def _mark(msg):
    if _DBG:
        import time
        print(f"[blockstep {time.time():.1f}] {msg}", flush=True)

from .config import SimConfig
from .ops.eos import eos_update
from .ops.gravity import sink_gravity
from .ops.sinks import accrete, create_sinks, cull_bounds, merge_sinks
from .ops.timestep import dt_candidates, next_timestep
from .state import Particles, SimState, Sinks


def assign_rungs(p: Particles, cfg: SimConfig, dt_base) -> jax.Array:
    """[N] int32 rung per particle: smallest r with dt_base / 2^r <= its
    timestep candidate, clipped to [0, dt_bins-1].  Dead slots get rung 0
    (their candidates are +inf)."""
    cand = dt_candidates(p, cfg)
    ratio = dt_base / jnp.maximum(cand, 1.0e-30)  # inf cand -> ratio ~ 0
    r = jnp.ceil(jnp.log2(jnp.maximum(ratio, 2.0 ** -40)))
    return jnp.clip(r, 0, cfg.dt_bins - 1).astype(jnp.int32)


def closing_mask(rung: jax.Array, j: int, n_sub: int) -> jax.Array:
    """[N] bool: rungs whose step ends at substep boundary j+1 (equally:
    opens at j+1).  Rung r closes every 2^(B-1-r) substeps."""
    period = jnp.right_shift(jnp.int32(n_sub), rung)  # M / 2^r
    return ((j + 1) & (period - 1)) == 0


def opening_mask(rung: jax.Array, j: int, n_sub: int) -> jax.Array:
    period = jnp.right_shift(jnp.int32(n_sub), rung)
    return (j & (period - 1)) == 0


def rung_dt(rung: jax.Array, dt_base, dtype) -> jax.Array:
    """[N] per-particle step length dt_base / 2^rung."""
    return jnp.asarray(dt_base, dtype) * jnp.exp2(-rung.astype(dtype))


def group_worklist(act: jax.Array, block: int):
    """(worklist [G] int32, count [1] int32) over row blocks of `block`
    rows: blocks containing any active row, compacted to the front in
    ascending order (stable argsort), for the gated Pallas kernels."""
    gp = act.shape[0] // block
    blk_act = jnp.any(act.reshape(gp, block), axis=1)
    work = jnp.argsort(~blk_act, stable=True).astype(jnp.int32)
    count = jnp.sum(blk_act).astype(jnp.int32).reshape(1)
    return work, count


def _kick_masked(p: Particles, s: Sinks, dt_p, mask, dt_sink):
    """Half-kick the masked rows by their own dt/2 (integrate.kick with a
    per-particle dt and an activity mask); sinks by dt_sink/2 always."""
    m = mask & p.alive
    mm = m[:, None]
    if p.u_c is None:
        u = jnp.where(m, p.u + 0.5 * dt_p * p.du, p.u)
        u_c = None
    else:
        y = 0.5 * dt_p * p.du - p.u_c
        t = p.u + y
        u_c = jnp.where(m, (t - p.u) - y, p.u_c)
        u = jnp.where(m, t, p.u)
    p = p.replace(
        vel=jnp.where(mm, p.vel + 0.5 * dt_p[:, None] * p.acc, p.vel),
        u=u, u_c=u_c,
        alpha=jnp.where(m, p.alpha + 0.5 * dt_p * p.dalpha, p.alpha))
    sm = s.alive[:, None]
    s = s.replace(vel=jnp.where(sm, s.vel + 0.5 * dt_sink * s.acc, s.vel))
    return p, s


def _drift(p: Particles, s: Sinks, delta):
    p = p.replace(pos=jnp.where(p.alive[:, None],
                                p.pos + delta * p.vel, p.pos))
    s = s.replace(pos=jnp.where(s.alive[:, None],
                                s.pos + delta * s.vel, s.pos))
    return p, s


def _check_binned_cfg(cfg: SimConfig):
    if cfg.dt_bins > 10:
        # The base step SCANS M = 2^(dt_bins-1) substeps (compile cost is
        # one substep body; M is only the trip count), but runtime is
        # still linear in M and a particle set never earns 512 rungs —
        # a dt spread that wide means the dt floor/ceiling are wrong.
        raise ValueError(
            f"cfg.dt_bins = {cfg.dt_bins} would run "
            f"{1 << (cfg.dt_bins - 1)} substeps per base step; the "
            f"supported range is 1-10, and only 1-4 is measured")
    if cfg.neighbor_mode != "sorted":
        raise ValueError("cfg.dt_bins > 1 requires the sorted engine")
    if not cfg.reuse_forces:
        raise ValueError("cfg.dt_bins > 1 requires reuse_forces (the "
                         "carried-rate KDK is what the rung structure "
                         "interleaves)")
    if cfg.gravity == "direct":
        raise ValueError("cfg.dt_bins > 1 supports gravity in "
                         "('none', 'pm', 'bh', 'treepm')")
    if cfg.decomp == "slab":
        raise ValueError("cfg.dt_bins > 1 is single-chip (no slab decomp)")


def step_binned(state: SimState, cfg: SimConfig, kern_k=None,
                pm_phase=None) -> SimState:
    """One BASE step = 2^(dt_bins-1) substeps of the block-timestep KDK.

    Jittable, shape-static.  The M substeps run under ONE lax.scan whose
    body is a single substep (the substep index j enters only through
    rung-phase mask arithmetic and the pm-refresh predicate, both traced):
    compile cost is one substep body regardless of dt_bins.  The round-4
    form unrolled the loop in Python — compile time grew exponentially in
    dt_bins, and at B=4/N=1e6 the backend never finished compiling it
    (>56 min, measured round 5) — which made the feature unusable at
    exactly the scale it exists for.  Same contract as integrate.step:
    requires primed carried rates; returns the state advanced by dt_base
    with the controller's next dt_base, health stats max'd over the
    substeps.
    """
    from .ops.sorted_grid import (sort_particles, sorted_density,
                                  sorted_forces)
    from .integrate import _coverage_stats, _count_nonfinite

    _check_binned_cfg(cfg)
    p, s, dt_base = state.particles, state.sinks, state.dt
    dtype = p.pos.dtype
    cap0 = p.capacity
    B = cfg.dt_bins
    M = 1 << (B - 1)
    delta = dt_base / M

    rung0 = assign_rungs(p, cfg, dt_base)
    phase0 = (pm_phase if pm_phase is not None else jnp.zeros((), jnp.int32))
    r_s0 = (state.pm_r_s if state.pm_r_s is not None
            else jnp.zeros((), dtype))

    fuse = (cfg.grav_fuse_short and cfg.gravity in ("bh", "pm", "treepm"))
    pm_on = cfg.gravity in ("bh", "pm", "treepm")
    h_pad = 1.0 if cfg.fixed_h is not None else cfg.sort_h_pad

    def substep(carry, j):
        p, s, rung, r_s_held, stats_max = carry
        dt_p = rung_dt(rung, dt_base, dtype)
        # opening kick: rungs whose step starts at j, with carried rates
        p, s = _kick_masked(p, s, dt_p, opening_mask(rung, j, M), delta)
        p, s = _drift(p, s, delta)

        # --- sort at the drifted positions; stale fields + rung ride
        _mark(f"substep {j} sort")
        p2, grid, rung = sort_particles(p, cfg, h_pad=h_pad,
                                        carry_derived=True, extra=rung)
        _mark(f"substep {j} sorted")
        act = p2.alive & closing_mask(rung, j, M)
        work, count = group_worklist(act, cfg.sorted_block)
        gate = (work, count)

        # --- far field (held; refreshed once per pm_every base steps, at
        # the base step's first substep).  j is a scan tracer, so the
        # "first substep" test is a where, not Python control flow.
        phase_eff = jnp.where(j == 0, jnp.asarray(phase0, jnp.int32),
                              jnp.ones((), jnp.int32))
        grav_split = None
        if pm_on and fuse:
            from .ops.pm_gravity import pm_geometry
            _, _, r_s_fresh = pm_geometry(p2, cfg)
            recompute = (phase_eff == 0) | (r_s_held <= 0.0)
            r_s_use = jnp.where(recompute, r_s_fresh, r_s_held)
            grav_split = (r_s_use, cfg.effective_rcut_rs() * r_s_use)

        _mark(f"substep {j} pairs")
        # --- SPH pair passes (gated on the Pallas path)
        if cfg.use_pallas:
            from .ops.pallas_pairs import pallas_pair_eval
            out = pallas_pair_eval(p2, cfg, grid,
                                   interpret=cfg.pallas_interpret,
                                   grav_split=grav_split,
                                   active=gate, act_mask=act)
            p2d, acc_sph, du, dalpha = out[:4]
            acc_grav_fused = out[4] if grav_split is not None else None
        else:
            p2d = sorted_density(p2, cfg, grid)
            p2d = p2d.replace(
                rho=jnp.where(act, p2d.rho, p2.rho),
                omega=jnp.where(act, p2d.omega, p2.omega))
            p2d = eos_update(p2d, cfg)
            acc_sph, du, dalpha = sorted_forces(p2d, cfg, grid)
            acc_grav_fused = None
            if grav_split is not None:
                raise ValueError("grav_fuse_short requires use_pallas")

        _mark(f"substep {j} gravity")
        # --- gravity
        grav_over = jnp.zeros((), jnp.int32)
        acc_new = acc_sph
        if pm_on:
            from .ops.pm_gravity import (pm_long_range_held,
                                         pm_short_range)
            acc_long, r_s_out = pm_long_range_held(
                p2d, cfg, phase_eff, r_s_held, kern_k=kern_k)
            p2d = p2d.replace(acc_ext=acc_long)
            r_s_held = r_s_out
            if fuse:
                acc_new = acc_new + acc_long + acc_grav_fused
                grav_over = jnp.where(
                    grav_split[1] <= grid.cell_size, 0,
                    jnp.sum(act)).astype(jnp.int32)
            else:
                acc_short, grav_over = pm_short_range(
                    p2d, cfg, r_s_out,
                    active_rows=act if cfg.use_pallas else None)
                acc_new = acc_new + acc_long + acc_short

        _mark(f"substep {j} sinks")
        acc_gas_sink, acc_sink = sink_gravity(p2d, s)
        acc_new = acc_new + acc_gas_sink
        s = s.replace(acc=acc_sink)

        # --- merge: active rows take the fresh rates, inactive keep stale
        p2 = p2d.replace(
            acc=jnp.where(act[:, None], acc_new, p2.acc),
            du=jnp.where(act, du, p2.du),
            dalpha=jnp.where(act, dalpha, p2.dalpha))

        # closing kick at the rung boundary, with the fresh rates
        dt_p = rung_dt(rung, dt_base, dtype)
        p2, s = _kick_masked(p2, s, dt_p, act, delta)

        _mark(f"substep {j} epilogue")
        # --- per-substep epilogue (same cadence as the global engine's
        # per-step one): h iteration for the closing rows, sink lifecycle
        n_unconverged = jnp.zeros((), jnp.int32)
        sink_full = jnp.zeros((), jnp.int32)
        if cfg.fixed_h is None:
            from .ops.smoothing import update_smoothing
            p_h, n_unconverged = update_smoothing(
                p2, cfg, grid=grid,
                active=gate if cfg.use_pallas else None, act_mask=act)
            # only h moves; rho/P/cs/omega keep the stale-consistent merge
            p2 = p2.replace(h=jnp.where(act, p_h.h, p2.h))
            s, sink_full = create_sinks(p2, s, cfg)

        p2, s = accrete(p2, s)
        if cfg.sink_merge_factor > 0.0:
            s, _ = merge_sinks(s, cfg)
        p2, s = cull_bounds(p2, s, cfg)

        _mark(f"substep {j} stats")
        stats = _coverage_stats(cfg, grid, grav_over, n_unconverged,
                                _count_nonfinite(p2), sink_full)
        stats_max = jnp.maximum(stats_max, stats)

        if p2.capacity != cap0:  # drop the sort's dead pad slots
            p2 = jax.tree_util.tree_map(lambda a: a[:cap0], p2)
            rung = rung[:cap0]
        return (p2, s, rung, r_s_held, stats_max), None

    (p, s, _, r_s_held, stats_max), _ = jax.lax.scan(
        substep,
        (p, s, rung0, r_s0, jnp.zeros_like(state.stats)),
        jnp.arange(M, dtype=jnp.int32))

    t = state.t + dt_base
    dt_next = next_timestep(p, dt_base, cfg,
                            cand_scale=float(1 << (B - 1)))
    out = state.replace(particles=p, sinks=s, t=t, dt=dt_next,
                        stats=stats_max)
    if state.pm_r_s is not None:
        out = out.replace(pm_r_s=r_s_held if pm_on else state.pm_r_s)
    return out


__all__ = ["step_binned", "assign_rungs", "closing_mask", "opening_mask",
           "group_worklist", "rung_dt"]

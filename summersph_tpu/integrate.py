"""KDK leapfrog integrator and simulation driver.

Step skeleton mirrors the reference's `simulate` loop exactly
(SUMMER_SPH.f90:863-930, variable-h "SUMMER_SPH - Variable.f90":1076-1164):

    [tree] -> density -> EOS -> forces -> kick(dt/2)
    drift(dt)
    [tree] -> density -> EOS -> forces -> kick(dt/2)
    t += dt ; dt hysteresis update
    (variable-h: h Newton iteration ; sink creation)
    sink accretion ; bounds cull

but the whole step is one jitted, shape-static function `step(state) ->
state`, and `run_until` advances it in jitted `lax.scan` segments so the
simulation stays on device between snapshot ticks (the reference rebuilds
its tree and returns to the host every step).  The "tree" build is the hashed cell grid
(ops.neighbors) when `cfg.neighbor_mode == 'grid'`, or nothing for the dense
O(N^2) path.

`simulate` is the user-facing driver: evenly spaced snapshot saves
(n_saves ticks over end_time, SUMMER_SPH.f90:868-884) via the reference
`.txt` format plus optional npz checkpoints, per-tick console diagnostics
(the reference prints N/dt/t each step, SUMMER_SPH.f90:891).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .config import SimConfig
from .ops.density import compute_density
from .ops.eos import eos_update
from .ops.forces import compute_sph_forces
from .ops.gravity import gas_gravity_direct, sink_gravity
from .ops.neighbors import build_grid
from .ops.sinks import accrete, create_sinks, cull_bounds
from .ops.smoothing import update_smoothing
from .ops.timestep import next_timestep
from .state import Particles, SimState, Sinks


def _gather(tree, axis_name):
    """all_gather a particle pytree along the device axis (tiled: the global
    array, concatenated over shards)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, axis_name, tiled=True), tree)


def force_eval(p: Particles, s: Sinks, cfg: SimConfig,
               axis_name: str | None = None):
    """density -> EOS -> (gravity + sink gravity + SPH) accelerations.

    Matches the reference's find_forces grouping (SUMMER_SPH.f90:818-829).
    Returns (particles with rho/P/cs/acc/du/dalpha filled, sinks with acc).

    Multi-chip (`axis_name` set, called inside shard_map): `p` is this
    device's shard, `s` is replicated.  Neighbour columns are the
    all-gathered global particle set — positions are small (1e6 particles =
    12 MB f32), so replicated-columns + sharded-rows rides ICI once per pair
    pass and scales compute by the device count (SURVEY.md §2.3).
    """
    if cfg.neighbor_mode == "sorted" and axis_name is None:
        return _force_eval_sorted(p, s, cfg)

    cols0 = _gather(p, axis_name) if axis_name else None
    # Sharded runs use the hashed cell grid as the neighbour structure even
    # in 'sorted' configs (sharding the sorted order across devices — SFC
    # domain decomposition — is future work); 'dense' stays dense.
    grid = (build_grid(cols0 if cols0 is not None else p, cfg)
            if cfg.neighbor_mode in ("grid", "sorted") else None)
    p = compute_density(p, cfg, grid, cols=cols0)
    p = eos_update(p, cfg)

    # Columns need the freshly computed rho/P/cs/omega for the force pass.
    cols = _gather(p, axis_name) if axis_name else None
    acc, du, dalpha = compute_sph_forces(p, cfg, grid, cols=cols)

    if cfg.gravity == "direct":
        acc = acc + gas_gravity_direct(p, cfg, cols=cols)
    elif cfg.gravity in ("bh", "pm", "treepm"):
        from .ops.pm_gravity import gas_gravity_pm
        acc = acc + gas_gravity_pm(p, cfg, cols=cols)

    acc_gas_sink, acc_sink = sink_gravity(p, s, axis_name=axis_name)
    acc = acc + acc_gas_sink

    p = p.replace(acc=acc, du=du, dalpha=dalpha)
    s = s.replace(acc=acc_sink)
    return p, s


def _force_eval_sorted(p: Particles, s: Sinks, cfg: SimConfig):
    """force_eval on the SFC-sorted window engine (ops.sorted_grid).

    Sorting permutes the particle arrays (identity tracked by `pid`); the
    returned particle set is in sorted order, sliced back to the caller's
    capacity (the sort pads with dead slots, which land at the end where the
    slice drops them losslessly).
    """
    from .ops.sorted_grid import sort_particles, sorted_density, sorted_forces

    cap0 = p.capacity
    p2, sgrid = sort_particles(p, cfg)
    if cfg.use_pallas and p.pos.dtype != jnp.float32:
        raise ValueError(
            "use_pallas requires float32 state (the Pallas pair kernels are "
            "f32); use the XLA sorted engine for float64 validation runs")
    if cfg.use_pallas:
        from .ops.pallas_pairs import pallas_density, pallas_forces
        p2 = pallas_density(p2, cfg, sgrid)
        p2 = eos_update(p2, cfg)
        acc, du, dalpha = pallas_forces(p2, cfg, sgrid)
    else:
        p2 = sorted_density(p2, cfg, sgrid)
        p2 = eos_update(p2, cfg)
        acc, du, dalpha = sorted_forces(p2, cfg, sgrid)

    if cfg.gravity == "direct":
        acc = acc + gas_gravity_direct(p2, cfg)
    elif cfg.gravity in ("bh", "pm", "treepm"):
        from .ops.pm_gravity import gas_gravity_pm
        acc = acc + gas_gravity_pm(p2, cfg)

    acc_gas_sink, acc_sink = sink_gravity(p2, s)
    p2 = p2.replace(acc=acc + acc_gas_sink, du=du, dalpha=dalpha)
    if p2.capacity != cap0:
        p2 = jax.tree_util.tree_map(lambda a: a[:cap0], p2)
    return p2, s.replace(acc=acc_sink)


def kick(p: Particles, s: Sinks, dt):
    """Half-kick: v += a dt/2, u += du dt/2, alpha += dalpha dt/2
    (SUMMER_SPH.f90:742-759)."""
    am = p.alive[:, None]
    al = p.alive
    p = p.replace(
        vel=jnp.where(am, p.vel + 0.5 * dt * p.acc, p.vel),
        u=jnp.where(al, p.u + 0.5 * dt * p.du, p.u),
        alpha=jnp.where(al, p.alpha + 0.5 * dt * p.dalpha, p.alpha),
    )
    sm = s.alive[:, None]
    s = s.replace(vel=jnp.where(sm, s.vel + 0.5 * dt * s.acc, s.vel))
    return p, s


def drift(p: Particles, s: Sinks, dt):
    """Full drift: x += v dt (SUMMER_SPH.f90:762-776)."""
    p = p.replace(pos=jnp.where(p.alive[:, None], p.pos + dt * p.vel, p.pos))
    s = s.replace(pos=jnp.where(s.alive[:, None], s.pos + dt * s.vel, s.pos))
    return p, s


def step(state: SimState, cfg: SimConfig,
         axis_name: str | None = None) -> SimState:
    """One full KDK step with all per-step physics. Jittable, shape-static.

    With `axis_name` (inside shard_map) the same code runs data-parallel:
    particle arrays are device shards, sinks/t/dt replicated; global
    reductions (dt pmin, sink accretion psum, sink-creation argmax) go
    through the named axis.
    """
    p, s, dt = state.particles, state.sinks, state.dt

    p, s = force_eval(p, s, cfg, axis_name)
    p, s = kick(p, s, dt)
    p, s = drift(p, s, dt)
    p, s = force_eval(p, s, cfg, axis_name)
    p, s = kick(p, s, dt)

    t = state.t + dt
    dt = next_timestep(p, dt, cfg, axis_name=axis_name)

    if cfg.fixed_h is None:
        cols = _gather(p, axis_name) if axis_name else None
        p = update_smoothing(p, cfg, cols=cols)
        s = create_sinks(p, s, cfg, axis_name=axis_name)

    p, s = accrete(p, s, axis_name=axis_name)
    p, s = cull_bounds(p, s, cfg)

    return state.replace(particles=p, sinks=s, t=t, dt=dt)


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def run_steps(state: SimState, cfg: SimConfig, n_steps: int) -> SimState:
    """Advance exactly n_steps on device.

    Implemented with lax.scan: on the TPU backend in use, dynamic-trip-count
    loops (fori_loop / while_loop) execute ~100x slower than their bodies,
    while scan runs at native speed (measured; see docs/PERF_NOTES.md).
    """
    return jax.lax.scan(lambda st, _: (step(st, cfg), None), state,
                        None, length=n_steps)[0]


def check_coverage(state: SimState, cfg: SimConfig, warn: bool = True) -> int:
    """Count neighbour candidates the static window sizes would drop.

    The sorted engine's windows are static shapes (cfg.window_blocks /
    cfg.pallas_window); a configuration too tight for the density contrast
    silently misses pairs.  Returns the dropped-candidate count for the
    *current* particle distribution (0 = exact coverage) and optionally
    prints a loud warning.  `simulate` runs this once at start; re-check
    after strong density evolution.
    """
    if cfg.neighbor_mode != "sorted":
        return 0
    from .ops.pallas_pairs import window_overflow
    from .ops.sorted_grid import LANES, sort_particles

    _, grid = sort_particles(state.particles, cfg)
    if cfg.use_pallas:
        dropped = int(window_overflow(grid, cfg.pallas_window))
        knob = "cfg.pallas_window"
    else:
        reach = (grid.starts // LANES) * LANES + cfg.window_blocks * LANES
        import jax.numpy as _jnp
        dropped = int(_jnp.sum(_jnp.maximum(grid.ends - reach, 0)))
        knob = "cfg.window_blocks"
    if dropped and warn:
        n_alive = int(state.particles.n_alive)
        approx_total = max(n_alive, 1) * 60  # ~candidate pairs at eta=1.2
        print(f"WARNING: neighbour windows drop {dropped} candidates "
              f"(~{dropped / approx_total:.2e} of all pairs, typically at the "
              f"domain rim where SFC columns jump) — raise {knob} for exact "
              f"coverage", flush=True)
    return dropped


def run_until(state: SimState, t_stop, cfg: SimConfig,
              max_steps: int = 1_000_000, steps_per_sync: int = 8) -> SimState:
    """Advance until t >= t_stop.

    Device-side scan segments of `steps_per_sync` steps with one host sync
    between segments (the t < t_stop check) — dynamic-trip while_loop is
    pathological on the target backend (see run_steps).  May overshoot
    t_stop by up to steps_per_sync - 1 steps, matching the reference's
    "save on the first step past the tick" semantics (SUMMER_SPH.f90:881).
    """
    t_stop = float(t_stop)
    done = 0
    while float(state.t) < t_stop and done < max_steps:
        state = run_steps(state, cfg, steps_per_sync)
        done += steps_per_sync
    return state


def simulate(
    state: SimState,
    cfg: SimConfig,
    out_dir: Optional[str] = None,
    snapshot_columns: int = 9,
    on_tick: Optional[Callable[[int, SimState], None]] = None,
    verbose: bool = True,
) -> SimState:
    """Full run to cfg.end_time with n_saves evenly spaced snapshots."""
    from .io.txt import save_path, write_snapshot_txt

    from .diagnostics import format_report, measure

    check_coverage(state, cfg, warn=True)
    ticks = [cfg.end_time * (i + 1) / cfg.n_saves for i in range(cfg.n_saves)]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    for i, t_tick in enumerate(ticks):
        if float(state.t) >= t_tick and i < len(ticks) - 1:
            continue  # a previous segment overshot past this tick already
        t0 = time.time()
        state = run_until(state, t_tick, cfg)
        state.t.block_until_ready()
        if verbose:
            print(f"[tick {i}] {format_report(measure(state))} "
                  f"wall: {time.time()-t0:.2f}s", flush=True)
        if out_dir:
            write_snapshot_txt(save_path(out_dir, i), state.particles,
                               state.sinks, columns=snapshot_columns)
        if on_tick is not None:
            on_tick(i, state)
        if float(state.t) >= cfg.end_time:
            break
    return state


__all__ = ["force_eval", "kick", "drift", "step", "run_until", "run_steps",
           "simulate"]

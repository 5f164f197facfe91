"""Adaptive global timestep with hysteresis (SUMMER_SPH.f90:831-860).

Four per-particle candidates (each a timescale), reduced with a masked min
over live particles and scaled by `timestep_scale`:

    t_acc = sqrt(|v|^2 / |a|^2)       (velocity/acceleration)
    t_u   = u / |du/dt|               (energy change)
    t_h   = h / |v|                   (crossing time)
    t_cfl = h / (c + 1.2 c)           (sound crossing / CFL)

then hysteresis on the running dt: grow x1.5 when the candidate exceeds 2 dt
(capped at dt_max), shrink x0.5 when below dt/2 (floored at dt_min)
(SUMMER_SPH.f90:855-859).  Degenerate candidates (zero denominators on cold
or static particles) are masked to +inf rather than propagating NaN — the
reference relies on IEEE inf division giving the same effect.

Deliberate deviation from SUMMER_SPH.f90:855-859 (`cfg.dt_bound_candidate`,
default on): the result is additionally bounded by the candidate itself,
dt <- max(min(hysteresis(dt), dt_cand), dt_min).  The reference's
shrink-by-half-per-step cannot track a gravitational-collapse runaway —
cs and |a| grow faster than 2x per step near sink formation, and inside a
64-step jitted segment the controller falls behind until the AV mu term
overflows f32 (the round-2 config-5 death).  Growth keeps the reference's
damped x1.5 hysteresis.  Set dt_bound_candidate=False for the literal
reference controller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles


def _safe_ratio(num, den):
    ok = den > 0.0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), jnp.inf)


def dt_candidates(p: Particles, cfg: SimConfig):
    """[N] per-particle dt candidates (the reference's four criteria,
    scaled): the min over live particles is the global controller's input
    (next_timestep); the per-particle values assign block-timestep rungs
    (integrate.assign_rungs, cfg.dt_bins)."""
    v2 = jnp.sum(p.vel * p.vel, axis=-1)
    a2 = jnp.sum(p.acc * p.acc, axis=-1)

    t_acc = jnp.sqrt(_safe_ratio(v2, a2))
    t_u = _safe_ratio(p.u, jnp.abs(p.du))
    t_h = _safe_ratio(p.h, jnp.sqrt(v2))
    t_cfl = _safe_ratio(p.h, 2.2 * p.cs)

    cand = jnp.minimum(jnp.minimum(t_acc, t_u), jnp.minimum(t_h, t_cfl))
    return jnp.where(p.alive, cand, jnp.inf) * cfg.timestep_scale


def next_timestep(p: Particles, dt, cfg: SimConfig,
                  axis_name: str | None = None, cand_scale: float = 1.0):
    """`cand_scale` relaxes the candidate bound (block timesteps: the BASE
    step may exceed the tightest particle's candidate by 2^(dt_bins-1)
    because that particle steps on a deeper rung, blockstep.py)."""
    cand = dt_candidates(p, cfg) / cfg.timestep_scale
    cand_min = jnp.min(cand)
    if axis_name is not None:
        # Global timestep across device shards (SURVEY.md §5: psum/pmin for
        # global reductions like dt).
        cand_min = jax.lax.pmin(cand_min, axis_name)
    dt_cand = cand_min * cfg.timestep_scale * cand_scale

    grown = jnp.where(
        (dt_cand > 2.0 * dt) & (cfg.dt_grow * dt < cfg.dt_max),
        cfg.dt_grow * dt, dt)
    shrunk = jnp.where(
        (dt_cand < cfg.dt_shrink * dt) & (dt * cfg.dt_shrink > cfg.dt_min),
        cfg.dt_shrink * dt, grown)
    if not cfg.dt_bound_candidate:
        return shrunk
    # Collapse guard (module docstring): never step past the candidate.
    return jnp.maximum(jnp.minimum(shrunk, dt_cand), cfg.dt_min)


__all__ = ["next_timestep", "dt_candidates"]

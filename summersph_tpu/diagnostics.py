"""Observability: conserved-quantity monitors and NaN guards.

The reference's only runtime diagnostic is a per-step console print of
N/dt/t (SUMMER_SPH.f90:891) — no conserved-quantity tracking (SURVEY.md §5).
`measure` computes the standard SPH health scalars as one jitted reduction
pass; `simulate` logs them at snapshot ticks.

Gravitational potential energy uses direct pair summation and is therefore
O(N^2) — gate with `include_potential` (diagnostics cadence, not per-step).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from .config import SimConfig
from .state import SimState
from .utils.units import G


@partial(jax.jit, static_argnames=("include_potential",))
def measure(state: SimState, include_potential: bool = False) -> Dict[str, jax.Array]:
    p, s = state.particles, state.sinks
    pm = jnp.where(p.alive, p.mass, 0.0)
    sm = jnp.where(s.alive, s.mass, 0.0)

    # f64 accumulation for the conserved sums (f32 state, SURVEY.md §7).
    pm64 = pm.astype(jnp.float64) if jax.config.jax_enable_x64 else pm
    vel = p.vel.astype(pm64.dtype)
    pos = p.pos.astype(pm64.dtype)

    e_kin = 0.5 * jnp.sum(pm64 * jnp.sum(vel * vel, axis=-1))
    e_kin = e_kin + 0.5 * jnp.sum(sm * jnp.sum(s.vel * s.vel, axis=-1))
    e_int = jnp.sum(pm64 * jnp.where(p.alive, p.u, 0.0))

    mom = jnp.sum(pm64[:, None] * vel, axis=0) + jnp.sum(
        sm[:, None] * s.vel, axis=0)
    ang = jnp.sum(pm64[:, None] * jnp.cross(pos, vel), axis=0) + jnp.sum(
        sm[:, None] * jnp.cross(s.pos, s.vel), axis=0)

    out = {
        "n_gas": p.n_alive,
        "n_sinks": s.n_alive,
        "mass_gas": jnp.sum(pm64),
        "mass_sinks": jnp.sum(sm),
        "e_kin": e_kin,
        "e_int": e_int,
        "momentum": mom,
        "ang_momentum": ang,
        "rho_max": jnp.max(jnp.where(p.alive, p.rho, 0.0)),
        "h_min": jnp.min(jnp.where(p.alive, p.h, jnp.inf)),
        "t": state.t,
        "dt": state.dt,
    }

    if include_potential:
        dx = pos[:, None, :] - pos[None, :, :]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        valid = (p.alive[:, None] & p.alive[None, :]
                 & (r > 0.0))
        inv_r = jnp.where(valid, 1.0 / jnp.where(valid, r, 1.0), 0.0)
        e_pot = -0.5 * G * jnp.sum(pm64[:, None] * pm64[None, :] * inv_r)
        # gas <-> sink
        ds = jnp.sqrt(jnp.sum((pos[:, None, :] - s.pos[None, :, :]) ** 2, -1))
        vs = p.alive[:, None] & s.alive[None, :] & (ds > 0.0)
        e_pot = e_pot - G * jnp.sum(
            pm64[:, None] * sm[None, :]
            * jnp.where(vs, 1.0 / jnp.where(vs, ds, 1.0), 0.0))
        out["e_pot"] = e_pot
        out["e_total"] = e_kin + e_int + e_pot
    return out


def format_report(d: Dict) -> str:
    import numpy as np
    mom = np.asarray(d["momentum"])
    ang = np.asarray(d["ang_momentum"])
    msg = (f"N={int(d['n_gas'])}+{int(d['n_sinks'])}s "
           f"t={float(d['t']):.6g} dt={float(d['dt']):.3e} "
           f"M={float(d['mass_gas']):.6g}+{float(d['mass_sinks']):.6g} "
           f"Ek={float(d['e_kin']):.6g} Ei={float(d['e_int']):.6g} "
           f"|p|={np.linalg.norm(mom):.3e} |L|={np.linalg.norm(ang):.6g} "
           f"rho_max={float(d['rho_max']):.3e}")
    if "e_total" in d:
        msg += f" Etot={float(d['e_total']):.6g}"
    return msg


def nan_guard(state: SimState) -> bool:
    """True if any live particle carries a non-finite value (opt-in check;
    the reference imports ieee_arithmetic but never guards, SUMMER_SPH.f90:2)."""
    p = state.particles
    ok = jnp.ones((), bool)
    for arr in (p.pos, p.vel, p.u, p.rho):
        a2 = arr if arr.ndim == 1 else jnp.sum(arr, -1)
        ok = ok & jnp.all(jnp.where(p.alive, jnp.isfinite(a2), True))
    return not bool(ok)


__all__ = ["measure", "format_report", "nan_guard"]

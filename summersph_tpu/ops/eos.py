"""Adiabatic ideal-gas equation of state.

P = (gamma - 1) u rho ;  c_s = sqrt(gamma P / rho)
(SUMMER_SPH.f90:459-468 hardcodes gamma = 1.4; the variable-h generation
parameterises it, "SUMMER_SPH - Variable.f90":502-512.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles


def eos_update(p: Particles, cfg: SimConfig) -> Particles:
    rho = jnp.where(p.alive, p.rho, 1.0)
    u = jnp.where(p.alive, jnp.maximum(p.u, 0.0), 0.0)
    pressure = (cfg.gamma - 1.0) * u * rho
    cs = jnp.sqrt(cfg.gamma * pressure / rho)
    return p.replace(
        pressure=jnp.where(p.alive, pressure, 0.0),
        cs=jnp.where(p.alive, cs, 0.0),
    )


__all__ = ["eos_update"]

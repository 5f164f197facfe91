"""Self-gravity: softened gas-gas gravity and direct sink gravity.

Gas-gas gravity in the reference is a Barnes-Hut monopole walk with opening
angle theta (SUMMER_SPH.f90:249-290), softened within 2h by the spline factor
f(q) (ops.kernels.grav_softening) and exactly Newtonian outside.  This module
provides the *exact* chunked all-pairs evaluation — the oracle the BH path is
validated against, and the production path for N up to ~1e5; `ops.bh_gravity`
provides the O(N log N) cell-hierarchy walk for larger N.

Softening follows the reference's receiver-side convention: q = r / h_i with
the receiving particle's smoothing length ("SUMMER_SPH - Variable.f90":298-301
uses p%s_length; the fixed-h generation uses the global h).  Note this makes
the softened force very slightly asymmetric when h_i != h_j, exactly as in
the reference.  The reference also adds 0.001*h to the *squared* distance
(SUMMER_SPH.f90:275 — dimensionally a bug, but tiny); we use a pure r > 0
guard instead, documented deviation.

Sink gravity (SUMMER_SPH.f90:559-591): direct, unsoftened 1/r^2, symmetric
gas<->sink plus sink<->sink pairs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Particles, Sinks
from ..utils.units import G
from ..utils.jax_utils import pick_block, row_blocks, unblock
from .kernels import grav_softening


def _direct_block(idx, p: Particles):
    xi = p.pos[idx]                            # [B, 3]
    hi = p.h[idx][:, None]
    dx = xi[:, None, :] - p.pos[None, :, :]    # [B, N, 3]
    r2 = jnp.sum(dx * dx, axis=-1)
    r = jnp.sqrt(r2)
    valid = p.alive[None, :] & (r > 0.0)
    f = grav_softening(r, hi)
    inv_r3 = jnp.where(valid, 1.0 / jnp.where(valid, r2 * r, 1.0), 0.0)
    m = jnp.where(valid, p.mass[None, :], 0.0)
    return -G * jnp.sum((m * f * inv_r3)[..., None] * dx, axis=-2)


def gas_gravity_direct(p: Particles, cfg: SimConfig) -> jax.Array:
    """Exact softened all-pairs gas-gas gravity, chunked over row blocks."""
    cap = p.capacity
    block = pick_block(cap, cap)
    blocks = row_blocks(cap, block)
    acc_b = jax.lax.map(partial(_direct_block, p=p), blocks)
    acc = unblock(acc_b, cap)
    return jnp.where(p.alive[:, None], acc, 0.0)


def sink_gravity(p: Particles, s: Sinks) -> Tuple[jax.Array, jax.Array]:
    """Direct gas<->sink and sink<->sink gravity (SUMMER_SPH.f90:559-591).

    Returns (acc_gas [N, 3], acc_sink [S, 3]).  Unsoftened 1/r^2 as in the
    reference; masked pairs and coincident points contribute zero.
    """
    dx = p.pos[:, None, :] - s.pos[None, :, :]      # [N, S, 3]
    r2 = jnp.sum(dx * dx, axis=-1)
    r = jnp.sqrt(r2)
    valid = p.alive[:, None] & s.alive[None, :] & (r > 0.0)
    w = jnp.where(valid, G / jnp.where(valid, r2 * r, 1.0), 0.0)  # G/r^3

    acc_gas = -jnp.sum((w * s.mass[None, :])[..., None] * dx, axis=1)
    acc_sink = jnp.sum((w * p.mass[:, None])[..., None] * dx, axis=0)

    # sink<->sink
    ds = s.pos[:, None, :] - s.pos[None, :, :]      # [S, S, 3]
    r2s = jnp.sum(ds * ds, axis=-1)
    rs = jnp.sqrt(r2s)
    vs = s.alive[:, None] & s.alive[None, :] & (rs > 0.0)
    ws = jnp.where(vs, G / jnp.where(vs, r2s * rs, 1.0), 0.0)
    acc_ss = -jnp.sum((ws * s.mass[None, :])[..., None] * ds, axis=1)

    return (
        jnp.where(p.alive[:, None], acc_gas, 0.0),
        jnp.where(s.alive[:, None], acc_sink + acc_ss, 0.0),
    )


__all__ = ["gas_gravity_direct", "sink_gravity"]

"""Self-gravity: softened gas-gas gravity and direct sink gravity.

Gas-gas gravity in the reference is a Barnes-Hut monopole walk with opening
angle theta (SUMMER_SPH.f90:249-290), softened within 2h by the spline factor
f(q) (ops.kernels.grav_softening) and exactly Newtonian outside.  This module
provides the *exact* chunked all-pairs evaluation — the oracle the scalable
path is validated against, and the production path for N up to ~1e5;
`ops.pm_gravity` provides the O(N log N) TreePM (FFT mesh + short-range)
replacement for larger N.

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


def _direct_block(idx, rows: Particles, cx, cy, cz, cm):
    xi = rows.pos[idx]                         # [B, 3]
    hi = rows.h[idx][:, None]
    dxx = xi[:, 0:1] - cx[None, :]             # [B, N]
    dxy = xi[:, 1:2] - cy[None, :]
    dxz = xi[:, 2:3] - cz[None, :]
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    r = jnp.sqrt(r2)
    valid = r > 0.0
    f = grav_softening(r, hi)
    inv_r3 = jnp.where(valid, 1.0 / jnp.where(valid, r2 * r, 1.0), 0.0)
    coef = -G * cm[None, :] * f * inv_r3
    return jnp.stack([jnp.sum(coef * dxx, axis=-1),
                      jnp.sum(coef * dxy, axis=-1),
                      jnp.sum(coef * dxz, axis=-1)], axis=-1)


def gas_gravity_direct(rows: Particles, cfg: SimConfig,
                       cols: Particles | None = None) -> jax.Array:
    """Exact softened all-pairs gas-gas gravity, chunked over row blocks."""
    cols = cols if cols is not None else rows
    cap = rows.capacity
    block = pick_block(cap, cols.capacity)
    blocks = row_blocks(cap, block)
    cm = jnp.where(cols.alive, cols.mass, 0.0)
    acc_b = jax.lax.map(
        partial(_direct_block, rows=rows, cx=cols.pos[:, 0],
                cy=cols.pos[:, 1], cz=cols.pos[:, 2], cm=cm),
        blocks)
    acc = unblock(acc_b, cap)
    return jnp.where(rows.alive[:, None], acc, 0.0)


def sink_gravity(p: Particles, s: Sinks,
                 axis_name: str | None = None) -> Tuple[jax.Array, jax.Array]:
    """Direct gas<->sink and sink<->sink gravity (SUMMER_SPH.f90:559-591).

    Returns (acc_gas [N, 3], acc_sink [S, 3]).  Unsoftened 1/r^2 as in the
    reference; masked pairs and coincident points contribute zero.

    Multi-chip: `p` may be a device-local shard while `s` is replicated —
    pass `axis_name` to psum the gas->sink pull across devices (the
    replicated sink<->sink part is not summed).
    """
    # [S, N] per-component layout: no [N, S, 3] intermediate (the minor-3
    # tensor costs full extra passes at N=1e6)
    S = s.capacity
    dxc = [s.pos[:, c][:, None] - p.pos[:, c][None, :] for c in range(3)]
    r2 = dxc[0] * dxc[0] + dxc[1] * dxc[1] + dxc[2] * dxc[2]
    valid = p.alive[None, :] & s.alive[:, None] & (r2 > 0.0)
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1.0e-12))
    w = jnp.where(valid, G * (inv_r * inv_r * inv_r), 0.0)  # G/r^3

    wm_s = w * s.mass[:, None]                      # [S, N]
    wm_p = w * jnp.where(p.alive, p.mass, 0.0)[None, :]
    acc_gas = jnp.stack([jnp.sum(wm_s * dxc[c], axis=0) for c in range(3)],
                        axis=-1)
    acc_sink = jnp.stack([-jnp.sum(wm_p * dxc[c], axis=1) for c in range(3)],
                         axis=-1)
    if axis_name is not None:
        acc_sink = jax.lax.psum(acc_sink, axis_name)

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

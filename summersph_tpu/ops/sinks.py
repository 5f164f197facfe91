"""Sink-particle lifecycle: accretion, creation, bounds culling.

All three are masked array ops over fixed-capacity state — the TPU-native
equivalent of the reference's mask + Fortran `pack` compaction
(SUMMER_SPH.f90:471-556, "SUMMER_SPH - Variable.f90":549-688).

Deliberate corrections of reference quirks (SURVEY.md §7 "reference quirks"):
* a gas particle inside two sinks' accretion radii is assigned to the
  *nearest* sink only — the reference computes per-sink masks independently
  and double-counts the mass (SUMMER_SPH.f90:494-514);
* the fixed-h generation's sink-distance formula `sum(sqrt(x^2 - s^2))`
  (SUMMER_SPH.f90:537) is wrong; we use the Euclidean distance the variable
  generation fixed it to ("SUMMER_SPH - Variable.f90":669);
* sink creation scans *all* candidates instead of aborting when the first
  over-dense particle sits near an existing sink ("SUMMER_SPH - Variable.f90"
  :564-566 returns from inside the loop);
* accreted angular momentum is tracked in `spin` — the reference leaves this
  as an acknowledged TODO (SUMMER_SPH.f90:509).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import PARK_POSITION, Particles, Sinks


def accrete(p: Particles, s: Sinks,
            axis_name: str | None = None) -> Tuple[Particles, Sinks]:
    """Sinks absorb gas within their accretion radius.

    Mass, momentum and angular momentum conserving: the sink moves to the
    combined centre of mass, takes the combined momentum
    (SUMMER_SPH.f90:484-515), and accumulates the accreted gas's angular
    momentum about the (old) sink position into `spin`.  Each gas particle is
    claimed by its nearest eligible sink.  Accreted gas slots are masked dead
    and parked.

    Multi-chip: `p` may be a device-local shard with `s` replicated — pass
    `axis_name` to psum the per-sink accretion sums across devices.
    """
    S = s.capacity
    # [S, N] layout (few sublanes, N on lanes): no [N, S, 3] intermediate,
    # and the per-sink sums are masked reduces instead of scatter-adds —
    # XLA scatter onto the 8 sink slots measured 51 ms/step at N=1e6.
    d2 = jnp.zeros((S, p.capacity), p.pos.dtype)
    for c in range(3):
        d = s.pos[:, c][:, None] - p.pos[:, c][None, :]
        d2 = d2 + d * d
    eligible = (p.alive[None, :] & s.alive[:, None]
                & (s.mass[:, None] > 0.0)
                & (d2 < (s.radius * s.radius)[:, None]))

    # Nearest eligible sink per particle.
    d2_masked = jnp.where(eligible, d2, jnp.inf)
    nearest = jnp.argmin(d2_masked, axis=0)             # [N]
    accreted = jnp.any(eligible, axis=0)
    claim = eligible & (jnp.arange(S, dtype=nearest.dtype)[:, None]
                        == nearest[None, :])            # [S, N]

    m = jnp.where(accreted, p.mass, 0.0)
    w = jnp.where(claim, m[None, :], 0.0)               # [S, N]
    msum = jnp.sum(w, axis=1)

    def sink_field_at_gas(f):                           # [S] -> [N]
        return jnp.sum(jnp.where(claim, f[:, None], 0.0), axis=0)

    px = [p.pos[:, c] for c in range(3)]
    vx = [p.vel[:, c] for c in range(3)]
    psum = jnp.stack([jnp.sum(w * vx[c][None, :], axis=1) for c in range(3)],
                     axis=-1)
    xsum = jnp.stack([jnp.sum(w * px[c][None, :], axis=1) for c in range(3)],
                     axis=-1)
    # Angular momentum of accreted gas about the sink's pre-accretion frame.
    rx = [px[c] - sink_field_at_gas(s.pos[:, c]) for c in range(3)]
    rv = [vx[c] - sink_field_at_gas(s.vel[:, c]) for c in range(3)]
    cross = (rx[1] * rv[2] - rx[2] * rv[1],
             rx[2] * rv[0] - rx[0] * rv[2],
             rx[0] * rv[1] - rx[1] * rv[0])
    lsum = jnp.stack([jnp.sum(w * cross[c][None, :], axis=1)
                      for c in range(3)], axis=-1)

    if axis_name is not None:
        msum, psum, xsum, lsum = jax.lax.psum(
            (msum, psum, xsum, lsum), axis_name)

    new_mass = s.mass + msum
    grew = msum > 0.0
    inv = jnp.where(grew, 1.0 / jnp.where(grew, new_mass, 1.0), 0.0)
    new_pos = jnp.where(grew[:, None],
                        (s.mass[:, None] * s.pos + xsum) * inv[:, None], s.pos)
    new_vel = jnp.where(grew[:, None],
                        (s.mass[:, None] * s.vel + psum) * inv[:, None], s.vel)

    s = s.replace(mass=new_mass, pos=new_pos, vel=new_vel, spin=s.spin + lsum)
    p = p.replace(
        alive=p.alive & ~accreted,
        mass=jnp.where(accreted, 0.0, p.mass),
        pos=jnp.where(accreted[:, None], PARK_POSITION, p.pos),
        vel=jnp.where(accreted[:, None], 0.0, p.vel),
    )
    return p, s


def create_sinks(p: Particles, s: Sinks, cfg: SimConfig,
                 axis_name: str | None = None) -> Tuple[Sinks, jax.Array]:
    """Spawn a sink at the densest eligible particle, if any.

    Eligibility ("SUMMER_SPH - Variable.f90":549-597): the dimensionless
    density m (eta/h)^3 exceeds `sink_create_density`, and the particle is
    not within (radius_j + 2 h_i) of any live sink.  At most one sink is
    created per call (as in the reference); the seed sink gets the particle's
    position/velocity, accretion radius 2h, and a tiny seed mass — the gas
    particle itself is left alive and is captured by the new sink on the next
    accretion pass, exactly as in the reference.

    Returns (sinks, slots_full) where slots_full is int32 1 when an eligible
    creation found every sink slot occupied — surfaced through
    SimState.stats ("sink_slots_full") because silently skipping creation
    leaves runaway-dense gas with no sink to absorb it (the round-2
    4096-particle collapse froze exactly this way).
    """
    code_density = p.mass * (cfg.eta / p.h) ** 3
    d2 = jnp.zeros((s.capacity, p.capacity), p.pos.dtype)
    for c in range(3):
        d = s.pos[:, c][:, None] - p.pos[:, c][None, :]
        d2 = d2 + d * d
    reach = s.radius[:, None] + 2.0 * p.h[None, :]
    # Only *real* sinks exclude creation.  The zero-mass dummy sink the
    # reference reader plants at the origin when an IC has no sink rows
    # (SUMMER_SPH.f90:698-707) is a file-format placeholder, not a physical
    # object — the reference's scan does test it too (V:562-566), but
    # letting it veto creation would forbid a sink ever forming at the
    # centre of a centred collapse, the flagship use of sink creation.
    # Deliberate deviation, documented.
    real = s.alive & (s.mass > 0)
    near_sink = jnp.any(real[:, None] & (d2 < reach * reach), axis=0)
    eligible = p.alive & (code_density > cfg.sink_create_density) & ~near_sink

    has_any = jnp.any(eligible)
    best = jnp.argmax(jnp.where(eligible, code_density, -jnp.inf))

    # Candidate fields of the local best (garbage when !has_any, gated below).
    best_val = jnp.where(has_any, code_density[best], -jnp.inf)
    cand_pos, cand_vel, cand_h = p.pos[best], p.vel[best], p.h[best]
    if axis_name is not None:
        # Pick the globally densest candidate: gather every device's local
        # best and select identically on all of them (s is replicated).
        vals = jax.lax.all_gather(best_val, axis_name)       # [D]
        poss = jax.lax.all_gather(cand_pos, axis_name)       # [D, 3]
        vels = jax.lax.all_gather(cand_vel, axis_name)
        hs = jax.lax.all_gather(cand_h, axis_name)
        widx = jnp.argmax(vals)
        has_any = jnp.isfinite(vals[widx]) & (vals[widx] > -jnp.inf)
        cand_pos, cand_vel, cand_h = poss[widx], vels[widx], hs[widx]

    free = ~s.alive
    has_slot = jnp.any(free)
    slot = jnp.argmax(free)

    do = has_any & has_slot
    write = jnp.zeros((s.capacity,), bool).at[slot].set(do)
    s = s.replace(
        alive=s.alive | write,
        pos=jnp.where(write[:, None], cand_pos, s.pos),
        vel=jnp.where(write[:, None], cand_vel, s.vel),
        acc=jnp.where(write[:, None], 0.0, s.acc),
        spin=jnp.where(write[:, None], 0.0, s.spin),
        mass=jnp.where(write, cfg.sink_create_mass, s.mass),
        radius=jnp.where(write, 2.0 * cand_h, s.radius),
    )
    return s, (has_any & ~has_slot).astype(jnp.int32)


def merge_sinks(s: Sinks, cfg: SimConfig) -> Tuple[Sinks, jax.Array]:
    """Merge sinks that have fallen inside each other's accretion radii.

    The reference *intends* this — `check_sink_merger` exists as an empty
    stub ("SUMMER_SPH - Variable.f90":1067-1073) — but never implements it,
    so close sink pairs stay separate forever and a fragmenting collapse
    saturates any fixed sink budget (measured: the gamma=1.1 N=65536 TPU
    shakedown fills 64 slots by ~1.2 t_ff).  Enabled when
    `cfg.sink_merge_factor > 0`: sinks i, j merge when their separation is
    below `sink_merge_factor * min(radius_i, radius_j)`.

    Conserving: the merged sink carries the combined mass, centre-of-mass
    position/velocity, the larger accretion radius, and the total angular
    momentum (spins + orbital L about the new COM folded into `spin`).

    Deterministic one-pass resolution: every sink points at its
    lowest-index eligible partner (or itself), and pointer-jumping
    (log2 S fixed iterations) collapses chains onto component minima.  A
    component with several *non-adjacent* local minima merges into one
    cluster per minimum this step and coalesces fully on subsequent steps
    (radii and positions update in between) — each pass is individually
    conservative.  Sinks are replicated under sharding, so the same merge
    happens identically on every device with no collectives.

    Returns (sinks, n_merged) where n_merged counts absorbed sinks.
    """
    S = s.capacity
    real = s.alive & (s.mass > 0.0)
    d2 = jnp.zeros((S, S), s.pos.dtype)
    for c in range(3):
        d = s.pos[:, c][:, None] - s.pos[:, c][None, :]
        d2 = d2 + d * d
    idx = jnp.arange(S, dtype=jnp.int32)
    rmin = jnp.minimum(s.radius[:, None], s.radius[None, :])
    thresh = cfg.sink_merge_factor * rmin
    pair = (real[:, None] & real[None, :]
            & (d2 < thresh * thresh)
            & (idx[:, None] != idx[None, :]))

    partner_min = jnp.min(jnp.where(pair, idx[None, :], S), axis=1)
    target = jnp.minimum(idx, partner_min).astype(jnp.int32)
    for _ in range(max(1, S.bit_length())):
        target = target[target]

    absorbed = real & (target != idx)
    # claim[r, j]: sink j (including j == r itself) contributes to root r
    claim = real[None, :] & (idx[:, None] == target[None, :])
    w = jnp.where(claim, s.mass[None, :], 0.0)            # [S, S]
    msum = jnp.sum(w, axis=1)
    xsum = jnp.einsum("rj,jc->rc", w, s.pos)
    vsum = jnp.einsum("rj,jc->rc", w, s.vel)

    merged = msum > 0.0
    inv = jnp.where(merged, 1.0 / jnp.where(merged, msum, 1.0), 0.0)
    com_pos = xsum * inv[:, None]
    com_vel = vsum * inv[:, None]

    # Total L about the new COM: spins + orbital terms of every member.
    rel_x = s.pos[None, :, :] - com_pos[:, None, :]       # [S, S, 3]
    rel_v = s.vel[None, :, :] - com_vel[:, None, :]
    orb = jnp.cross(rel_x, rel_v)                         # [S, S, 3]
    lsum = (jnp.einsum("rj,jc->rc", jnp.where(claim, 1.0, 0.0), s.spin)
            + jnp.sum(w[:, :, None] * orb, axis=1))
    rad = jnp.max(jnp.where(claim, s.radius[None, :], 0.0), axis=1)

    # Roots take the merged fields; absorbed slots die (free for creation).
    root = real & ~absorbed
    upd = root & merged
    s = s.replace(
        alive=s.alive & ~absorbed,
        mass=jnp.where(absorbed, 0.0, jnp.where(upd, msum, s.mass)),
        pos=jnp.where(absorbed[:, None], PARK_POSITION,
                      jnp.where(upd[:, None], com_pos, s.pos)),
        vel=jnp.where(absorbed[:, None], 0.0,
                      jnp.where(upd[:, None], com_vel, s.vel)),
        spin=jnp.where(absorbed[:, None], 0.0,
                       jnp.where(upd[:, None], lsum, s.spin)),
        radius=jnp.where(absorbed, 0.0, jnp.where(upd, rad, s.radius)),
    )
    return s, jnp.sum(absorbed).astype(jnp.int32)


def cull_bounds(p: Particles, s: Sinks, cfg: SimConfig) -> Tuple[Particles, Sinks]:
    """Mask out particles (and sinks, V:599-614) outside the bounding box."""
    keep_p = p.alive & jnp.all(jnp.abs(p.pos) <= cfg.bounding_size, axis=-1)
    gone_p = p.alive & ~keep_p
    p = p.replace(
        alive=keep_p,
        mass=jnp.where(gone_p, 0.0, p.mass),
        pos=jnp.where(gone_p[:, None], PARK_POSITION, p.pos),
        vel=jnp.where(gone_p[:, None], 0.0, p.vel),
    )
    keep_s = s.alive & jnp.all(jnp.abs(s.pos) <= cfg.bounding_size, axis=-1)
    gone_s = s.alive & ~keep_s
    s = s.replace(
        alive=keep_s,
        mass=jnp.where(gone_s, 0.0, s.mass),
        pos=jnp.where(gone_s[:, None], PARK_POSITION, s.pos),
        vel=jnp.where(gone_s[:, None], 0.0, s.vel),
    )
    return p, s


__all__ = ["accrete", "create_sinks", "merge_sinks", "cull_bounds"]

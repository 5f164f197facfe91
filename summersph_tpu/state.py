"""Simulation state pytrees.

The reference stores particles as a Fortran array-of-structs (`type particle`,
/root/reference/SUMMER_SPH.f90:14-37) and deletes particles by `pack`-ing the
array (SUMMER_SPH.f90:471-482), which changes N every step.  On TPU, dynamic
shapes force recompilation, so the engine uses fixed-capacity struct-of-arrays
with an `alive` mask:

* dead particles have mass = 0 (so every mass-weighted pair sum they appear in
  vanishes identically), are parked at ``PARK_POSITION`` far outside any
  physical domain (so they never enter a live particle's neighbour stencil),
  and have their own dynamics frozen by masking in the integrator;
* "deleting" a particle (bounds cull SUMMER_SPH.f90:471-482, sink accretion
  SUMMER_SPH.f90:484-556) just clears its mask bit — shapes never change.

All arrays share a configurable dtype (float32 default; float64 supported for
CPU validation runs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

# Where dead particles are parked.  Finite (no inf arithmetic), far outside
# any physical domain (reference bounding boxes are O(10^3) AU).
PARK_POSITION = 1.0e12


@struct.dataclass
class Particles:
    """SoA gas-particle state (reference `type particle`, SUMMER_SPH.f90:14-27).

    Fields mirror the reference struct: mass, density, internal_energy (u),
    pressure, sound_speed (cs), internal_energy_rate (du), alpha/alpha_rate
    (Morris-Monaghan viscosity switch), position/velocity/acceleration, plus
    the variable-h generation's s_length (h) and omega (grad-h term,
    "SUMMER_SPH - Variable.f90":24-25).  `alive` replaces Fortran pack().
    """

    pos: jax.Array        # [N, 3]
    vel: jax.Array        # [N, 3]
    acc: jax.Array        # [N, 3]
    mass: jax.Array       # [N]
    u: jax.Array          # [N] specific internal energy
    rho: jax.Array        # [N] density
    pressure: jax.Array   # [N]
    cs: jax.Array         # [N] sound speed
    du: jax.Array         # [N] du/dt
    alpha: jax.Array      # [N] AV switch alpha
    dalpha: jax.Array     # [N] dalpha/dt
    h: jax.Array          # [N] smoothing length
    omega: jax.Array      # [N] grad-h Omega correction
    alive: jax.Array      # [N] bool
    pid: jax.Array        # [N] int32 stable particle id (reference `number`
                          # field, SUMMER_SPH.f90:15 — survives re-sorting)
    # Optional Kahan carry for the u kick (None = plain f32 accumulation).
    # The reference integrates u in f64 (SUMMER_SPH.f90:6); at f32, 1e5
    # steps of u += du*dt/2 random-walk ~sqrt(2e5)*eps ~ 3e-5 relative —
    # the carry recovers ~f64-quality accumulation for one extra sort
    # operand.  Enable with cfg.kahan_u (integrate.kick).
    u_c: Optional[jax.Array] = None
    # Optional held long-range PM acceleration [N, 3] (cfg.pm_every > 1):
    # the far-field force varies on the dynamical time, not the Courant
    # time, so it is recomputed every pm_every-th step and HELD in between
    # (RESPA / Gadget-style long-range subcycling — the short-range pair
    # complement stays per-step).  Rides the SFC sort like u_c (three
    # extra sort operands); None = literal per-step reference behaviour
    # (SUMMER_SPH.f90:818-829 evaluates gravity every step).
    acc_ext: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    @classmethod
    def zeros(cls, capacity: int, dtype=jnp.float32) -> "Particles":
        z = jnp.zeros((capacity,), dtype)
        z3 = jnp.zeros((capacity, 3), dtype)
        return cls(
            pos=jnp.full((capacity, 3), PARK_POSITION, dtype),
            vel=z3, acc=z3,
            mass=z, u=z, rho=z, pressure=z, cs=z, du=z,
            alpha=z, dalpha=z,
            h=jnp.ones((capacity,), dtype),
            omega=jnp.ones((capacity,), dtype),
            alive=jnp.zeros((capacity,), bool),
            pid=jnp.arange(capacity, dtype=jnp.int32),
        )

    @classmethod
    def create(
        cls,
        pos,
        vel,
        mass,
        u,
        alpha=0.1,
        h=1.0,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "Particles":
        """Build a live particle set, optionally padded to `capacity` slots."""
        pos = jnp.asarray(pos, dtype)
        n = pos.shape[0]
        cap = capacity if capacity is not None else n
        if cap < n:
            raise ValueError(f"capacity {cap} < particle count {n}")

        def pad1(x, fill=0.0):
            x = jnp.broadcast_to(jnp.asarray(x, dtype), (n,))
            return jnp.concatenate([x, jnp.full((cap - n,), fill, dtype)])

        def pad3(x, fill=0.0):
            x = jnp.broadcast_to(jnp.asarray(x, dtype), (n, 3))
            return jnp.concatenate([x, jnp.full((cap - n, 3), fill, dtype)])

        p = cls.zeros(cap, dtype)
        return p.replace(
            pos=pad3(pos, PARK_POSITION),
            vel=pad3(jnp.asarray(vel, dtype)),
            mass=pad1(jnp.asarray(mass, dtype)),
            u=pad1(jnp.asarray(u, dtype)),
            alpha=pad1(alpha),
            h=pad1(h, fill=1.0),
            alive=jnp.arange(cap) < n,
        )


@struct.dataclass
class Sinks:
    """SoA sink-particle state (reference `type sink`, SUMMER_SPH.f90:30-37).

    Fixed small capacity; `alive` gates both existing sinks and free slots for
    sink creation ("SUMMER_SPH - Variable.f90":549-597).
    """

    pos: jax.Array      # [S, 3]
    vel: jax.Array      # [S, 3]
    acc: jax.Array      # [S, 3]
    spin: jax.Array     # [S, 3] (accreted angular momentum tracking)
    mass: jax.Array     # [S]
    radius: jax.Array   # [S] accretion radius
    alive: jax.Array    # [S] bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    @classmethod
    def zeros(cls, capacity: int, dtype=jnp.float32) -> "Sinks":
        z = jnp.zeros((capacity,), dtype)
        z3 = jnp.zeros((capacity, 3), dtype)
        return cls(
            pos=jnp.full((capacity, 3), PARK_POSITION, dtype),
            vel=z3, acc=z3, spin=z3,
            mass=z, radius=z,
            alive=jnp.zeros((capacity,), bool),
        )

    @classmethod
    def create(cls, pos, vel, mass, radius, capacity: Optional[int] = None,
               dtype=jnp.float32) -> "Sinks":
        pos = jnp.atleast_2d(jnp.asarray(pos, dtype))
        n = pos.shape[0]
        cap = capacity if capacity is not None else n
        if cap < n:
            raise ValueError(f"capacity {cap} < sink count {n}")
        s = cls.zeros(cap, dtype)
        pad = cap - n

        def pad1(x):
            x = jnp.broadcast_to(jnp.asarray(x, dtype), (n,))
            return jnp.concatenate([x, jnp.zeros((pad,), dtype)])

        return s.replace(
            pos=jnp.concatenate([pos, jnp.full((pad, 3), PARK_POSITION, dtype)]),
            vel=jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(vel, dtype), (n, 3)),
                 jnp.zeros((pad, 3), dtype)]),
            mass=pad1(mass),
            radius=pad1(radius),
            alive=jnp.arange(cap) < n,
        )


# SimState.stats slot names: per-step health counters, written inside the
# jitted step and surfaced host-side by simulate() so a distribution that
# outgrows the static windows degrades *loudly* mid-run (VERDICT round 1:
# coverage was checked only at t=0).  `nonfinite` counts live particles
# whose u/pos/vel went non-finite this step (round 2's config-5 run scanned
# 55 segments of NaN without noticing — drivers must abort on this one);
# `sink_slots_full` counts steps where an eligible sink creation found no
# free slot (silent saturation froze the round-2 4096-particle collapse).
# `decomp_pressure` (slab decomposition only, parallel.decomp) sums the
# decomposition's fixed-capacity pressure events this step: migrants kept
# home because a chunk filled, live rows dropped because a slab filled,
# and own rows whose stencil outreached a truncated rim — all mean the
# decomp knobs (migrate_rows / halo_rows / capacity headroom) need raising.
STATS_FIELDS = ("sph_window_overflow", "sph_clamped",
                "grav_window_overflow", "h_unconverged",
                "nonfinite", "sink_slots_full", "decomp_pressure")


@struct.dataclass
class SimState:
    """Full simulation state: particles + sinks + (t, dt) scalars +
    per-step coverage counters (`stats`, int32[len(STATS_FIELDS)])."""

    particles: Particles
    sinks: Sinks
    t: jax.Array    # scalar simulation time
    dt: jax.Array   # scalar timestep
    stats: jax.Array  # int32[len(STATS_FIELDS)]
    # Optional held PM split scale (cfg.pm_every > 1): the short-range pair
    # complement must use the SAME r_s the held long-range force was built
    # with, or the force split double-counts the band between the two
    # scales.  <= 0 means "no valid held force" (freshly initialised /
    # resumed) and forces a recompute.  None when pm_every == 1.
    pm_r_s: Optional[jax.Array] = None

    @classmethod
    def create(cls, particles: Particles, sinks: Sinks, t=0.0, dt=1.0e-2) -> "SimState":
        dtype = particles.pos.dtype
        return cls(
            particles=particles,
            sinks=sinks,
            t=jnp.asarray(t, dtype),
            dt=jnp.asarray(dt, dtype),
            stats=jnp.zeros((len(STATS_FIELDS),), jnp.int32),
        )

    def stats_dict(self):
        """Host-side view of the coverage counters."""
        import numpy as np
        vals = np.asarray(self.stats)
        return dict(zip(STATS_FIELDS, (int(v) for v in vals)))


def compact(particles: Particles) -> Particles:
    """Host-side defragmentation: move live particles to the front.

    Optional — the engine is correct without it; compaction just improves
    cell-grid occupancy after heavy accretion/culling.  Not jittable (uses
    host round-trip ordering); call between jitted segments.
    """
    order = jnp.argsort(~particles.alive, stable=True)
    return jax.tree_util.tree_map(lambda a: a[order], particles)


__all__ = ["Particles", "Sinks", "SimState", "PARK_POSITION", "STATS_FIELDS",
           "compact"]

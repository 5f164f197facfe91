"""Disc / sphere initial conditions (graded configs 3-5).

TPU-native, runnable equivalent of the reference's `Disc_ICs.py` fragment
(/root/reference/Disc_ICs.py:1-41 — which documents format and intent but is
missing imports and has `r` undefined at :22).  Reproduces its recipe:
rejection-sample N points uniformly in a sphere R <= R_max, azimuthal
velocity field v = v_circ * (-y, x, 0)/r_cyl, u = 0.25, m = M_disc/N,
alpha = 0.1 — plus the extensions the graded configs need: a thin disc
variant, Keplerian rotation about a central sink (README.md:21-23), and a
non-rotating collapse sphere.
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..state import Particles, SimState, Sinks
from ..utils.units import G


def _uniform_sphere(n: int, r_max: float, rng: np.random.Generator):
    """Vectorised rejection sampling of n points uniform in a ball."""
    pts = np.empty((0, 3))
    while len(pts) < n:
        cand = 2.0 * r_max * (rng.random((2 * n, 3)) - 0.5)
        keep = np.sum(cand ** 2, axis=1) <= r_max ** 2
        pts = np.concatenate([pts, cand[keep]])
    return pts[:n]


def disc_ic(
    n: int = 12000,
    r_max: float = 100.0,
    m_disc: float = 5.0,
    m_star: float = 5.0,
    u0: float = 0.25,
    alpha0: float = 0.1,
    rotation: str = "keplerian",   # 'keplerian' | 'rigid' | 'none'
    v_circ: float = 1.0,           # speed for 'rigid' (Disc_ICs.py:21-24)
    aspect: float = 1.0,           # z flattening: 1 = sphere, <1 = disc
    h0: float = 2.5,
    sink_radius: float = 3.5,
    cfg: SimConfig | None = None,
    capacity: int | None = None,
    sink_capacity: int | None = None,
    seed: int = 0,
):
    """Build a (rotating) disc/sphere of gas with an optional central sink.

    rotation='keplerian' gives v_phi = sqrt(G*(m_star)/r_cyl) around a
    central sink of mass m_star (README.md:21-23 config); 'rigid' reproduces
    Disc_ICs.py's constant-speed azimuthal field; 'none' + m_star=0 is the
    collapse sphere.  Returns (SimState, SimConfig).
    """
    cfg = cfg or SimConfig(
        fixed_h=h0, gravity="none", gamma=1.4,
        bounding_size=max(15.0 * r_max, 1500.0),
        end_time=100.0, sink_radius=sink_radius,
    )
    rng = np.random.default_rng(seed)
    pos = _uniform_sphere(n, r_max, rng)
    pos[:, 2] *= aspect

    r_cyl = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    r_safe = np.maximum(r_cyl, 1.0e-8 * r_max)
    if rotation == "keplerian":
        vmag = np.sqrt(G * max(m_star, 1.0e-30) / r_safe)
    elif rotation == "rigid":
        vmag = np.full(n, v_circ)
    elif rotation == "rigidbody":
        # true solid-body rotation (constant Omega = v_circ / r_max):
        # the reference recipe's constant-speed field (Disc_ICs.py:21-24)
        # diverges in angular velocity at the axis, which shock-compresses
        # the axis into a spurious sink-creation storm in cold-collapse ICs
        vmag = v_circ * r_cyl / r_max
    elif rotation == "none":
        vmag = np.zeros(n)
    else:
        raise ValueError(f"unknown rotation mode {rotation!r}")
    vel = np.stack([-vmag * pos[:, 1] / r_safe,
                    vmag * pos[:, 0] / r_safe,
                    np.zeros(n)], axis=1)

    p = Particles.create(
        pos=pos, vel=vel, mass=np.full(n, m_disc / n),
        u=np.full(n, u0), alpha=np.full(n, alpha0),
        h=h0 if cfg.fixed_h is not None else h0,
        capacity=capacity, dtype=cfg.np_dtype(),
    )
    scap = sink_capacity if sink_capacity is not None else cfg.sink_capacity
    if m_star > 0:
        s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                         mass=[m_star], radius=[sink_radius],
                         capacity=scap, dtype=cfg.np_dtype())
    else:
        s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                         mass=[0.0], radius=[0.0],
                         capacity=scap, dtype=cfg.np_dtype())
    return SimState.create(p, s, dt=cfg.dt_init), cfg


def collapse_ic(n: int = 20000, r_max: float = 100.0, m_total: float = 5.0,
                **kw):
    """Self-gravitating collapse sphere ("Collapse.txt" intent,
    Disc_ICs.py:40)."""
    kw.setdefault("rotation", "rigid")
    kw.setdefault("m_star", 0.0)
    return disc_ic(n=n, r_max=r_max, m_disc=m_total, **kw)


__all__ = ["disc_ic", "collapse_ic"]

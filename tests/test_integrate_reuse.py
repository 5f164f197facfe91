"""Carried-rate KDK (cfg.reuse_forces) vs the literal two-evaluation
reference schedule (SUMMER_SPH.f90:895-912).

With no step epilogue mutating force inputs (fixed h, no accretion), the two
schedules evaluate identical forces at identical positions, so trajectories
must agree to round-off.  With the full epilogue (variable h, sinks), the
carried rates predate the h update by one half-kick — the schedules must
stay close over a multi-step run at ordinary timesteps.
"""

import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import prime, run_steps
from summersph_tpu.models.disc import disc_ic
from summersph_tpu.state import SimState, Sinks

from test_density_forces import lattice_particles


def _run(state, cfg, n):
    if cfg.reuse_forces:
        state = prime(state, cfg)
    return run_steps(state, cfg, n)


def _by_pid(p, arr):
    order = np.argsort(np.asarray(p.pid))
    a = np.asarray(arr)
    return a[order]


def test_reuse_identical_when_epilogue_inert():
    # Fixed h, dense neighbours (no sort -> no permutation), no sinks firing:
    # the carried rates equal the rates the two-eval schedule recomputes, so
    # the trajectories agree to f32 round-off (prime() is jitted separately,
    # so fusion/rounding differs in the last ulp and accumulates slightly).
    p = lattice_particles(nside=6, spacing=1.0, h=1.3, jitter=0.2)
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[0.0], radius=[0.0])
    cfg = SimConfig(fixed_h=1.3, neighbor_mode="dense", gravity="none",
                    bounding_size=1e6, dt_init=1e-4, dt_min=1e-6, dt_max=1e-3)
    state = SimState.create(p, s, dt=1e-4)

    out_r = _run(state, cfg.with_(reuse_forces=True), 10)
    out_2 = _run(state, cfg.with_(reuse_forces=False), 10)

    np.testing.assert_allclose(_by_pid(out_r.particles, out_r.particles.pos),
                               _by_pid(out_2.particles, out_2.particles.pos),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_by_pid(out_r.particles, out_r.particles.vel),
                               _by_pid(out_2.particles, out_2.particles.vel),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out_r.t), float(out_2.t), rtol=1e-7)


def test_reuse_close_with_full_epilogue():
    # Variable h + central sink + sorted engine: the carried rates lag the
    # h update by one half-kick; over 20 steps of a Keplerian disc the two
    # schedules stay within a small relative tolerance.
    cfg = SimConfig(fixed_h=None, eta=1.2, gravity="none",
                    neighbor_mode="sorted", sorted_block=64, window_blocks=4,
                    h_iter_max=3, bounding_size=1e4,
                    dt_init=5e-5, dt_min=1e-7, dt_max=5e-4)
    state, _ = disc_ic(n=512, r_max=50.0, m_star=5.0, h0=6.0,
                       rotation="keplerian", cfg=cfg, seed=2)

    out_r = _run(state, cfg.with_(reuse_forces=True), 20)
    out_2 = _run(state, cfg.with_(reuse_forces=False), 20)

    pos_r = _by_pid(out_r.particles, out_r.particles.pos)
    pos_2 = _by_pid(out_2.particles, out_2.particles.pos)
    # particle radii are O(10-50); absolute position drift stays tiny
    assert float(out_r.t) > 0
    np.testing.assert_allclose(float(out_r.t), float(out_2.t), rtol=1e-6)
    err = np.linalg.norm(pos_r - pos_2, axis=1)
    scale = np.linalg.norm(pos_2, axis=1).mean()
    assert np.max(err) / scale < 2e-3, np.max(err) / scale

    h_r = _by_pid(out_r.particles, out_r.particles.h)
    h_2 = _by_pid(out_2.particles, out_2.particles.h)
    np.testing.assert_allclose(h_r, h_2, rtol=5e-3)

"""SFC-sorted window engine: parity vs dense oracle, window coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import force_eval, step
from summersph_tpu.ops.sorted_grid import sort_particles, sorted_density
from summersph_tpu.state import Particles, SimState, Sinks

from test_density_forces import lattice_particles


def _by_pid(p, arr):
    order = np.argsort(np.asarray(p.pid))
    return np.asarray(arr)[order]


def test_sorted_matches_dense_force_eval():
    p = lattice_particles(nside=7, spacing=1.0, h=1.3, jitter=0.25)
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[0.0], radius=[0.0])
    cfg_d = SimConfig(fixed_h=None, neighbor_mode="dense")
    cfg_s = cfg_d.with_(neighbor_mode="sorted", sorted_block=64,
                        window_blocks=2)

    pd, _, _ = force_eval(p, s, cfg_d)
    ps, _, _ = force_eval(p, s, cfg_s)

    # The sorted path returns padded arrays (dead slots, pids past capacity,
    # sorted to the end of the pid order) — compare the real slots only.
    cap = p.capacity
    assert np.asarray(ps.alive).sum() == np.asarray(pd.alive).sum()
    for field in ("rho", "omega", "pressure", "du", "dalpha"):
        np.testing.assert_allclose(
            _by_pid(ps, getattr(ps, field))[:cap],
            _by_pid(pd, getattr(pd, field)),
            rtol=2e-4, atol=1e-6, err_msg=field)
    np.testing.assert_allclose(_by_pid(ps, ps.acc)[:cap], _by_pid(pd, pd.acc),
                               rtol=2e-4, atol=1e-6)


def test_sorted_no_window_overflow_on_lattice():
    p = lattice_particles(nside=8, spacing=1.0, h=1.2, jitter=0.2)
    cfg = SimConfig(fixed_h=1.2, neighbor_mode="sorted", sorted_block=64,
                    window_blocks=2)
    p2, grid = sort_particles(p, cfg)
    assert int(grid.n_window_overflow) == 0
    assert int(grid.n_clamped) == 0
    # keys are sorted, live first
    k = np.asarray(grid.key)
    assert np.all(np.diff(k) >= 0)


def test_sorted_density_with_dead_particles():
    p = lattice_particles(nside=6, spacing=1.0, h=1.3, jitter=0.1)
    n = p.capacity
    from summersph_tpu.state import PARK_POSITION
    alive = jnp.arange(n) % 3 != 0
    p = p.replace(alive=alive, mass=jnp.where(alive, p.mass, 0.0),
                  pos=jnp.where(alive[:, None], p.pos, PARK_POSITION))
    cfg = SimConfig(fixed_h=1.3, neighbor_mode="sorted")
    p2, grid = sort_particles(p, cfg)
    p2 = sorted_density(p2, cfg, grid)
    rho = np.asarray(p2.rho)
    al = np.asarray(p2.alive)
    assert np.isfinite(rho).all()
    assert (rho[al] > 0).all()
    assert int(al.sum()) == int(np.asarray(alive).sum())


def test_sorted_step_runs_and_conserves_mass():
    cfg = SimConfig(fixed_h=2.0, neighbor_mode="sorted", gravity="direct",
                    bounding_size=1.0e6, dt_init=1e-4)
    p = lattice_particles(nside=6, spacing=1.0, h=2.0, jitter=0.2)
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[0.0], radius=[0.0])
    state = SimState.create(p, s, dt=1e-4)
    m0 = float(jnp.sum(jnp.where(p.alive, p.mass, 0.0)))
    st = state
    for _ in range(3):
        st = jax.jit(lambda x: step(x, cfg))(st)
    assert np.isfinite(np.asarray(st.particles.vel)).all()
    m1 = float(jnp.sum(jnp.where(st.particles.alive, st.particles.mass, 0.0)))
    np.testing.assert_allclose(m1, m0, rtol=1e-6)


def test_window_overflow_trips_midrun_on_clustering():
    """A clustered distribution with undersized windows must surface
    dropped candidates through SimState.stats during stepping, and
    warn_stats must report it (runtime coverage monitoring — the sorted
    engine's replacement for the reference tree's adaptive guarantee)."""
    from summersph_tpu.integrate import prime, run_steps, warn_stats
    from test_gravity import clustered_cloud

    p = clustered_cloud(n=768)
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[0.0], radius=[0.0])
    cfg = SimConfig(fixed_h=2.0, neighbor_mode="sorted", sorted_block=128,
                    window_group=32, window_blocks=1, gravity="none",
                    dt_init=1e-6, dt_max=1e-5, bounding_size=1.0e5)
    state = SimState.create(p, s, dt=1e-6)
    state = prime(state, cfg)
    state = run_steps(state, cfg, 2)
    assert int(state.stats_dict()["sph_window_overflow"]) > 0
    assert warn_stats(state) is True

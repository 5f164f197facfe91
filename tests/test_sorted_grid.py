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


def test_quantile_cells_match_dense_when_tail_clamped():
    """cell_h_quantile < 1 with a wide-h TAIL: the big-h particles are
    counted in n_clamped (their reach exceeds the +-1-cell stencil) and
    the BULK's density is still exact vs the dense oracle (the adaptive
    cells cover every pair among bulk particles)."""
    p = lattice_particles(nside=7, spacing=1.0, h=1.3, jitter=0.25)
    # give 3 particles a rim-like oversized h (the capped-tail shape of a
    # collapse); everyone else stays at the bulk h
    h = np.full(p.capacity, 1.3, np.float32)
    big = [0, 5, 11]
    h[big] = 5.0
    p = p.replace(h=jnp.asarray(h))

    cfg_q = SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=64,
                      window_blocks=3, cell_h_quantile=0.9)
    p2, grid = sort_particles(p, cfg_q, h_pad=1.0)
    # cells sized by p90 of h = 1.3, so the 3 big-h particles lose reach
    assert float(grid.cell_size) <= 2.0 * 1.3 + 1e-5
    assert int(grid.n_clamped) >= len(big)

    p2 = sorted_density(p2, cfg_q, grid)
    cfg_d = SimConfig(fixed_h=None, neighbor_mode="dense")
    from summersph_tpu.ops.density import compute_density
    pd = compute_density(p, cfg_d)
    rho_q = _by_pid(p2, p2.rho)[:p.capacity]
    rho_d = _by_pid(pd, pd.rho)
    bulk = np.ones(p.capacity, bool)
    bulk[big] = False
    np.testing.assert_allclose(rho_q[bulk], rho_d[bulk], rtol=2e-4)
    # the clamped tail keeps its (exact) self term at minimum
    assert (rho_q[~bulk] > 0).all()


def test_quantile_cells_default_is_exact_hmax():
    """cell_h_quantile=1.0 (default) must reproduce the h_max sizing."""
    p = lattice_particles(nside=6, spacing=1.0, h=1.4, jitter=0.2)
    cfg = SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=64)
    _, g1 = sort_particles(p, cfg, h_pad=1.2)
    np.testing.assert_allclose(float(g1.cell_size), 2.0 * 1.4 * 1.2,
                               rtol=1e-6)
    assert int(g1.n_clamped) == 0

"""Gravity: direct softened pairs, sink gravity, PM/TreePM accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.gravity import gas_gravity_direct, sink_gravity
from summersph_tpu.ops.pm_gravity import gas_gravity_pm
from summersph_tpu.state import Particles, Sinks
from summersph_tpu.utils.units import G


def cloud(n=512, r=50.0, h=1.0, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((n, 3)) * r / 3
    return Particles.create(pos=pos, vel=np.zeros((n, 3)),
                            mass=rng.random(n) / n + 0.5 / n,
                            u=np.ones(n), h=h, capacity=capacity)


def test_two_body_newtonian_outside_support():
    p = Particles.create(pos=[[0, 0, 0], [10.0, 0, 0]], vel=np.zeros((2, 3)),
                         mass=[2.0, 3.0], u=[1, 1], h=1.0)
    cfg = SimConfig(gravity="direct")
    acc = np.asarray(gas_gravity_direct(p, cfg))
    # r = 10 > 2h: pure Newtonian
    expect0 = G * 3.0 / 100.0
    assert acc[0, 0] == pytest.approx(expect0, rel=1e-5)
    assert acc[1, 0] == pytest.approx(-G * 2.0 / 100.0, rel=1e-5)
    # momentum conservation
    ptot = (p.mass[:, None] * acc).sum(0)
    np.testing.assert_allclose(np.asarray(ptot), 0.0, atol=1e-5)


def test_close_pair_softened():
    h = 2.0
    p = Particles.create(pos=[[0, 0, 0], [0.1, 0, 0]], vel=np.zeros((2, 3)),
                         mass=[1.0, 1.0], u=[1, 1], h=h)
    cfg = SimConfig(gravity="direct")
    acc = np.asarray(gas_gravity_direct(p, cfg))
    newton = G / 0.01
    # Spline-softened force is far below Newtonian and finite
    assert 0 < acc[0, 0] < 0.05 * newton


def test_sink_gravity_circular_orbit():
    # gas particle at r with keplerian v: a = -G M / r^2 toward sink
    M = 5.0
    r = 30.0
    p = Particles.create(pos=[[r, 0, 0]], vel=[[0, np.sqrt(G * M / r), 0]],
                         mass=[1e-9], u=[1.0], h=1.0)
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[M], radius=[1.0])
    acc_gas, acc_sink = sink_gravity(p, s)
    assert float(acc_gas[0, 0]) == pytest.approx(-G * M / r ** 2, rel=1e-5)
    # force back on sink is tiny (gas mass 1e-9) but momentum-consistent
    np.testing.assert_allclose(
        np.asarray(p.mass[:, None] * acc_gas + s.mass[:, None] * acc_sink).sum(0),
        0.0, atol=1e-7)


def test_pm_matches_direct_on_cloud():
    p = cloud(n=768, h=0.5, capacity=768)
    cfg = SimConfig(gravity="pm", grav_grid=64, neighbor_mode="sorted",
                    sorted_block=64, window_blocks=3, grav_window_blocks=3)
    a_direct = np.asarray(gas_gravity_direct(p, cfg))
    a_pm, n_over = gas_gravity_pm(p, cfg)
    a_pm = np.asarray(a_pm)
    assert int(n_over) == 0
    # rms force error well under the reference's theta=0.5 walk (~1%)
    num = np.linalg.norm(a_pm - a_direct, axis=1)
    den = np.linalg.norm(a_direct, axis=1)
    rel = num / np.maximum(den, 1e-12)
    assert np.sqrt(np.mean(rel ** 2)) < 0.01, np.sqrt(np.mean(rel ** 2))
    assert np.median(rel) < 0.005


def test_pm_dead_particles_ignored():
    p = cloud(n=256, h=0.5, capacity=300)
    cfg = SimConfig(gravity="pm", grav_grid=32)
    acc = np.asarray(gas_gravity_pm(p, cfg)[0])
    assert np.isfinite(acc).all()
    assert np.all(acc[256:] == 0.0)


def clustered_cloud(n=768, seed=0, contrast=100.0):
    """Centrally condensed ball: r ~ power-law giving ~contrast:1 density
    ratio between core and rim (post-collapse profile class)."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    # radius CDF ~ u^1.5: rho ~ r^-1, n(r) spans ~contrast between
    # r_min and r_max
    radius = 50.0 * (u + 1.0 / contrast) ** 1.5
    direction = rng.standard_normal((n, 3))
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    pos = radius[:, None] * direction
    return Particles.create(pos=pos, vel=np.zeros((n, 3)),
                            mass=np.full(n, 1.0 / n), u=np.ones(n), h=0.5)


@pytest.mark.slow
def test_pm_accuracy_under_clustering():
    """TreePM rms force error on a centrally condensed distribution must
    stay in the reference BH walk's accuracy class (~1%) — the reference's
    tree adapts its resolution to arbitrary contrast
    (SUMMER_SPH.f90:264-290); our equivalent guarantee is windows sized by
    the overflow counter + this measured bound."""
    p = clustered_cloud(n=768)
    cfg = SimConfig(gravity="pm", grav_grid=64, neighbor_mode="sorted",
                    window_group=32, grav_window_blocks=12)
    a_direct = np.asarray(gas_gravity_direct(p, cfg))
    a_pm, n_over = gas_gravity_pm(p, cfg)
    assert int(n_over) == 0, "gravity windows must cover the clustered core"
    a_pm = np.asarray(a_pm)
    mag = np.linalg.norm(a_direct, axis=1)
    err = np.linalg.norm(a_pm - a_direct, axis=1)
    rms = np.sqrt(np.mean((err / np.maximum(mag, 1e-12)) ** 2))
    assert rms < 0.02, rms


def test_gravity_window_overflow_trips_on_clustering():
    """Deliberately undersized gravity windows on a clustered core must
    report dropped candidates (loud degradation), not silently miss pairs."""
    from summersph_tpu.ops.pm_gravity import pm_short_range
    p = clustered_cloud(n=768)
    cfg = SimConfig(gravity="pm", grav_grid=64, neighbor_mode="sorted",
                    window_group=32, grav_window_blocks=1)
    _, n_over = pm_short_range(p, cfg, jnp.asarray(2.0))
    assert int(n_over) > 0


def test_pallas_grav_short_matches_xla():
    """The Pallas short-range gravity kernel (interpret mode) must match
    the XLA slab path pairwise-exactly (same sorted order, same mask)."""
    rng = np.random.default_rng(0)
    n = 768
    pos = rng.uniform(-50, 50, (n, 3))
    p = Particles.create(pos=pos, vel=np.zeros((n, 3)),
                         mass=np.full(n, 1.0 / n), u=np.ones(n), h=2.0)
    cfg_x = SimConfig(gravity="pm", neighbor_mode="sorted", sorted_block=128,
                      window_group=32, grav_window_blocks=12,
                      use_pallas=False)
    cfg_p = cfg_x.with_(use_pallas=True, pallas_interpret=True,
                        grav_pallas_window=1536, grav_pallas_fetch=1792)
    from summersph_tpu.ops.pm_gravity import pm_short_range
    r_s = jnp.asarray(4.0)
    ax, nx = pm_short_range(p, cfg_x, r_s)
    ap, np_over = pm_short_range(p, cfg_p, r_s)
    assert int(nx) == 0 and int(np_over) == 0
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ax),
                               rtol=2e-5, atol=1e-8)


def test_grav_fuse_short_matches_separate_pass():
    """cfg.grav_fuse_short: short-range gravity evaluated inside the SPH
    force kernel == the standalone pm_short_range pass, when r_cut fits
    the SPH stencil (fine mesh)."""
    import jax
    import jax.numpy as jnp

    from summersph_tpu.integrate import prime
    from summersph_tpu.state import SimState, Sinks

    from test_density_forces import lattice_particles

    p = lattice_particles(nside=8, spacing=1.0, h=1.3, jitter=0.2)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, p)
    base = SimConfig(fixed_h=1.3, gravity="pm", grav_grid=32,
                     neighbor_mode="sorted", use_pallas=True,
                     pallas_interpret=True, sorted_block=128,
                     window_blocks=5, pallas_window=640,
                     pallas_fetch_window=768)
    accs = {}
    for fuse in (False, True):
        cfg = base.with_(grav_fuse_short=fuse)
        st = SimState.create(p, Sinks.zeros(2), dt=1e-4)
        out = prime(st, cfg)
        order = np.argsort(np.asarray(out.particles.pid))
        accs[fuse] = np.asarray(out.particles.acc)[order]
        assert int(out.stats_dict().get("grav_window_overflow", 0)) == 0
    scale = np.abs(accs[False]).max()
    np.testing.assert_allclose(accs[True], accs[False], atol=3e-6 * scale)


def test_grav_fuse_short_flags_rcut_violation():
    """A coarse mesh makes r_cut exceed the SPH cell: the fused path must
    refuse silently wrong forces by reporting every row in the
    grav_window_overflow slot."""
    import jax
    import jax.numpy as jnp

    from summersph_tpu.integrate import force_eval
    from summersph_tpu.state import Sinks

    from test_density_forces import lattice_particles

    p = lattice_particles(nside=8, spacing=1.0, h=0.35, jitter=0.1)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, p)
    cfg = SimConfig(fixed_h=0.35, gravity="pm", grav_grid=8,
                    grav_fuse_short=True,
                    neighbor_mode="sorted", use_pallas=True,
                    pallas_interpret=True, sorted_block=128,
                    window_blocks=5, pallas_window=640,
                    pallas_fetch_window=768)
    _, _, (grid, grav_over, _) = force_eval(p, Sinks.zeros(2), cfg)
    assert int(grav_over) > 0

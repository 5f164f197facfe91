"""Density and SPH force passes: physics invariants + grid/dense parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.density import compute_density
from summersph_tpu.ops.eos import eos_update
from summersph_tpu.ops.forces import compute_sph_forces
from summersph_tpu.ops.neighbors import build_grid
from summersph_tpu.state import Particles


def lattice_particles(nside=6, spacing=1.0, h=1.2, capacity=None, jitter=0.0,
                      seed=0):
    g = np.arange(nside) * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    if jitter:
        rng = np.random.default_rng(seed)
        pos = pos + jitter * spacing * rng.standard_normal(pos.shape)
    n = len(pos)
    rng = np.random.default_rng(seed + 1)
    return Particles.create(
        pos=pos, vel=0.3 * rng.standard_normal((n, 3)),
        mass=np.full(n, 1.0 / n), u=np.full(n, 1.0) + rng.random(n),
        alpha=0.5, h=h, capacity=capacity)


def test_lattice_density_matches_continuum():
    # Dense interior of a big lattice: rho ~ m / spacing^3
    spacing, h = 1.0, 1.5
    p = lattice_particles(nside=10, spacing=spacing, h=h)
    p = p.replace(mass=jnp.full((p.capacity,), 1.0))
    cfg = SimConfig(fixed_h=h, neighbor_mode="dense")
    p = compute_density(p, cfg)
    rho = np.asarray(p.rho).reshape(10, 10, 10)
    interior = rho[3:7, 3:7, 3:7]
    np.testing.assert_allclose(interior, 1.0 / spacing ** 3, rtol=0.02)


def test_density_includes_self_term():
    p = Particles.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                         mass=[2.0], u=[1.0], h=1.0)
    cfg = SimConfig(fixed_h=1.0, neighbor_mode="dense")
    p = compute_density(p, cfg)
    # Isolated particle: rho = m W(0) = m / (pi h^3)
    assert float(p.rho[0]) == pytest.approx(2.0 / np.pi, rel=1e-5)


def test_grid_matches_dense_density_and_forces():
    p = lattice_particles(nside=7, spacing=1.0, h=1.3, jitter=0.2)
    cfg_d = SimConfig(fixed_h=None, neighbor_mode="dense", cell_cap=64)
    cfg_g = cfg_d.with_(neighbor_mode="grid")

    pd = eos_update(compute_density(p, cfg_d), cfg_d)
    grid = build_grid(p, cfg_g)
    assert int(grid.n_dropped) == 0
    pg = eos_update(compute_density(p, cfg_g, grid), cfg_g)

    np.testing.assert_allclose(np.asarray(pd.rho), np.asarray(pg.rho),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pd.omega), np.asarray(pg.omega),
                               rtol=1e-5)

    acc_d, du_d, dal_d = compute_sph_forces(pd, cfg_d)
    acc_g, du_g, dal_g = compute_sph_forces(pg, cfg_g, grid)
    np.testing.assert_allclose(np.asarray(acc_d), np.asarray(acc_g),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(du_d), np.asarray(du_g),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dal_d), np.asarray(dal_g),
                               rtol=5e-4, atol=1e-6)


def test_momentum_conservation_fixed_h():
    # Pairwise-antisymmetric forces: sum_i m_i a_i == 0 when h uniform.
    p = lattice_particles(nside=6, spacing=1.0, h=1.4, jitter=0.3)
    cfg = SimConfig(fixed_h=1.4, neighbor_mode="dense")
    p = eos_update(compute_density(p, cfg), cfg)
    acc, du, _ = compute_sph_forces(p, cfg)
    ptot = np.asarray(jnp.sum(p.mass[:, None] * acc, axis=0))
    scale = float(jnp.max(jnp.abs(p.mass[:, None] * acc)))
    np.testing.assert_allclose(ptot, 0.0, atol=5e-5 * max(scale, 1e-30))


def test_energy_exchange_consistency():
    # Adiabatic pair: pressure work on i equals -(work on j) in the
    # kinetic/internal energy budget: d/dt (sum m u + sum m v^2/2) == 0
    # for a static-h, no-viscosity configuration.
    p = lattice_particles(nside=5, spacing=1.0, h=1.2, jitter=0.25)
    p = p.replace(alpha=jnp.zeros_like(p.alpha))  # kill viscosity
    cfg = SimConfig(fixed_h=1.2, neighbor_mode="dense")
    p = eos_update(compute_density(p, cfg), cfg)
    acc, du, _ = compute_sph_forces(p, cfg)
    dE_kin = float(jnp.sum(p.mass[:, None] * p.vel * acc))
    dE_int = float(jnp.sum(p.mass * du))
    scale = abs(dE_kin) + abs(dE_int) + 1e-30
    assert abs(dE_kin + dE_int) / scale < 1e-3


def test_dead_particles_are_inert():
    p = lattice_particles(nside=4, spacing=1.0, h=1.2, jitter=0.2)
    # Kill half the particles
    n = p.capacity
    alive = jnp.arange(n) < n // 2
    from summersph_tpu.state import PARK_POSITION
    p_half = p.replace(
        alive=alive,
        mass=jnp.where(alive, p.mass, 0.0),
        pos=jnp.where(alive[:, None], p.pos, PARK_POSITION),
    )
    cfg = SimConfig(fixed_h=1.2, neighbor_mode="dense")
    ph = eos_update(compute_density(p_half, cfg), cfg)
    acc, du, dal = compute_sph_forces(ph, cfg)
    assert np.all(np.isfinite(np.asarray(acc)))
    assert np.all(np.asarray(acc)[n // 2:] == 0.0)
    assert np.all(np.asarray(du)[n // 2:] == 0.0)

    #

    # Same result as a fresh half-size set
    p_small = Particles.create(
        pos=np.asarray(p.pos)[: n // 2], vel=np.asarray(p.vel)[: n // 2],
        mass=np.asarray(p.mass)[: n // 2], u=np.asarray(p.u)[: n // 2],
        alpha=np.asarray(p.alpha)[: n // 2], h=1.2)
    ps = eos_update(compute_density(p_small, cfg), cfg)
    acc_s, _, _ = compute_sph_forces(ps, cfg)
    np.testing.assert_allclose(np.asarray(acc)[: n // 2], np.asarray(acc_s),
                               rtol=1e-5, atol=1e-7)

"""Pallas pair kernels: parity vs the XLA sorted engine (interpret mode on
CPU; the same kernels compile for TPU — perf in docs/PERF_NOTES.md)."""

import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.eos import eos_update
from summersph_tpu.ops.pallas_pairs import (pallas_density, pallas_forces,
                                            window_overflow)
from summersph_tpu.ops.sorted_grid import (sort_particles, sorted_density,
                                           sorted_forces)

from test_density_forces import lattice_particles


def _cfg():
    return SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=128,
                     window_blocks=5, pallas_window=640, use_pallas=True)


def test_pallas_density_and_forces_match_xla():
    p = lattice_particles(nside=8, spacing=1.0, h=1.3, jitter=0.25)
    cfg = _cfg()
    p2, grid = sort_particles(p, cfg)
    assert int(window_overflow(grid, cfg)) == 0

    pd = sorted_density(p2, cfg, grid)
    pp = pallas_density(p2, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(pp.rho), np.asarray(pd.rho),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pp.omega), np.asarray(pd.omega),
                               rtol=2e-4, atol=1e-6)

    pe = eos_update(pd, cfg)
    a1, d1, al1 = sorted_forces(pe, cfg, grid)
    a2, d2, al2 = pallas_forces(pe, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(al2), np.asarray(al1), rtol=2e-4,
                               atol=1e-6)


def test_pallas_handles_dead_particles():
    import jax.numpy as jnp
    from summersph_tpu.state import PARK_POSITION

    p = lattice_particles(nside=6, spacing=1.0, h=1.3, jitter=0.1)
    n = p.capacity
    alive = jnp.arange(n) % 4 != 0
    p = p.replace(alive=alive, mass=jnp.where(alive, p.mass, 0.0),
                  pos=jnp.where(alive[:, None], p.pos, PARK_POSITION))
    cfg = _cfg()
    p2, grid = sort_particles(p, cfg)
    pp = pallas_density(p2, cfg, grid, interpret=True)
    rho = np.asarray(pp.rho)
    al = np.asarray(p2.alive)
    assert np.isfinite(rho).all()
    assert (rho[al] > 0).all()


def test_pallas_multislice_windows_match_xla():
    """Small pallas_window forces the variable-depth slice path (pl.when
    slices 1..3) — results must still match the XLA engine exactly."""
    p = lattice_particles(nside=8, spacing=1.0, h=1.3, jitter=0.25)
    cfg = SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=128,
                    window_group=32, window_blocks=5,
                    pallas_window=128, pallas_fetch_window=640,
                    use_pallas=True)
    p2, grid = sort_particles(p, cfg)
    assert int(window_overflow(grid, cfg)) == 0

    pd = sorted_density(p2, cfg, grid)
    pp = pallas_density(p2, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(pp.rho), np.asarray(pd.rho),
                               rtol=2e-5, atol=1e-7)

    pe = eos_update(pd, cfg)
    a1, d1, al1 = sorted_forces(pe, cfg, grid)
    a2, d2, al2 = pallas_forces(pe, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=2e-4,
                               atol=1e-6)


def test_pallas_exact_windows_match_xla():
    """cfg.pallas_exact_windows: rotated 128-lane exact-start windows must
    reproduce the XLA sorted engine bit-for-bit in coverage (window_plan
    guarantees covered_ends >= ends here, so no drops)."""
    p = lattice_particles(nside=8, spacing=1.0, h=1.3, jitter=0.25)
    cfg = SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=128,
                    window_group=32, window_blocks=5,
                    pallas_fetch_window=640, pallas_exact_windows=True,
                    use_pallas=True)
    p2, grid = sort_particles(p, cfg)
    assert int(window_overflow(grid, cfg)) == 0

    pd = sorted_density(p2, cfg, grid)
    pp = pallas_density(p2, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(pp.rho), np.asarray(pd.rho),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pp.omega), np.asarray(pd.omega),
                               rtol=2e-4, atol=1e-6)

    pe = eos_update(pd, cfg)
    a1, d1, al1 = sorted_forces(pe, cfg, grid)
    a2, d2, al2 = pallas_forces(pe, cfg, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(al2), np.asarray(al1), rtol=2e-4,
                               atol=1e-6)


def test_pallas_exact_windows_gravity_matches():
    """Short-range PM gravity with exact windows == aligned windows."""
    import jax.numpy as jnp
    from summersph_tpu.ops.pm_gravity import pm_short_range

    p = lattice_particles(nside=8, spacing=1.0, h=1.3, jitter=0.25)
    base = SimConfig(fixed_h=None, neighbor_mode="sorted", sorted_block=128,
                     window_group=32, gravity="pm", grav_grid=16,
                     grav_pallas_window=640, grav_pallas_fetch=768,
                     use_pallas=True, pallas_interpret=True)
    r_s = jnp.asarray(0.9, p.pos.dtype)
    acc_a, over_a = pm_short_range(p, base, r_s)
    acc_e, over_e = pm_short_range(
        p, base.with_(pallas_exact_windows=True), r_s)
    assert int(over_a) == 0 and int(over_e) == 0
    np.testing.assert_allclose(np.asarray(acc_e), np.asarray(acc_a),
                               rtol=2e-5, atol=1e-7)

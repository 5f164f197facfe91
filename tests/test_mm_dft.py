"""Pruned matmul-DFT Poisson path (ops.mm_dft) vs numpy FFT and the XLA
rfftn path it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.mm_dft import (dft_tables, fd4_gradient_pruned,
                                      irfft3_pruned, rfft3_pruned)
from summersph_tpu.ops.pm_gravity import grav_tables, pm_long_range
from summersph_tpu.state import Particles


def _rand_cube(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)


def test_rfft3_pruned_matches_numpy():
    n, npad = 12, 24
    rho = _rand_cube(n)
    t = dft_tables(n, npad, "float64")
    re, im = rfft3_pruned(rho, t)
    pad = np.zeros((npad,) * 3)
    pad[:n, :n, :n] = np.asarray(rho)
    ref = np.fft.rfftn(pad)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-9)


def test_irfft3_pruned_matches_numpy_on_ghost_crop():
    """Inverse output rows are (arange(n+4) - 2) mod npad per axis — check
    every row of the pruned cube against the full numpy irfftn."""
    n, npad = 10, 20
    rho = _rand_cube(n, seed=1)
    t = dft_tables(n, npad, "float64")
    re, im = rfft3_pruned(rho, t)
    phi_m = np.asarray(irfft3_pruned(re, im, t))
    pad = np.zeros((npad,) * 3)
    pad[:n, :n, :n] = np.asarray(rho)
    full = np.fft.irfftn(np.fft.rfftn(pad), s=(npad,) * 3)
    sel = (np.arange(n + 4) - 2) % npad
    ref = full[np.ix_(sel, sel, sel)]
    np.testing.assert_allclose(phi_m, ref, atol=1e-9)


def test_fd4_gradient_pruned_matches_roll_form():
    from summersph_tpu.ops.pm_gravity import _fd4_gradient
    n, npad = 8, 16
    rng = np.random.default_rng(2)
    full = jnp.asarray(rng.standard_normal((npad,) * 3))
    cell = 0.37
    gx_ref, gy_ref, gz_ref = (np.asarray(g)[:n, :n, :n]
                              for g in _fd4_gradient(full, cell))
    sel = (np.arange(n + 4) - 2) % npad
    phi_m = jnp.asarray(np.asarray(full)[np.ix_(sel, sel, sel)])
    gx, gy, gz = fd4_gradient_pruned(phi_m, cell, n)
    np.testing.assert_allclose(np.asarray(gx), gx_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), gy_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gz), gz_ref, atol=1e-12)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_pm_long_range_matmul_matches_xla(dtype):
    """Whole-phase parity: pm_long_range with grav_fft='matmul' vs 'xla' on
    the same clustered particle set (both at grav_gradient='fd')."""
    rng = np.random.default_rng(3)
    npart = 512
    pos = np.concatenate([
        rng.normal(0.0, 1.0, (npart // 2, 3)),
        rng.normal(3.0, 0.3, (npart // 2, 3))])
    p = Particles.zeros(npart, dtype).replace(
        pos=jnp.asarray(pos, dtype),
        mass=jnp.full((npart,), 1.0 / npart, dtype),
        alive=jnp.ones((npart,), bool))
    accs = {}
    for mode in ("xla", "matmul"):
        cfg = SimConfig(gravity="pm", grav_grid=32, grav_fft=mode,
                        dtype=("float64" if dtype == jnp.float64
                               else "float32"))
        acc, _, _, r_s = pm_long_range(p, cfg, kern_k=grav_tables(cfg, dtype))
        accs[mode] = np.asarray(acc)
    scale = np.abs(accs["xla"]).max()
    tol = 1e-10 if dtype == jnp.float64 else 3e-6
    np.testing.assert_allclose(accs["matmul"], accs["xla"],
                               atol=tol * scale)


def test_grav_tables_bundle_shapes():
    cfg = SimConfig(gravity="pm", grav_grid=16, grav_fft="matmul")
    t = grav_tables(cfg, jnp.float32)
    assert isinstance(t, dict)
    n, npad, H, m = 16, 32, 17, 20
    assert t["kern_k"].shape == (npad, npad, H)
    assert t["cz"].shape == (H, n) and t["cf"].shape == (npad, n)
    assert t["ci"].shape == (m, npad) and t["czi"].shape == (m, H)
    # xla mode keeps the bare-array contract
    t2 = grav_tables(cfg.with_(grav_fft="xla"), jnp.float32)
    assert not isinstance(t2, dict)

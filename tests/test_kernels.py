"""Kernel math: normalisation, support, derivatives, table parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.ops import kernels


def test_kernel_normalises_to_one():
    # int_0^2h W(r,h) 4 pi r^2 dr == 1 for any h
    for h in (0.5, 1.0, 2.5):
        r = np.linspace(0, 2 * h, 20001)
        w = np.asarray(kernels.kernel_w(jnp.asarray(r), h))
        integral = np.trapezoid(w * 4 * np.pi * r ** 2, r)
        assert abs(integral - 1.0) < 1e-5


def test_compact_support():
    h = 1.3
    r = jnp.asarray([2.0 * h + 1e-6, 3 * h, 100.0])
    assert np.all(np.asarray(kernels.kernel_w(r, h)) == 0.0)
    assert np.all(np.asarray(kernels.kernel_dw(r, h)) == 0.0)


def test_dw_is_derivative_of_w():
    h = 1.7
    r = np.linspace(0.05, 2 * h - 0.05, 300)
    eps = 1e-6
    num = (np.asarray(kernels.kernel_w(jnp.float64(r + eps), h))
           - np.asarray(kernels.kernel_w(jnp.float64(r - eps), h))) / (2 * eps)
    ana = np.asarray(kernels.kernel_dw(jnp.float64(r), h))
    np.testing.assert_allclose(num, ana, rtol=1e-3, atol=1e-6)


def test_dwdh_is_h_derivative():
    r = jnp.float64(0.8)
    h = jnp.float64(1.1)
    eps = 1e-6
    num = (float(kernels.kernel_w(r, h + eps))
           - float(kernels.kernel_w(r, h - eps))) / (2 * eps)
    ana = float(kernels.kernel_dwdh(r, h))
    assert abs(num - ana) < 1e-5 * max(1.0, abs(ana))


def test_grav_softening_limits():
    h = 2.5
    # Newtonian outside 2h
    assert float(kernels.grav_softening(2 * h + 1e-5, h)) == pytest.approx(1.0, abs=1e-6)
    assert float(kernels.grav_softening(10 * h, h)) == 1.0
    # Continuity at q=1 and q=2
    for q in (1.0, 2.0):
        lo = float(kernels.grav_shape(jnp.asarray(q - 1e-7)))
        hi = float(kernels.grav_shape(jnp.asarray(q + 1e-7)))
        assert abs(lo - hi) < 1e-5
    # Harmonic core: f(q) ~ (4/3) q^3 as q -> 0 (force linear in r)
    q = 1e-3
    assert float(kernels.grav_shape(jnp.asarray(q))) == pytest.approx(
        4.0 / 3.0 * q ** 3, rel=1e-3)


def test_table_matches_closed_form():
    tab = kernels.KernelTable(nq=5000)
    h = 2.5
    r = jnp.linspace(0.0, 3 * h, 777)
    np.testing.assert_allclose(np.asarray(tab.w(r, h)),
                               np.asarray(kernels.kernel_w(r, h)),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(tab.dw(r, h)),
                               np.asarray(kernels.kernel_dw(r, h)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tab.grav(r, h)),
                               np.asarray(kernels.grav_shape(r / h)),
                               atol=1e-6)

"""Sod shock tube integration test: L2 density error vs the exact Riemann
solution (the graded accuracy metric, BASELINE.md)."""

import numpy as np
import pytest

from summersph_tpu.integrate import run_until
from summersph_tpu.models.sod import (SodSetup, sod_config, sod_exact, sod_ic,
                                      sod_l2_density_error)


def test_riemann_solver_star_state():
    # Canonical Sod star-region values (standard tables)
    rho, v, p = sod_exact(np.array([0.05]), 0.1)  # between contact and shock
    assert v[0] == pytest.approx(0.92745, abs=2e-3)
    assert p[0] == pytest.approx(0.30313, abs=2e-3)


def test_riemann_solver_left_right_states():
    rho, v, p = sod_exact(np.array([-0.9, 0.9]), 0.1)
    assert rho[0] == pytest.approx(1.0)
    assert rho[1] == pytest.approx(0.125)
    assert v[0] == v[1] == 0.0


@pytest.mark.slow
def test_sod_l2_density_error():
    n = 400
    cfg = sod_config(n=n).with_(end_time=0.1, neighbor_mode="grid",
                                cell_cap=96)
    state, _ = sod_ic(n=n, cfg=cfg)
    state = run_until(state, 0.1, cfg)
    err = sod_l2_density_error(state)
    # plot-level fidelity at this resolution (measured 0.0136; the reference
    # publishes plots, not numbers, README.md:17-19)
    assert err < 0.03, err
    assert int(state.particles.n_alive) == n


@pytest.mark.slow
def test_sod_l2_density_error_sorted_engine():
    """Same physics bound on the production engine (SFC-sorted windows):
    the end-to-end integration, not just unit parity, must hold there."""
    n = 400
    cfg = sod_config(n=n).with_(end_time=0.1, neighbor_mode="sorted",
                                sorted_block=128, window_group=32,
                                window_blocks=4)
    state, _ = sod_ic(n=n, cfg=cfg)
    state = run_until(state, 0.1, cfg)
    err = sod_l2_density_error(state)
    assert err < 0.03, err
    assert int(state.particles.n_alive) == n

"""Runtime failure detection: an injected NaN must abort within one
segment (VERDICT r2 item 6 — round 2's config-5 run logged 55 segments of
all-NaN state unnoticed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import (SimulationDiverged, check_health,
                                     prime, run_steps, simulate, warn_stats)
from summersph_tpu.models.sod import sod_config, sod_ic
from summersph_tpu.state import STATS_FIELDS


def _poisoned_state(n=200):
    cfg = sod_config(n=n).with_(neighbor_mode="sorted")
    state, _ = sod_ic(n=n, cfg=cfg)
    state = prime(state, cfg)
    u = state.particles.u.at[n // 2].set(jnp.nan)
    return state.replace(particles=state.particles.replace(u=u)), cfg


def test_injected_nan_counted_and_aborts_within_one_segment():
    state, cfg = _poisoned_state()
    state = run_steps(state, cfg, 4)  # one short jitted segment
    d = state.stats_dict()
    assert d["nonfinite"] >= 1  # counted inside the jitted step
    assert warn_stats(state) is True
    with pytest.raises(SimulationDiverged, match="non-finite"):
        check_health(state, where="test segment")


def test_simulate_aborts_on_injected_nan():
    """The user driver raises instead of writing garbage ticks."""
    state, cfg = _poisoned_state()
    with pytest.raises(SimulationDiverged):
        simulate(state, cfg.with_(end_time=0.05, n_saves=4), out_dir=None)


def test_all_dead_aborts():
    cfg = sod_config(n=64).with_(neighbor_mode="sorted")
    state, _ = sod_ic(n=64, cfg=cfg)
    state = state.replace(
        particles=state.particles.replace(
            alive=jnp.zeros_like(state.particles.alive)))
    with pytest.raises(SimulationDiverged, match="dead"):
        check_health(state)


def test_stats_vector_matches_fields():
    cfg = sod_config(n=64).with_(neighbor_mode="sorted")
    state, _ = sod_ic(n=64, cfg=cfg)
    state = run_steps(prime(state, cfg), cfg, 1)
    assert np.asarray(state.stats).shape == (len(STATS_FIELDS),)
    assert set(state.stats_dict()) == set(STATS_FIELDS)

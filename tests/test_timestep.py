"""Adaptive timestep criteria + hysteresis (SUMMER_SPH.f90:831-860)."""

import numpy as np
import pytest

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.timestep import next_timestep
from summersph_tpu.state import Particles


def particle(vel=(1.0, 0, 0), acc=(0.1, 0, 0), u=1.0, du=0.0, h=2.0, cs=1.0):
    p = Particles.create(pos=[[0, 0, 0]], vel=[list(vel)], mass=[1.0], u=[u],
                         h=h)
    return p.replace(acc=np.asarray([list(acc)], np.float32) + p.acc,
                     du=p.du + du, cs=p.cs + cs)


def test_grows_when_candidate_large():
    cfg = SimConfig(timestep_scale=0.25, dt_max=0.1, dt_min=1e-4)
    # all candidate timescales huge -> grow by 1.5
    p = particle(vel=(1e-3, 0, 0), acc=(1e-6, 0, 0), cs=1e-3, h=100.0)
    dt = float(next_timestep(p, 0.01, cfg))
    assert dt == pytest.approx(0.015)


def test_shrinks_when_candidate_small():
    # literal reference hysteresis (SUMMER_SPH.f90:855-859): halve per step
    cfg = SimConfig(timestep_scale=0.25, dt_max=0.1, dt_min=1e-4,
                    dt_bound_candidate=False)
    p = particle(vel=(100.0, 0, 0), acc=(1e6, 0, 0), cs=100.0, h=0.01)
    dt = float(next_timestep(p, 0.01, cfg))
    assert dt == pytest.approx(0.005)


def test_candidate_bound_tracks_runaway():
    # default collapse guard: dt cannot exceed the candidate (floored at
    # dt_min) even when the x0.5 hysteresis would lag the runaway
    cfg = SimConfig(timestep_scale=0.25, dt_max=0.1, dt_min=1e-6)
    p = particle(vel=(100.0, 0, 0), acc=(1e6, 0, 0), cs=100.0, h=0.01)
    # candidate = 0.25 * min(sqrt(v2/a2)=1e-4, h/v=1e-4, h/(2.2 cs)=4.5e-5)
    dt = float(next_timestep(p, 0.01, cfg))
    assert dt == pytest.approx(0.25 * 0.01 / (2.2 * 100.0), rel=1e-3)
    # floor still applies
    cfg2 = cfg.with_(dt_min=1e-4)
    assert float(next_timestep(p, 0.01, cfg2)) == pytest.approx(1e-4)


def test_hysteresis_band_keeps_dt():
    cfg = SimConfig(timestep_scale=0.25, dt_max=0.1, dt_min=1e-4)
    # candidate within [dt/2, 2 dt]: unchanged
    # t_cfl = h/(2.2 cs) = 2/(2.2) = 0.909; cand = 0.227*0.25... pick dt near
    p = particle(vel=(0.0, 0, 0), acc=(0.0, 0, 0), cs=1.0, h=2.0, du=0.0)
    # v=0 -> t_acc=inf? no: v2=0 -> 0/0 guarded to inf; t_h = h/0 -> inf
    dt0 = 0.15
    cfg2 = cfg.with_(dt_max=10.0)
    dt = float(next_timestep(p, dt0, cfg2))
    # cand = 0.25 * 0.909 = 0.227: within [0.075, 0.3] -> keep
    assert dt == pytest.approx(dt0)


def test_floor_and_cap():
    cfg = SimConfig(timestep_scale=0.25, dt_max=0.1, dt_min=1e-4)
    p = particle(vel=(100.0, 0, 0), acc=(1e6, 0, 0), cs=100.0, h=0.001)
    # hysteresis shrink blocked at the floor (dt*0.5 <= dt_min): the literal
    # controller keeps dt; the default candidate bound drops to dt_min
    cfg_ref = cfg.with_(dt_bound_candidate=False)
    assert float(next_timestep(p, 2e-4, cfg_ref)) == pytest.approx(2e-4)
    assert float(next_timestep(p, 2e-4, cfg)) == pytest.approx(1e-4)
    # growth blocked at the cap (1.5*dt >= dt_max)
    p2 = particle(vel=(1e-3, 0, 0), acc=(1e-9, 0, 0), cs=1e-3, h=100.0)
    assert float(next_timestep(p2, 0.08, cfg)) == pytest.approx(0.08)


def test_static_cold_particles_no_nan():
    cfg = SimConfig()
    p = particle(vel=(0, 0, 0), acc=(0, 0, 0), u=0.0, du=0.0, cs=0.0)
    dt = float(next_timestep(p, 0.01, cfg))
    assert np.isfinite(dt) and dt > 0

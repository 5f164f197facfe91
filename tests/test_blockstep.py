"""Block timesteps (cfg.dt_bins > 1, blockstep.py).

Pinned properties:
  * rung/mask bookkeeping (pure): closing/opening phase structure, rung
    assignment from the candidates, worklist compaction;
  * gated Pallas kernels are EXACT: a full worklist reproduces the
    ungated kernel bit-for-bit, a partial worklist reproduces it on the
    active rows (inactive rows are undefined by contract);
  * degenerate equivalence: when every particle sits on rung 0 the binned
    step is the global KDK step (forces evaluated at the same positions;
    only the M-increment drift reassociates the float sum);
  * mixed rungs conserve: mass exactly, momentum/energy near the global
    engine run to the same time at the deep-rung dt.

The scheme is a DELIBERATE deviation from the reference's global dt
(SUMMER_SPH.f90:831-860) — dt_bins=1 (default) keeps reference parity;
these tests pin the opt-in path against the global engine itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summersph_tpu.blockstep import (assign_rungs, closing_mask,
                                     group_worklist, opening_mask,
                                     rung_dt, step_binned)
from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import prime, run_steps, step
from summersph_tpu.models.disc import disc_ic
from summersph_tpu.state import Particles


def _by_pid(arrs, pid):
    order = np.argsort(np.asarray(pid))
    return [np.asarray(a)[order] for a in arrs]


# ---------------------------------------------------------------- pure logic

def test_mask_phase_structure():
    # B = 3 rungs, M = 4 substeps: rung 0 closes only at j=3, rung 1 at
    # j=1,3, rung 2 every substep; opening is the same pattern shifted.
    rung = jnp.asarray([0, 1, 2], jnp.int32)
    M = 4
    closes = np.asarray([np.asarray(closing_mask(rung, j, M))
                         for j in range(M)])
    assert closes[:, 0].tolist() == [False, False, False, True]
    assert closes[:, 1].tolist() == [False, True, False, True]
    assert closes[:, 2].tolist() == [True, True, True, True]
    opens = np.asarray([np.asarray(opening_mask(rung, j, M))
                        for j in range(M)])
    # opening at j == closing at j-1; everyone opens at j=0
    assert opens[0].all()
    assert (opens[1:] == closes[:-1]).all()
    # each rung gets 2^r (open, close) pairs whose dt sums to dt_base
    dt = rung_dt(rung, 1.0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dt) * closes.sum(axis=0), 1.0, rtol=1e-6)


def test_assign_rungs_thresholds():
    p = Particles.zeros(8, jnp.float32)
    cfg = SimConfig(dt_bins=4, timestep_scale=1.0, fixed_h=None)
    # candidates exactly at power-of-two fractions of dt_base
    cand = jnp.asarray([2.0, 1.0, 0.51, 0.5, 0.26, 0.25, 0.1, 1e-9],
                       jnp.float32)
    # route candidates through acc so dt_candidates returns them:
    # t_acc = sqrt(v^2/a^2) with |v| = 1, |a| = 1/cand
    p = p.replace(alive=jnp.ones(8, bool),
                  vel=jnp.stack([jnp.ones(8), jnp.zeros(8),
                                 jnp.zeros(8)], -1).astype(jnp.float32),
                  acc=jnp.stack([1.0 / cand, jnp.zeros(8),
                                 jnp.zeros(8)], -1).astype(jnp.float32),
                  u=jnp.full((8,), 1e9), h=jnp.full((8,), 1e9))
    r = np.asarray(assign_rungs(p, cfg, 1.0))
    assert r.tolist() == [0, 0, 1, 1, 2, 2, 3, 3]  # last clipped to B-1


def test_group_worklist_compaction():
    act = jnp.zeros((512,), bool).at[130].set(True).at[400].set(True)
    work, count = group_worklist(act, 128)
    assert int(count[0]) == 2
    assert np.asarray(work)[:2].tolist() == [1, 3]
    # remaining entries are the inactive blocks, any order; all ids present
    assert sorted(np.asarray(work).tolist()) == [0, 1, 2, 3]


# ------------------------------------------------------- gated kernel exact

def _blob(n=512, seed=0):
    rng = np.random.default_rng(seed)
    p = Particles.zeros(n, jnp.float32)
    return p.replace(
        pos=jnp.asarray(rng.uniform(0, 10, (n, 3)), jnp.float32),
        vel=jnp.asarray(rng.normal(0, 0.1, (n, 3)), jnp.float32),
        mass=jnp.ones(n, jnp.float32), h=jnp.ones(n, jnp.float32),
        alive=jnp.ones(n, bool), u=jnp.ones(n, jnp.float32),
        alpha=jnp.ones(n, jnp.float32),
        pid=jnp.arange(n, dtype=jnp.int32))


def test_gated_kernels_exact():
    from summersph_tpu.ops.pallas_pairs import (pallas_density_sums,
                                                pallas_force_sums)
    from summersph_tpu.ops.sorted_grid import sort_particles
    from summersph_tpu.ops.eos import eos_update
    from summersph_tpu.ops import pairs

    cfg = SimConfig(fixed_h=1.0, neighbor_mode="sorted", use_pallas=True,
                    pallas_interpret=True, sorted_block=128,
                    window_group=32, pallas_window=256,
                    pallas_fetch_window=512, window_blocks=3)
    p2, grid = sort_particles(_blob(), cfg)
    rho, om = pallas_density_sums(p2, cfg, grid, interpret=True)
    rho_f, omega = pairs.finalize_density(rho, om, p2.h, p2.alive, p2.mass)
    p2 = eos_update(p2.replace(rho=rho_f, omega=jnp.ones_like(omega)), cfg)
    f_full = pallas_force_sums(p2, cfg, grid, interpret=True)

    # full worklist == ungated, bit for bit
    work, cnt = group_worklist(p2.alive, cfg.sorted_block)
    rho_g, om_g = pallas_density_sums(p2, cfg, grid, interpret=True,
                                      active=(work, cnt))
    assert np.array_equal(np.asarray(rho), np.asarray(rho_g))
    assert np.array_equal(np.asarray(om), np.asarray(om_g))

    # partial worklist == ungated on the active rows
    act = jnp.arange(p2.capacity) % 384 < 128  # blocks 0, 3, 6, ...
    work, cnt = group_worklist(act, cfg.sorted_block)
    rho_p, om_p = pallas_density_sums(p2, cfg, grid, interpret=True,
                                      active=(work, cnt))
    m = np.asarray(act)
    assert np.array_equal(np.asarray(rho)[m], np.asarray(rho_p)[m])
    f_part = pallas_force_sums(p2, cfg, grid, interpret=True,
                               active=(work, cnt))
    for c_full, c_part in zip(f_full, f_part):
        assert np.array_equal(np.asarray(c_full)[m], np.asarray(c_part)[m])


# ------------------------------------------------ engine-level equivalences

def _disc(n, dt_bins, dt_init, m_star=0.0, fixed_h=2.0, seed=3,
          **cfg_kw):
    kw = dict(fixed_h=fixed_h, gravity="none",
              neighbor_mode="sorted", use_pallas=False,
              sorted_block=128, window_group=32, window_blocks=4,
              dt_init=dt_init, dt_min=1e-9, dt_max=1e-2,
              dt_bins=dt_bins)
    kw.update(cfg_kw)
    cfg = SimConfig(**kw)
    state, _ = disc_ic(n=n, r_max=10.0, m_disc=1.0, m_star=m_star,
                       u0=0.1, h0=fixed_h if fixed_h else 1.0,
                       cfg=cfg, seed=seed)
    return prime(state, cfg), cfg


def test_all_rung0_matches_global_step():
    """dt far below every candidate => every rung is 0: one binned base
    step IS one global KDK step (same forces at the same positions); only
    the drift's float reassociation (M small increments) differs."""
    # m_star=1: Keplerian rotation keeps t_acc = |v|/|a| finite (a cold
    # static disc's t_acc ~ 0 would clip every rung to the deepest)
    s0, cfg1 = _disc(512, dt_bins=1, dt_init=1e-6, m_star=1.0)
    sb, cfg4 = _disc(512, dt_bins=3, dt_init=1e-6, m_star=1.0)
    o1 = step(s0, cfg1)
    ob = step_binned(sb, cfg4)
    assert np.asarray(assign_rungs(sb.particles, cfg4, sb.dt)).max() == 0
    p1, pb = o1.particles, ob.particles
    (x1, v1, u1), (xb, vb, ub) = (
        _by_pid([p.pos, p.vel, p.u], p.pid) for p in (p1, pb))
    np.testing.assert_allclose(x1, xb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(v1, vb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(u1, ub, rtol=2e-5, atol=1e-7)
    assert float(o1.t) == pytest.approx(float(ob.t), rel=1e-6)


def test_mixed_rungs_track_global_engine():
    """A Keplerian disc's candidates span the radial range => real rung
    spread.  The binned engine at dt_base must track the global engine
    run at the deep-rung dt to the same time: mass exactly, momentum /
    energy / positions within the block-timestep truncation error."""
    from summersph_tpu.diagnostics import measure
    from summersph_tpu.ops.timestep import dt_candidates

    B = 3
    sb, cfgb = _disc(768, dt_bins=B, dt_init=1e-5, m_star=1.0)
    # base = 4x the tightest candidate: the inner disc needs rung 2, the
    # outer stays at rung 0.  dt_min == dt_max pins both controllers so
    # the two engines hit exactly the same times.
    cand = np.asarray(dt_candidates(sb.particles, cfgb))
    base = float(4.0 * cand[np.asarray(sb.particles.alive)].min())
    sb = sb.replace(dt=jnp.asarray(base, jnp.float32))
    cfgb = cfgb.with_(dt_min=base, dt_max=base)
    sg, cfgg = _disc(768, dt_bins=1, dt_init=base / 4, m_star=1.0,
                     dt_min=base / 4, dt_max=base / 4)
    rungs = np.asarray(assign_rungs(sb.particles, cfgb, sb.dt))
    assert rungs.max() == 2 and rungs.min() == 0, \
        "fixture must actually spread rungs"

    ob = sb
    for _ in range(2):           # 2 base steps = 8 deep substeps
        ob = step_binned(ob, cfgb)
    og = sg
    for _ in range(8):
        og = step(og, cfgg)
    assert float(ob.t) == pytest.approx(float(og.t), rel=1e-6)

    db, dg = measure(ob), measure(og)
    np.testing.assert_allclose(float(db["mass_gas"]), float(dg["mass_gas"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(db["momentum"]),
                               np.asarray(dg["momentum"]), atol=5e-4)
    np.testing.assert_allclose(float(db["e_kin"]), float(dg["e_kin"]),
                               rtol=2e-3)
    (xb,), (xg,) = (_by_pid([o.particles.pos], o.particles.pid)
                    for o in (ob, og))
    # rms displacement between the schemes stays far below h
    rms = float(np.sqrt(np.mean(np.sum((xb - xg) ** 2, axis=-1))))
    assert rms < 1e-3


def test_binned_runs_variable_h_and_sinks():
    """Variable-h + central sink + accretion through run_steps dispatch:
    the production epilogue path compiles and conserves mass."""
    from summersph_tpu.diagnostics import measure

    cfg = SimConfig(fixed_h=None, eta=1.2, h_iter_max=2, gravity="none",
                    neighbor_mode="sorted", use_pallas=False,
                    sorted_block=128, window_group=32, window_blocks=4,
                    dt_init=2e-4, dt_min=1e-9, dt_max=1e-2, dt_bins=2)
    state, _ = disc_ic(n=512, r_max=10.0, m_disc=1.0, m_star=1.0,
                       u0=0.1, cfg=cfg, seed=1)
    state = prime(state, cfg)
    m0 = float(measure(state)["mass_gas"]) + float(
        measure(state)["mass_sinks"])
    out = run_steps(state, cfg, 2)
    d = measure(out)
    assert float(out.t) > float(state.t)
    np.testing.assert_allclose(
        float(d["mass_gas"]) + float(d["mass_sinks"]), m0, rtol=1e-6)
    assert d["rho_max"] > 0.0
    assert int(out.stats_dict()["nonfinite"]) == 0

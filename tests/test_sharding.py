"""Multi-chip data-parallel step on the virtual 8-device CPU mesh:
must match the single-device step bit-for-tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import step
from summersph_tpu.models.disc import disc_ic
from summersph_tpu.parallel import (make_mesh, make_sharded_step,
                                    pad_state_to_devices, shard_state)


def _tiny_state(gravity="direct", fixed_h=None):
    cfg = SimConfig(
        fixed_h=fixed_h, gravity=gravity, neighbor_mode="grid",
        gamma=1.4, eta=1.2, bounding_size=1500.0,
        cell_cap=32, sink_capacity=4, h_iter_max=3,
        dt_init=1e-4,
    )
    state, _ = disc_ic(n=96, r_max=50.0, m_star=1.0, h0=20.0,
                       rotation="keplerian", capacity=96,
                       sink_capacity=4, cfg=cfg, seed=3)
    if fixed_h is None:
        state = state.replace(
            particles=state.particles.replace(
                h=jnp.full_like(state.particles.h, 20.0)))
    return state, cfg


def test_sharded_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    state, cfg = _tiny_state(gravity="direct", fixed_h=None)

    ref = step(state, cfg)

    mesh = make_mesh(8)
    st = pad_state_to_devices(state, 8)
    st = shard_state(st, mesh)
    sstep = make_sharded_step(cfg, mesh)
    out = sstep(st)

    cap = state.particles.capacity
    np.testing.assert_allclose(
        np.asarray(out.particles.pos)[:cap], np.asarray(ref.particles.pos),
        rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.particles.vel)[:cap], np.asarray(ref.particles.vel),
        rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.particles.rho)[:cap], np.asarray(ref.particles.rho),
        rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.particles.h)[:cap], np.asarray(ref.particles.h),
        rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.sinks.mass),
                               np.asarray(ref.sinks.mass), rtol=1e-5)
    assert float(out.t) == float(ref.t)
    np.testing.assert_allclose(float(out.dt), float(ref.dt), rtol=1e-6)
    # alive masks agree on the original slots; padding slots stay dead
    assert np.array_equal(np.asarray(out.particles.alive)[:cap],
                          np.asarray(ref.particles.alive))
    assert not np.asarray(out.particles.alive)[cap:].any()


def test_sharded_multiple_steps_stable():
    state, cfg = _tiny_state(gravity="direct", fixed_h=2.5)
    mesh = make_mesh(8)
    st = shard_state(pad_state_to_devices(state, 8), mesh)
    sstep = make_sharded_step(cfg, mesh)
    for _ in range(3):
        st = sstep(st)
    assert np.isfinite(np.asarray(st.particles.vel)).all()
    assert int(st.particles.n_alive) > 0


def _by_pid(p, arr):
    order = np.argsort(np.asarray(p.pid))
    return np.asarray(arr)[order]


def test_sharded_sorted_pallas_pm_matches_single_device():
    """The production engine (sorted windows + Pallas kernels in interpret
    mode + TreePM gravity) under shard_map must match the same config run
    on a single device.  Fixed h keeps the interpret-mode graph small; the
    variable-h sharded path is covered by the (XLA-engine) multistep test
    below."""
    state, cfg0 = _tiny_state(gravity="pm", fixed_h=20.0)
    cfg = cfg0.with_(neighbor_mode="sorted", use_pallas=True,
                     pallas_interpret=True, sorted_block=128,
                     window_group=32, window_blocks=3, pallas_window=384,
                     grav_window_blocks=3, grav_grid=32)

    # Same capacity for both runs -> identical padded sort, directly
    # comparable arrays (identity also asserted via pid).  4 of the 8
    # virtual devices: interpret-mode Pallas is slow, and 4 shards already
    # exercise every cross-shard code path.
    padded = pad_state_to_devices(state, 4)
    ref = step(padded, cfg)

    mesh = make_mesh(4)
    st = shard_state(padded, mesh)
    out = make_sharded_step(cfg, mesh)(st)

    assert np.array_equal(np.asarray(out.particles.pid),
                          np.asarray(ref.particles.pid))
    assert np.array_equal(np.asarray(out.particles.alive),
                          np.asarray(ref.particles.alive))
    for field in ("rho", "h", "u"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.particles, field)),
            np.asarray(getattr(ref.particles, field)),
            rtol=2e-4, atol=1e-7, err_msg=field)
    np.testing.assert_allclose(np.asarray(out.particles.vel),
                               np.asarray(ref.particles.vel),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.dt), float(ref.dt), rtol=1e-6)


def test_sharded_sorted_multistep_with_accretion():
    """3 sharded sorted-engine steps with a fat sink: accretion must fire
    across shard boundaries and conserve mass vs the single-device run."""
    from summersph_tpu.integrate import run_steps
    from summersph_tpu.parallel import make_sharded_run_steps

    state, cfg0 = _tiny_state(gravity="pm", fixed_h=None)
    cfg = cfg0.with_(neighbor_mode="sorted", use_pallas=False,
                     sorted_block=128, window_group=32, window_blocks=3,
                     grav_window_blocks=3, grav_grid=32)
    # Fat accretion radius: guarantees several gas particles fall in.
    sinks = state.sinks.replace(radius=jnp.where(state.sinks.alive, 30.0,
                                                 state.sinks.radius))
    state = state.replace(sinks=sinks)

    padded = pad_state_to_devices(state, 4)
    ref = run_steps(padded, cfg, 3)

    mesh = make_mesh(4)
    st = shard_state(padded, mesh)
    out = make_sharded_run_steps(cfg, mesh, n_steps=3)(st)

    n_ref = int(ref.particles.n_alive)
    n_out = int(out.particles.n_alive)
    assert n_out == n_ref
    assert n_out < 96  # something actually accreted
    np.testing.assert_allclose(np.asarray(out.sinks.mass),
                               np.asarray(ref.sinks.mass), rtol=1e-5)
    m_gas0 = 5.0  # disc_ic m_disc default
    m_tot = float(jnp.sum(jnp.where(out.particles.alive, out.particles.mass,
                                    0.0)) + jnp.sum(out.sinks.mass))
    np.testing.assert_allclose(m_tot, m_gas0 + 1.0, rtol=1e-5)

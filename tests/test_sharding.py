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

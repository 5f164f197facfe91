"""Short-range gravity overflow fallback (SimConfig.grav_overflow_items).

A static window plan cannot bound a condensing core — one r_cut stencil
cell can hold ~rho r_cut^3 >> 8 * W particles (the 1e6 collapse audit,
scripts/c5_window_audit.py, measured 54% of true short-range pairs dropped
at 1.22 t_ff).  The fallback turns the residual [coverage, ends) ranges
into a fixed-capacity worklist of 512-lane slices evaluated in a scanned
XLA pass (ops/pm_gravity._overflow_pass).  These tests pin: exactness vs
deep windows on a clustered state, residual accounting when the budget is
too small, and sharded parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.ops.pm_gravity import gas_gravity_pm
from summersph_tpu.state import Particles


def _clustered(n=2048, seed=3):
    """3/4 of the mass in a tight clump: stencil cells with hundreds of
    particles overwhelm a grav_window_blocks=2 static plan."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    pos[: 3 * n // 4] = rng.normal(0, 1.2, (3 * n // 4, 3))
    return Particles.zeros(n, jnp.float32).replace(
        pos=jnp.asarray(pos), mass=jnp.full((n,), 1e-3, jnp.float32),
        h=jnp.full((n,), 0.5, jnp.float32),
        alive=jnp.ones((n,), bool), pid=jnp.arange(n))


_BASE = dict(gravity="pm", grav_grid=32, neighbor_mode="sorted",
             use_pallas=False, sorted_block=128, window_group=32,
             fixed_h=2.0)


def test_fallback_recovers_dropped_pairs():
    p = _clustered()
    tiny = SimConfig(**_BASE, grav_window_blocks=2)
    fall = SimConfig(**_BASE, grav_window_blocks=2, grav_overflow_items=2048)
    deep = SimConfig(**_BASE, grav_window_blocks=16)

    a_t, o_t = gas_gravity_pm(p, tiny)
    a_f, o_f = gas_gravity_pm(p, fall)
    a_d, o_d = gas_gravity_pm(p, deep)
    assert int(o_d) == 0, "deep windows must cover the clump"
    assert int(o_t) > 0, "tiny windows must overflow on the clump"
    assert int(o_f) == 0, "fallback must cover every residual"
    scale = float(jnp.max(jnp.linalg.norm(a_d, axis=1)))
    err_tiny = float(jnp.max(jnp.linalg.norm(a_t - a_d, axis=1))) / scale
    err_fall = float(jnp.max(jnp.linalg.norm(a_f - a_d, axis=1))) / scale
    assert err_tiny > 1e-2, "drops must matter on this state (else no test)"
    assert err_fall < 1e-5, err_fall


def test_small_budget_counts_residual():
    p = _clustered()
    small = SimConfig(**_BASE, grav_window_blocks=2, grav_overflow_items=64)
    fall = SimConfig(**_BASE, grav_window_blocks=2, grav_overflow_items=2048)
    _, o_s = gas_gravity_pm(p, small)
    _, o_f = gas_gravity_pm(p, fall)
    assert int(o_f) == 0
    assert int(o_s) > 0, "64 items cannot cover the clump's residual"


def test_sharded_fallback_matches_single_device():
    """Full sorted-engine step with the fallback on, 4 virtual devices vs
    one — the worklist is built per device over its own groups."""
    from summersph_tpu.integrate import step
    from summersph_tpu.models.disc import disc_ic
    from summersph_tpu.parallel import (make_mesh, make_sharded_step,
                                        pad_state_to_devices, shard_state)

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = SimConfig(**_BASE, grav_window_blocks=2, grav_overflow_items=256,
                    gamma=1.4, bounding_size=1500.0, sink_capacity=4,
                    dt_init=1e-4)
    state, _ = disc_ic(n=512, r_max=8.0, m_disc=2.0, m_star=1.0, h0=2.0,
                       rotation="rigidbody", v_circ=1.0,
                       sink_capacity=4, cfg=cfg, seed=5)

    padded = pad_state_to_devices(state, 4)
    ref = step(padded, cfg)

    mesh = make_mesh(4)
    out = make_sharded_step(cfg, mesh)(shard_state(padded, mesh))

    assert np.array_equal(np.asarray(out.particles.pid),
                          np.asarray(ref.particles.pid))
    np.testing.assert_allclose(np.asarray(out.particles.vel),
                               np.asarray(ref.particles.vel),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.dt), float(ref.dt), rtol=1e-6)

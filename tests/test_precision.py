"""Precision story: Kahan-compensated u kicks and f32-vs-f64 drift bounds.

The reference integrates in f64 end-to-end (SUMMER_SPH.f90:6,
`dp = kind(1.0d0)`); the TPU production path is f32 (MXU/VPU native).
These tests bound what that costs: the u accumulation drift over many
steps (and its elimination by cfg.kahan_u, SURVEY.md §7 "compensated sums
for u"), and the dtype sensitivity of an end-to-end Sod solution on the
XLA sorted engine (which is dtype-polymorphic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import init_kahan, kick, prime, run_steps
from summersph_tpu.state import Particles, SimState, Sinks


def _one_particle(u0, du):
    p = Particles.create(pos=[[0.0, 0, 0]], vel=np.zeros((1, 3)),
                         mass=[1.0], u=[u0], h=[1.0])
    p = p.replace(du=jnp.asarray([du], jnp.float32),
                  acc=jnp.zeros((1, 3), jnp.float32))
    s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                     mass=[0.0], radius=[0.0])
    return p, s


def test_kahan_kick_eliminates_accumulation_drift():
    """u += du*dt/2 where du*dt/2 ~ 2e-7*u: after 20000 f32 kicks the
    plain sum loses a visible fraction of the increments (each add rounds
    at eps*u ~ 6e-8*u); the Kahan carry recovers the f64 answer to f32
    roundoff of the TOTAL."""
    u0, du, dt, n = 1.0, 4.0e-7, 1.0, 20000

    def accumulate(p, s):
        def body(carry, _):
            p, s = kick(*carry, dt)
            return (p, s), None
        (p, _), _ = jax.lax.scan(body, (p, s), None, length=n)
        return p.u[0]

    p, s = _one_particle(u0, du)
    plain = float(jax.jit(accumulate)(p, s))
    pk = p.replace(u_c=jnp.zeros_like(p.u))
    compensated = float(jax.jit(accumulate)(pk, s))

    exact = u0 + n * 0.5 * dt * du  # 1.004, exactly representable terms
    err_plain = abs(plain - exact)
    err_kahan = abs(compensated - exact)
    # plain f32 drifts by many ulps; kahan lands within a few ulps
    assert err_kahan <= 2.0e-7, (plain, compensated, exact)
    assert err_plain > 10.0 * max(err_kahan, 1e-9), (err_plain, err_kahan)


def test_kahan_matches_plain_physics_on_sod():
    """cfg.kahan_u must not change the physics beyond roundoff: same Sod
    tube, 50 steps, compare u fields."""
    from summersph_tpu.models.sod import sod_config, sod_ic

    cfg = sod_config(n=300).with_(neighbor_mode="sorted")
    state, _ = sod_ic(n=300, cfg=cfg)
    a = run_steps(prime(state, cfg), cfg, 50)
    ck = cfg.with_(kahan_u=True)
    b = run_steps(prime(state, ck), ck, 50)

    def by_pid(p, arr):
        return np.asarray(arr)[np.argsort(np.asarray(p.pid))]

    np.testing.assert_allclose(by_pid(a.particles, a.particles.u),
                               by_pid(b.particles, b.particles.u),
                               rtol=1e-5, atol=1e-8)
    assert b.particles.u_c is not None


def test_sod_f32_vs_f64_drift_bound():
    """End-to-end dtype sensitivity on the XLA sorted engine: the f32 and
    f64 Sod solutions at t=0.05 agree to well below the scheme's own error
    (L2 vs exact Riemann ~1e-2) — evidence that f32 is adequate for the
    production path (SURVEY.md §7)."""
    from summersph_tpu.models.sod import sod_config, sod_ic

    jax.config.update("jax_enable_x64", True)
    try:
        outs = {}
        for dtype in ("float32", "float64"):
            cfg = sod_config(n=300).with_(neighbor_mode="sorted",
                                          dtype=dtype)
            state, _ = sod_ic(n=300, cfg=cfg)
            st = run_steps(prime(state, cfg), cfg, 200)
            order = np.argsort(np.asarray(st.particles.pid))
            outs[dtype] = (np.asarray(st.particles.rho)[order],
                           np.asarray(st.particles.u)[order],
                           float(st.t))
    finally:
        jax.config.update("jax_enable_x64", False)
    rho32, u32, t32 = outs["float32"]
    rho64, u64, t64 = outs["float64"]
    assert abs(t32 - t64) / max(t64, 1e-12) < 1e-3
    n_live = 300
    rel_rho = np.abs(rho32[:n_live] - rho64[:n_live]) / rho64[:n_live]
    rel_u = np.abs(u32[:n_live] - u64[:n_live]) / np.abs(u64[:n_live])
    # dtype drift orders of magnitude below the ~1e-2 scheme error
    assert np.median(rel_rho) < 1e-4, np.median(rel_rho)
    assert np.median(rel_u) < 1e-4, np.median(rel_u)


def test_init_kahan_roundtrip_checkpoint(tmp_path):
    """u_c survives a save/load cycle and is dropped when the config turns
    kahan_u off."""
    from summersph_tpu.io.checkpoint import load_npz, save_npz

    p, s = _one_particle(1.0, 1e-6)
    state = SimState.create(p, s, dt=1e-3)
    cfg = SimConfig(kahan_u=True)
    state = init_kahan(state, cfg)
    state = state.replace(
        particles=state.particles.replace(u_c=jnp.asarray([3.25e-8])))
    path = tmp_path / "ck.npz"
    save_npz(str(path), state, cfg)
    loaded = load_npz(str(path))
    np.testing.assert_allclose(np.asarray(loaded.particles.u_c), 3.25e-8)
    dropped = init_kahan(loaded, cfg.with_(kahan_u=False))
    assert dropped.particles.u_c is None


def test_pallas_production_kernels_f64_interpret_parity():
    """VERDICT r3 item 8: the PRODUCTION Pallas kernel code path runs at
    reference precision (f64, SUMMER_SPH.f90:6) in interpret mode and
    matches the f64 XLA sorted engine to f64 tightness."""
    import numpy as np
    import jax.numpy as jnp

    from summersph_tpu.config import SimConfig
    from summersph_tpu.ops.eos import eos_update
    from summersph_tpu.ops.pallas_pairs import (pallas_density,
                                                pallas_forces)
    from summersph_tpu.ops.sorted_grid import (sort_particles,
                                               sorted_density,
                                               sorted_forces)
    from test_density_forces import lattice_particles

    jax.config.update("jax_enable_x64", True)  # a prior test may reset it
    try:
        p = lattice_particles(nside=6, spacing=1.0, h=1.3, jitter=0.2)
        p = jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.float64) if a.dtype == jnp.float32
                       else a), p)
        cfg = SimConfig(fixed_h=None, neighbor_mode="sorted",
                        sorted_block=128, window_blocks=5,
                        pallas_window=640, use_pallas=True,
                        pallas_interpret=True, dtype="float64")
        p2, grid = sort_particles(p, cfg)
        assert p2.pos.dtype == jnp.float64

        pd = sorted_density(p2, cfg, grid)
        pp = pallas_density(p2, cfg, grid, interpret=True)
        assert pp.rho.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(pp.rho), np.asarray(pd.rho),
                                   rtol=1e-12, atol=1e-14)

        pe = eos_update(pd, cfg)
        a1, d1, al1 = sorted_forces(pe, cfg, grid)
        a2, d2, al2 = pallas_forces(pe, cfg, grid, interpret=True)
        scale = float(np.abs(np.asarray(a1)).max())
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                   atol=1e-11 * scale)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-10, atol=1e-14)
    finally:
        jax.config.update("jax_enable_x64", True)

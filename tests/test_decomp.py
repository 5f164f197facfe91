"""SFC slab domain decomposition (parallel.decomp): redistribution, rim
exchange, and (as they land) decomposed pair-pass parity vs the
single-device engine — all on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from summersph_tpu.config import SimConfig
from summersph_tpu.parallel.decomp import (exchange_rim, global_geometry,
                                           redistribute)
from summersph_tpu.parallel.sharded import make_mesh, _shard_map
from summersph_tpu.state import Particles

from summersph_tpu.ops.neighbors import SENTINEL_KEY


def ball_particles(n, seed=0, dtype=jnp.float32, dead_frac=0.1):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3)) * 10.0
    vel = rng.normal(size=(n, 3)) * 0.1
    p = Particles.create(pos=pos, vel=vel, mass=np.full(n, 1.0 / n),
                         u=np.full(n, 1.0), h=np.full(n, 1.0))
    if dead_frac:
        alive = rng.random(n) > dead_frac
        p = p.replace(alive=jnp.asarray(alive))
    return jax.tree_util.tree_map(lambda a: a.astype(a.dtype), p)


def pspec(p: Particles, axis="dp"):
    return Particles(**{f: P(axis) for f in Particles.__dataclass_fields__
                        if f != "u_c"}, u_c=None)


def test_redistribute_conserves_and_partitions():
    """After redistribution: every live particle owned exactly once, slabs
    are key-disjoint and rank-ordered, no overflow at sane capacity."""
    n = 8 * 512
    p = ball_particles(n, seed=1)
    cfg = SimConfig(fixed_h=1.0, neighbor_mode="sorted",
                    decomp="slab", migrate_rows=512)
    mesh = make_mesh(8)

    def body(p_sh):
        origin, cell = global_geometry(p_sh, cfg, "dp")
        key, own, splitters, n_mis, n_over = redistribute(
            p_sh, cfg, "dp", origin, cell)
        return (key, own, jax.lax.psum(n_mis, "dp"),
                jax.lax.psum(n_over, "dp"))

    spec = pspec(p)
    fn = jax.jit(_shard_map(body, mesh, (spec,),
                            (P("dp"), pspec(p), P(), P())))
    key, own, n_mis, n_over = fn(p)

    assert int(n_mis) == 0
    assert int(n_over) == 0

    key = np.asarray(key).reshape(8, -1)
    alive = np.asarray(own.alive).reshape(8, -1)
    pid = np.asarray(own.pid).reshape(8, -1)

    # conservation: the live pid multiset is preserved
    pid_in = np.sort(np.asarray(p.pid)[np.asarray(p.alive)])
    pid_out = np.sort(pid[alive])
    np.testing.assert_array_equal(pid_in, pid_out)

    # each slab sorted, slabs ordered and key-disjoint (<= at boundaries:
    # equal keys all land right of the splitter on every device)
    for d in range(8):
        kd = key[d][alive[d]]
        assert (np.diff(kd) >= 0).all()
        if d > 0:
            prev = key[d - 1][alive[d - 1]]
            if prev.size and kd.size:
                assert prev.max() <= kd.min()


def test_redistribute_masses_positions_ride():
    """Field values follow their particle through the exchange."""
    n = 8 * 256
    rng = np.random.default_rng(3)
    p = ball_particles(n, seed=3, dead_frac=0.1)
    u_tag = rng.random(n).astype(np.float64)
    p = p.replace(u=jnp.asarray(u_tag))
    cfg = SimConfig(fixed_h=1.0, neighbor_mode="sorted",
                    decomp="slab", migrate_rows=256)
    mesh = make_mesh(8)

    def body(p_sh):
        origin, cell = global_geometry(p_sh, cfg, "dp")
        _, own, _, n_mis, n_over = redistribute(p_sh, cfg, "dp", origin,
                                                cell)
        return own, jax.lax.psum(n_mis + n_over, "dp")

    spec = pspec(p)
    fn = jax.jit(_shard_map(body, mesh, (spec,), (pspec(p), P())))
    own, bad = fn(p)
    assert int(bad) == 0
    alive = np.asarray(own.alive)
    pid = np.asarray(own.pid)[alive]
    np.testing.assert_allclose(np.asarray(own.u)[alive],
                               u_tag[pid], rtol=0)


def _disc_state(n=96, fixed_h=20.0, gravity="pm", **over):
    from summersph_tpu.models.disc import disc_ic
    cfg = SimConfig(fixed_h=fixed_h, gravity=gravity, neighbor_mode="sorted",
                    decomp="slab", halo_rows=128, grav_halo_rows=128,
                    halo_hops=3,  # tiny slabs: stencils span several devices
                    migrate_rows=128, sorted_block=128, window_group=32,
                    window_blocks=3, grav_window_blocks=3, grav_grid=32,
                    gamma=1.4, eta=1.2, bounding_size=1500.0,
                    sink_capacity=4, h_iter_max=3, dt_init=1e-4, **over)
    state, _ = disc_ic(n=n, r_max=50.0, m_star=1.0, h0=20.0,
                       rotation="keplerian", capacity=n, sink_capacity=4,
                       cfg=cfg, seed=3)
    return state, cfg


def _by_pid(p, arr):
    a = np.asarray(arr)
    alive = np.asarray(p.alive)
    pid = np.asarray(p.pid)[alive]
    order = np.argsort(pid)
    return pid[order], a[alive][order]


def test_decomp_step_matches_single_device_pm():
    """One full step (sorted engine + TreePM + sinks) under the slab
    decomposition == the single-device step, compared by pid (the decomp
    re-owns and re-orders particles)."""
    from summersph_tpu.integrate import prime, step
    from summersph_tpu.parallel import (make_sharded_prime,
                                        make_sharded_step,
                                        pad_state_to_devices, shard_state)

    state, cfg = _disc_state()
    padded = pad_state_to_devices(state, 4)
    gcfg = cfg.with_(decomp="gather")
    ref = step(prime(padded, gcfg), gcfg)

    mesh = make_mesh(4)
    st = shard_state(padded, mesh)
    st = make_sharded_prime(cfg, mesh)(st)
    out = make_sharded_step(cfg, mesh)(st)

    pid_o, _ = _by_pid(out.particles, out.particles.rho)
    pid_r, _ = _by_pid(ref.particles, ref.particles.rho)
    np.testing.assert_array_equal(pid_o, pid_r)
    for f in ("rho", "u", "h", "pressure"):
        _, a = _by_pid(out.particles, getattr(out.particles, f))
        _, b = _by_pid(ref.particles, getattr(ref.particles, f))
        np.testing.assert_allclose(a, b, rtol=5e-6, atol=1e-12, err_msg=f)
    _, v_o = _by_pid(out.particles, out.particles.vel)
    _, v_r = _by_pid(ref.particles, ref.particles.vel)
    # f32 reduction-order noise: the local column blocks align differently
    # than the global sorted array's, so the per-row sums accumulate in a
    # different tree (same candidate set — rho above agrees to 5e-6).
    np.testing.assert_allclose(v_o, v_r, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.dt), float(ref.dt), rtol=1e-6)
    assert int(np.asarray(out.stats)[6]) == 0  # decomp_pressure clean


def test_decomp_variable_h_multistep_accretion():
    """3 decomposed variable-h steps with a fat sink: h iteration on the
    local columns, cross-device accretion, mass conservation — against the
    single-device run."""
    from summersph_tpu.integrate import prime, run_steps
    from summersph_tpu.parallel import (make_sharded_prime,
                                        make_sharded_run_steps,
                                        pad_state_to_devices, shard_state)

    state, cfg = _disc_state(fixed_h=None)
    sinks = state.sinks.replace(radius=jnp.where(state.sinks.alive, 30.0,
                                                 state.sinks.radius))
    state = state.replace(sinks=sinks)
    padded = pad_state_to_devices(state, 4)

    gcfg = cfg.with_(decomp="gather")
    ref = run_steps(prime(padded, gcfg), gcfg, 3)

    mesh = make_mesh(4)
    st = shard_state(padded, mesh)
    st = make_sharded_prime(cfg, mesh)(st)
    out = make_sharded_run_steps(cfg, mesh, n_steps=3)(st)

    assert int(out.particles.n_alive) == int(ref.particles.n_alive)
    assert int(out.particles.n_alive) < 96  # accretion fired
    np.testing.assert_allclose(np.asarray(out.sinks.mass),
                               np.asarray(ref.sinks.mass), rtol=1e-6)
    pid_o, h_o = _by_pid(out.particles, out.particles.h)
    pid_r, h_r = _by_pid(ref.particles, ref.particles.h)
    np.testing.assert_array_equal(pid_o, pid_r)
    np.testing.assert_allclose(h_o, h_r, rtol=1e-5)
    m_tot = float(jnp.sum(jnp.where(out.particles.alive, out.particles.mass,
                                    0.0)) + jnp.sum(out.sinks.mass))
    np.testing.assert_allclose(m_tot, 5.0 + 1.0, rtol=1e-6)


def test_decomp_pallas_interpret_matches_xla():
    """The decomposed Pallas pair kernels (interpret mode) == the
    decomposed XLA engine, same mesh."""
    from summersph_tpu.integrate import prime
    from summersph_tpu.parallel import (make_sharded_prime, make_sharded_step,
                                        pad_state_to_devices, shard_state)

    state, cfg0 = _disc_state(gravity="pm")
    cfg_p = cfg0.with_(use_pallas=True, pallas_interpret=True,
                       pallas_window=256, pallas_fetch_window=384,
                       grav_pallas_window=256, grav_pallas_fetch=384)
    padded = pad_state_to_devices(state, 4)
    mesh = make_mesh(4)

    outs = {}
    for name, cfg in (("xla", cfg0), ("pallas", cfg_p)):
        st = shard_state(padded, mesh)
        st = make_sharded_prime(cfg, mesh)(st)
        outs[name] = make_sharded_step(cfg, mesh)(st)

    a, b = outs["xla"], outs["pallas"]
    pid_a, rho_a = _by_pid(a.particles, a.particles.rho)
    pid_b, rho_b = _by_pid(b.particles, b.particles.rho)
    np.testing.assert_array_equal(pid_a, pid_b)
    np.testing.assert_allclose(rho_a, rho_b, rtol=2e-5)
    _, v_a = _by_pid(a.particles, a.particles.vel)
    _, v_b = _by_pid(b.particles, b.particles.vel)
    np.testing.assert_allclose(v_a, v_b, rtol=2e-4, atol=1e-8)


def test_decomp_kahan_u_rides_redistribution():
    """cfg.kahan_u under decomp: the u_c carry rides the all_to_all /
    sorts and the stepped state matches the single-device kahan run."""
    from summersph_tpu.integrate import init_kahan, prime, run_steps
    from summersph_tpu.parallel import (make_sharded_prime,
                                        make_sharded_run_steps,
                                        pad_state_to_devices, shard_state)

    state, cfg = _disc_state(fixed_h=None, gravity="none")
    cfg = cfg.with_(kahan_u=True)
    padded = pad_state_to_devices(state, 4)

    gcfg = cfg.with_(decomp="gather")
    ref = run_steps(prime(padded, gcfg), gcfg, 2)

    mesh = make_mesh(4)
    st = shard_state(init_kahan(padded, cfg), mesh)
    st = make_sharded_prime(cfg, mesh)(st)
    out = make_sharded_run_steps(cfg, mesh, n_steps=2)(st)

    assert out.particles.u_c is not None
    pid_o, u_o = _by_pid(out.particles, out.particles.u)
    pid_r, u_r = _by_pid(ref.particles, ref.particles.u)
    np.testing.assert_array_equal(pid_o, pid_r)
    np.testing.assert_allclose(u_o, u_r, rtol=1e-5)


def _collective_bytes(hlo_text):
    """(all_gather_elems, permute_elems): summed output elements of
    all-gather / collective-permute ops in an optimized HLO dump."""
    import re
    ag, cp = 0, 0
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r".*= *\w+\[([\d,]*)\][^=]*(all-gather|collective-permute)\(", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        if "all-gather" in m.group(2):
            ag += n
        else:
            cp += n
    return ag, cp


def test_decomp_comm_scales_with_rim_not_n():
    """Comm-volume assertion (VERDICT r2 item 5): the decomposed step's
    gathered bytes are rim/sample-sized, not O(N) — compared directly
    against the gather-mode step on the same inputs, and checked to stay
    flat as the per-device N doubles while the rim stays fixed."""
    from summersph_tpu.integrate import step
    from summersph_tpu.parallel import (pad_state_to_devices, shard_state,
                                        make_sharded_step)
    from summersph_tpu.parallel.sharded import state_specs

    def compiled_text(n, cfg):
        state, _ = _disc_state(n=n, fixed_h=20.0, gravity="none")
        padded = pad_state_to_devices(state, 8)
        mesh = make_mesh(8)
        st = shard_state(padded, mesh)
        fn = make_sharded_step(cfg, mesh)
        return jax.jit(lambda s: fn(s)).lower(st).compile().as_text()

    _, cfg = _disc_state(fixed_h=20.0, gravity="none")
    cfg_g = cfg.with_(decomp="gather")

    ag_s1, cp_s1 = _collective_bytes(compiled_text(1024, cfg))
    ag_s2, cp_s2 = _collective_bytes(compiled_text(4096, cfg))
    ag_g2, _ = _collective_bytes(compiled_text(4096, cfg_g))

    # gather mode all_gathers the particle set; slab mode only samples
    assert ag_g2 > 0
    assert ag_s2 < ag_g2 / 10, (ag_s2, ag_g2)
    # slab all-gather volume is N-independent (splitter samples only)
    assert ag_s2 == ag_s1, (ag_s1, ag_s2)
    # rims ride collective-permute and are halo-sized, not N-sized
    assert cp_s2 == cp_s1, (cp_s1, cp_s2)


def test_exchange_rim_matches_neighbour_rows():
    """Each device's rims equal its rank-neighbours' boundary rows."""
    n = 8 * 512
    p = ball_particles(n, seed=2, dead_frac=0.05)
    cfg = SimConfig(fixed_h=1.0, neighbor_mode="sorted", decomp="slab",
                    migrate_rows=512)
    mesh = make_mesh(8)
    H = 128

    def body(p_sh):
        origin, cell = global_geometry(p_sh, cfg, "dp")
        key, own, _, _, _ = redistribute(p_sh, cfg, "dp", origin, cell)
        rl, rr = exchange_rim(key, own, "dp", H)
        return key, own, rl["key"], rr["key"], rl["pid"], rr["pid"]

    spec = pspec(p)
    fn = jax.jit(_shard_map(
        body, mesh, (spec,),
        (P("dp"), pspec(p), P("dp"), P("dp"), P("dp"), P("dp"))))
    key, own, rl_key, rr_key, rl_pid, rr_pid = fn(p)

    key = np.asarray(key).reshape(8, -1)
    pid = np.asarray(own.pid).reshape(8, -1)
    rl_key = np.asarray(rl_key).reshape(8, H)
    rr_key = np.asarray(rr_key).reshape(8, H)
    rl_pid = np.asarray(rl_pid).reshape(8, H)
    rr_pid = np.asarray(rr_pid).reshape(8, H)

    for d in range(8):
        n_live = (key[d] != SENTINEL_KEY).sum()
        if d == 0:
            assert (rl_key[0] == SENTINEL_KEY).all()
        else:
            nl = (key[d - 1] != SENTINEL_KEY).sum()
            lo = max(nl - H, 0)
            np.testing.assert_array_equal(rl_pid[d][:min(H, nl)],
                                          pid[d - 1][lo:lo + min(H, nl)])
        if d == 7:
            assert (rr_key[7] == SENTINEL_KEY).all()
        else:
            nr = (key[d + 1] != SENTINEL_KEY).sum()
            m = min(H, nr)
            np.testing.assert_array_equal(rr_pid[d][:m], pid[d + 1][:m])
            if nr < H:
                assert (rr_key[d][nr:] == SENTINEL_KEY).all()


def test_pm_long_range_pencil_matches_single_device():
    """Pencil-sharded Poisson solve (ops.mm_dft.poisson_pencil, used by
    pm_long_range under decomp='slab' + grav_fft='matmul'): the sharded
    transform must reproduce the single-device solve at f32 tightness
    while holding only 1/D of the spectrum per device."""
    from summersph_tpu.ops.pm_gravity import grav_tables, pm_long_range

    n_p = 8 * 256
    rng = np.random.default_rng(7)
    pos = np.concatenate([rng.normal(0.0, 3.0, (n_p // 2, 3)),
                          rng.normal(6.0, 1.0, (n_p // 2, 3))])
    p = Particles.create(pos=pos, vel=np.zeros((n_p, 3)),
                         mass=rng.uniform(0.5, 1.5, n_p),
                         u=np.full(n_p, 1.0), h=np.full(n_p, 1.0))
    cfg = SimConfig(gravity="pm", grav_grid=16, grav_fft="matmul",
                    neighbor_mode="sorted", decomp="slab")
    tabs = grav_tables(cfg, jnp.float32)

    acc_ref, _, _, r_s_ref = pm_long_range(p, cfg, kern_k=tabs)

    mesh = make_mesh(8)

    def body(p_sh):
        acc, _, _, r_s = pm_long_range(p_sh, cfg, axis_name="dp",
                                       kern_k=tabs, decomp=True)
        return acc, r_s

    spec = pspec(p)
    fn = jax.jit(_shard_map(body, mesh, (spec,), (P("dp"), P())))
    acc_sh, r_s = fn(p)

    np.testing.assert_allclose(float(r_s), float(r_s_ref), rtol=1e-6)
    scale = float(np.abs(np.asarray(acc_ref)).max())
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_ref),
                               atol=5e-6 * scale)

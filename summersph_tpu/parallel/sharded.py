"""Multi-chip data-parallel execution via shard_map over a device mesh.

The reference's only parallelism is OpenMP loops over a shared array
(SUMMER_SPH.f90:257,302; SURVEY.md §2.3).  The TPU-native scaling axis is a
1-D device mesh with the particle arrays sharded along the capacity
dimension ("dp"):

* each device owns a contiguous shard of particle rows and computes their
  density/force/gravity sums;
* neighbour columns are the all-gathered global particle set (positions and
  pair fields are ~tens of MB at 1e6 particles — one all_gather per pair
  pass over ICI, negligible next to the pair math);
* sinks, t and dt are replicated; their global reductions (accretion sums,
  gas->sink pull, dt minimum, sink-creation argmax) ride psum/pmin/
  all_gather on the mesh axis — see the `axis_name` plumbing in ops/*.

This is the same `integrate.step` code single-chip runs; shard_map just
binds the axis.  The virtual 8-device CPU mesh in tests exercises the
identical program the TPU pod slice would run.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..integrate import force_eval, step
from ..state import Particles, SimState, Sinks

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(devices[:n], (axis,))


def state_specs(axis: str = "dp", kahan_u: bool = False,
                pm_held: bool = False) -> SimState:
    """PartitionSpec pytree for SimState: particles sharded on rows,
    sinks/t/dt replicated.  `kahan_u` / `pm_held` must match whether the
    state carries the optional u_c / acc_ext+pm_r_s fields (pytree
    structures must agree; integrate.init_carries attaches them)."""
    def fill(cls, spec, skip=()):
        return cls(**{f: spec for f in cls.__dataclass_fields__
                      if f not in skip})
    skip = () if kahan_u else ("u_c",)
    if not pm_held:
        skip = skip + ("acc_ext",)
    return SimState(
        particles=fill(Particles, P(axis), skip=skip),
        sinks=fill(Sinks, P()),
        t=P(), dt=P(), stats=P(),
        pm_r_s=P() if pm_held else None,
    )


def pad_state_to_devices(state: SimState, n_devices: int,
                         granule: int = 128) -> SimState:
    """Pad particle capacity to a multiple of n_devices * granule (dead
    slots).  granule=128: each shard stays 128-aligned, which the sharded
    sorted/Pallas engine requires (integrate._force_eval_sorted_sharded)."""
    cap = state.particles.capacity
    rem = (-cap) % (n_devices * max(granule, 1))
    if rem == 0:
        return state
    old = state.particles
    padded = Particles.zeros(cap + rem, old.pos.dtype)
    if old.u_c is not None:  # match the optional-carry pytree structure
        padded = padded.replace(u_c=jnp.zeros((cap + rem,), old.pos.dtype))
    if old.acc_ext is not None:
        padded = padded.replace(
            acc_ext=jnp.zeros((cap + rem, 3), old.pos.dtype))
    merged = jax.tree_util.tree_map(
        lambda full, part: full.at[:cap].set(part), padded, old)
    return state.replace(particles=merged)


def shard_state(state: SimState, mesh: Mesh, axis: str = "dp") -> SimState:
    """Place the state on the mesh with the canonical shardings."""
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        state_specs(axis, kahan_u=state.particles.u_c is not None,
                    pm_held=state.particles.acc_ext is not None),
        is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(state, shardings)


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map with the static replication (VMA) checker off.

    The checker cannot infer that the sink/t/dt outputs are replicated —
    they are: every cross-shard quantity flows through psum / pmin /
    all_gather before touching them, and tests/test_sharding.py asserts
    numerical equality with the single-device step.
    """
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older JAX spelling
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _make_sharded(body2, cfg: SimConfig, mesh: Mesh, axis: str):
    """Wrap body2(state, kern_k) -> state as a jitted shard_map callable of
    state alone.  The gravity tables (integrate._tables) enter the shard_map
    as a *replicated runtime input* (spec P()) — passing them as an argument
    rather than a closure constant keeps the tens-of-MB Green's table out of
    the executable (pm_gravity.green_kernel_k explains the compile-time
    pathology of baking it)."""
    from ..ops.pm_gravity import grav_tables

    specs = state_specs(
        axis, kahan_u=cfg.kahan_u,
        pm_held=cfg.pm_every > 1 and cfg.gravity in ("bh", "pm", "treepm"))
    kern_k = grav_tables(cfg)
    if kern_k is None:
        fn = jax.jit(_shard_map(lambda st: body2(st, None),
                                mesh, (specs,), specs))
        return fn
    fn = jax.jit(_shard_map(body2, mesh, (specs, P()), specs))
    return lambda st: fn(st, kern_k)


def make_sharded_prime(cfg: SimConfig, mesh: Mesh, axis: str = "dp"):
    """Jitted data-parallel force evaluation at the current positions.

    Run once before stepping when `cfg.reuse_forces` (see integrate.prime):
    the carried-rate KDK's first half-kick consumes F(x_0)."""
    def body(state: SimState, kern_k) -> SimState:
        p, s, _ = force_eval(state.particles, state.sinks, cfg,
                             axis_name=axis, kern_k=kern_k)
        return state.replace(particles=p, sinks=s)

    return _make_sharded(body, cfg, mesh, axis)


def make_sharded_step(cfg: SimConfig, mesh: Mesh, axis: str = "dp"):
    """Jitted data-parallel step: SimState (sharded) -> SimState."""
    def body(state: SimState, kern_k) -> SimState:
        return step(state, cfg=cfg, axis_name=axis, kern_k=kern_k)

    return _make_sharded(body, cfg, mesh, axis)


def make_sharded_run_steps(cfg: SimConfig, mesh: Mesh, axis: str = "dp",
                           n_steps: int = 8):
    """Jitted data-parallel scan of n_steps: SimState (sharded) -> SimState.

    Fixed-count scan rather than a while_loop — dynamic-trip loops run ~100x
    slower than their bodies on the target backend.  Drive t-bounded runs
    from the host: loop segments and test `state.t` between them (the same
    pattern as integrate.run_until).
    """
    def body(state: SimState, kern_k):
        # Far-field subcycle phase, as in integrate._run_steps_jit.
        phases = jnp.arange(n_steps, dtype=jnp.int32) % max(cfg.pm_every, 1)
        return jax.lax.scan(
            lambda st, ph: (step(st, cfg, axis_name=axis, kern_k=kern_k,
                                 pm_phase=ph),
                            None),
            state, phases)[0]

    return _make_sharded(body, cfg, mesh, axis)


def sharded_run_until(state: SimState, t_stop, cfg: SimConfig, mesh: Mesh,
                      axis: str = "dp", max_steps: int = 1_000_000,
                      steps_per_sync: int = 8) -> SimState:
    """Host-driven t-bounded multi-chip run (see make_sharded_run_steps)."""
    seg = make_sharded_run_steps(cfg, mesh, axis, steps_per_sync)
    t_stop = float(t_stop)
    done = 0
    while float(state.t) < t_stop and done < max_steps:
        state = seg(state)
        done += steps_per_sync
    return state


__all__ = ["make_mesh", "state_specs", "pad_state_to_devices", "shard_state",
           "make_sharded_prime", "make_sharded_step", "make_sharded_run_steps",
           "sharded_run_until"]

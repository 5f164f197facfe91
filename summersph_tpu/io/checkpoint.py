"""Fast native checkpointing (npz) alongside the reference .txt format.

The reference's only persistence is the text snapshots (SUMMER_SPH.f90:719-738)
which double as restart files.  For large N the text round-trip is slow and
lossy; `save_npz`/`load_npz` provide an exact, fast binary path that preserves
full state (including dt, t, masks, sink spin) for bit-exact resume.
The SimConfig is stored alongside (as JSON) so `resume` continues with the
*same physics* by default — CLI flags act as overrides, not as a silent reset
to defaults.  Writes are atomic (tmp file + rename) so an interrupted run
never leaves a corrupt checkpoint — the reference, by contrast, aborts if a
save file already exists (status="new", SUMMER_SPH.f90:728).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import Particles, SimState, Sinks, STATS_FIELDS


def save_npz(path, state: SimState, cfg: Optional[SimConfig] = None) -> None:
    flat = {}
    for prefix, node in (("p", state.particles), ("s", state.sinks)):
        for name in node.__dataclass_fields__:
            val = getattr(node, name)
            if val is not None:  # optional fields (u_c) save only when set
                flat[f"{prefix}.{name}"] = np.asarray(val)
    flat["t"] = np.asarray(state.t)
    flat["dt"] = np.asarray(state.dt)
    flat["stats"] = np.asarray(state.stats)
    if state.pm_r_s is not None:  # held PM split scale (cfg.pm_every > 1)
        flat["pm_r_s"] = np.asarray(state.pm_r_s)
    if cfg is not None:
        flat["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_npz(path) -> SimState:
    return load_npz_with_config(path)[0]


def load_npz_with_config(path) -> Tuple[SimState, Optional[SimConfig]]:
    """Load (state, config-or-None).  Checkpoints from before a field was
    added load with that field at its default (forward compat)."""
    data = np.load(path)

    def build(cls, prefix):
        return cls(**{name: jnp.asarray(data[f"{prefix}.{name}"])
                      for name in cls.__dataclass_fields__
                      if f"{prefix}.{name}" in data})

    stats = (jnp.asarray(data["stats"]) if "stats" in data
             else jnp.zeros((len(STATS_FIELDS),), jnp.int32))
    if stats.shape[0] < len(STATS_FIELDS):  # pre-slot-growth checkpoint
        stats = jnp.concatenate(
            [stats, jnp.zeros((len(STATS_FIELDS) - stats.shape[0],),
                              jnp.int32)])
    state = SimState(
        particles=build(Particles, "p"),
        sinks=build(Sinks, "s"),
        t=jnp.asarray(data["t"]),
        dt=jnp.asarray(data["dt"]),
        stats=stats,
        pm_r_s=jnp.asarray(data["pm_r_s"]) if "pm_r_s" in data else None,
    )
    cfg = None
    if "config_json" in data:
        raw = json.loads(bytes(data["config_json"].tobytes()).decode())
        known = {k: v for k, v in raw.items()
                 if k in SimConfig.__dataclass_fields__}
        cfg = SimConfig(**known)
    return state, cfg


__all__ = ["save_npz", "load_npz", "load_npz_with_config"]

"""Fast native checkpointing (npz) alongside the reference .txt format.

The reference's only persistence is the text snapshots (SUMMER_SPH.f90:719-738)
which double as restart files.  For large N the text round-trip is slow and
lossy; `save_npz`/`load_npz` provide an exact, fast binary path that preserves
full state (including dt, t, masks, sink spin) for bit-exact resume.
Writes are atomic (tmp file + rename) so an interrupted run never leaves a
corrupt checkpoint — the reference, by contrast, aborts if a save file already
exists (status="new", SUMMER_SPH.f90:728).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..state import Particles, SimState, Sinks


def save_npz(path, state: SimState) -> None:
    flat = {}
    for prefix, node in (("p", state.particles), ("s", state.sinks)):
        for name in node.__dataclass_fields__:
            flat[f"{prefix}.{name}"] = np.asarray(getattr(node, name))
    flat["t"] = np.asarray(state.t)
    flat["dt"] = np.asarray(state.dt)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_npz(path) -> SimState:
    data = np.load(path)
    def build(cls, prefix):
        return cls(**{name: jnp.asarray(data[f"{prefix}.{name}"])
                      for name in cls.__dataclass_fields__})
    return SimState(
        particles=build(Particles, "p"),
        sinks=build(Sinks, "s"),
        t=jnp.asarray(data["t"]),
        dt=jnp.asarray(data["dt"]),
    )


__all__ = ["save_npz", "load_npz"]

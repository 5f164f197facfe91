"""Reference-compatible `.txt` IC / snapshot format.

Format (reference reader /root/reference/SUMMER_SPH.f90:594-716, writer
:719-738; variable-h columns "SUMMER_SPH - Variable.f90":782, 929-941):

* one header line (skipped on read),
* one whitespace-separated row per particle:
      x y z vx vy vz u m [alpha [h]]
* rows with u == 0 are sink particles (README.md:30); their `m` column is the
  sink mass and trailing columns are ignored,
* if the file contains no sink rows, a zero-mass dummy sink is placed at the
  origin (SUMMER_SPH.f90:698-707) so sink arrays are never empty,
* snapshots are valid ICs (same layout), giving de-facto resume.

Deliberate deviations from the reference (documented, not accidental):
* the reference fixed-h reader *ignores* the alpha column and zeroes alpha on
  load (SUMMER_SPH.f90:681 "Change to allow reading from saves" TODO); we
  honour alpha/h columns when present, which is what that TODO asks for.
* `make_save` in the reference opens with status="new" and crashes if the
  file exists (SUMMER_SPH.f90:728); we overwrite idempotently.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..config import SimConfig
from ..state import Particles, Sinks


def read_ic_txt(
    path,
    cfg: Optional[SimConfig] = None,
    capacity: Optional[int] = None,
    sink_capacity: Optional[int] = None,
) -> Tuple[Particles, Sinks]:
    """Read a reference-format IC/snapshot file into state pytrees."""
    cfg = cfg or SimConfig()
    raw = np.loadtxt(path, skiprows=1, ndmin=2)
    if raw.shape[1] < 8:
        raise ValueError(f"{path}: expected >= 8 columns, got {raw.shape[1]}")

    u = raw[:, 6]
    is_sink = u == 0.0
    gas, snk = raw[~is_sink], raw[is_sink]

    ncols = raw.shape[1]
    alpha = gas[:, 8] if ncols >= 9 else np.full(len(gas), 0.1)
    if ncols >= 10:
        h = gas[:, 9]
    else:
        h = np.full(len(gas), cfg.fixed_h if cfg.fixed_h is not None else 1.0)

    dtype = cfg.np_dtype()
    particles = Particles.create(
        pos=gas[:, 0:3], vel=gas[:, 3:6], mass=gas[:, 7], u=gas[:, 6],
        alpha=alpha, h=h, capacity=capacity, dtype=dtype,
    )

    sink_cap = sink_capacity if sink_capacity is not None else max(cfg.sink_capacity, max(len(snk), 1))
    if len(snk) > 0:
        sinks = Sinks.create(
            pos=snk[:, 0:3], vel=snk[:, 3:6], mass=snk[:, 7],
            radius=np.full(len(snk), cfg.sink_radius),
            capacity=sink_cap, dtype=dtype,
        )
    else:
        # Dummy zero-mass origin sink (SUMMER_SPH.f90:698-707).
        sinks = Sinks.create(
            pos=np.zeros((1, 3)), vel=np.zeros((1, 3)), mass=[0.0],
            radius=[0.0], capacity=sink_cap, dtype=dtype,
        )
    return particles, sinks


_HEADER_8 = "x y z vx vy vz energy mass"
_HEADER_9 = _HEADER_8 + " alpha"
_HEADER_10 = _HEADER_9 + " smoothing"


def write_snapshot_txt(path, particles: Particles, sinks: Sinks,
                       columns: int = 9) -> None:
    """Write a reference-format snapshot (gas rows then sink rows with u=0).

    `columns` selects the generation flavour: 9 = fixed-h (x..m alpha,
    SUMMER_SPH.f90:729-735), 10 = variable-h (adds h, V:929-941), 8 = minimal
    IC layout.  Only live particles/sinks are written (the reference pack()s
    its arrays, so dead slots never reach disk).
    """
    p = {k: np.asarray(getattr(particles, k)) for k in
         ("pos", "vel", "u", "mass", "alpha", "h", "alive")}
    s = {k: np.asarray(getattr(sinks, k)) for k in ("pos", "vel", "mass", "alive")}
    ga = p["alive"]
    sa = s["alive"]

    gcols = [p["pos"][ga], p["vel"][ga], p["u"][ga, None], p["mass"][ga, None]]
    if columns >= 9:
        gcols.append(p["alpha"][ga, None])
    if columns >= 10:
        gcols.append(p["h"][ga, None])
    gas = np.concatenate(gcols, axis=1)

    nsink = int(sa.sum())
    sink_rows = np.zeros((nsink, gas.shape[1]))
    sink_rows[:, 0:3] = s["pos"][sa]
    sink_rows[:, 3:6] = s["vel"][sa]
    sink_rows[:, 7] = s["mass"][sa]

    header = {8: _HEADER_8, 9: _HEADER_9, 10: _HEADER_10}[columns]
    np.savetxt(path, np.concatenate([gas, sink_rows], axis=0),
               header=header, comments="", fmt="%.17g")


def save_path(directory, number: int) -> str:
    """`saveN.txt` naming, matching SUMMER_SPH.f90:726."""
    return os.path.join(directory, f"save{number}.txt")


__all__ = ["read_ic_txt", "write_snapshot_txt", "save_path"]

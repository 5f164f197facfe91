"""IC file generation (runnable `Disc_ICs.py` equivalent).

The reference's generator (/root/reference/Disc_ICs.py:1-41) documents the
intended recipe — rejection-sampled uniform sphere, azimuthal velocity
field, u = 0.25, m = 5/N, alpha = 0.1, 9-column space-separated text — but
is an unrunnable fragment (missing imports, undefined `r`).  This tool uses
the engine's model generators (models.disc / models.ring / models.sod) and
writes reference-format `.txt` IC files any generation of the Fortran code
(or this engine) can read.
"""

from __future__ import annotations

from ..io.txt import write_snapshot_txt
from ..models.disc import collapse_ic, disc_ic
from ..models.ring import ring_ic
from ..models.sod import sod_ic


GENERATORS = {
    # name -> (fn, default kwargs, snapshot columns)
    "disc": (disc_ic, dict(n=12000, r_max=100.0, m_disc=5.0, m_star=5.0,
                           rotation="keplerian"), 9),
    "rigid-sphere": (disc_ic, dict(n=12000, r_max=100.0, m_disc=5.0,
                                   m_star=0.0, rotation="rigid"), 9),
    "collapse": (collapse_ic, dict(n=20000, r_max=100.0, m_total=5.0), 9),
    "ring": (ring_ic, dict(n=4000, r0=50.0, width=5.0), 9),
    "sod": (sod_ic, dict(n=1000), 9),
}


def make_ics(kind: str, out_path: str, **overrides) -> str:
    """Generate ICs of the given kind and write a reference-format file."""
    if kind not in GENERATORS:
        raise ValueError(f"unknown IC kind {kind!r}; choose from "
                         f"{sorted(GENERATORS)}")
    fn, defaults, columns = GENERATORS[kind]
    kw = dict(defaults)
    kw.update(overrides)
    state, _cfg = fn(**kw)
    write_snapshot_txt(out_path, state.particles, state.sinks,
                       columns=columns)
    return out_path


__all__ = ["make_ics", "GENERATORS"]

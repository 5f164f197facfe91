"""Canonical simulation setups (the graded configs, BASELINE.md).

1. `sod`  — 1D Sod shock tube (quasi-1D particle line, fixed h, no gravity)
2. `ring` — 2D thin ring with artificial viscosity around a central sink
3. `disc` — uniform (Keplerian or rigidly rotating) disc/sphere with a
            central sink; also the self-gravitating collapse setup
"""

from . import sod, ring, disc

__all__ = ["sod", "ring", "disc"]

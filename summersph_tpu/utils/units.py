"""Unit system for summersph-tpu.

The engine works in the reference unit system (AU, M_sun, yr), in which the
gravitational constant is G = 4*pi^2 (Kepler's third law for a 1 M_sun star at
1 AU with a 1 yr period).  Reference: /root/reference/SUMMER_SPH.f90:7
(`G = 39.47841760435743  AU^3/(Msun*yr^2)`).
"""

import math

# Gravitational constant in AU^3 / (M_sun * yr^2).  Exactly the value the
# reference hardcodes (= 4*pi^2 to the printed precision).
G = 39.47841760435743

# Convenience: the closed form.  G and FOUR_PI_SQ agree to ~1e-16 relative.
FOUR_PI_SQ = 4.0 * math.pi ** 2

PI = math.pi

__all__ = ["G", "FOUR_PI_SQ", "PI"]

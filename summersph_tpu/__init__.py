"""summersph-tpu: a TPU-native SPH engine (JAX/XLA/Pallas).

Rebuild of the SUMMERSPH Fortran reference as an idiomatic TPU framework:
cubic-spline SPH with Monaghan artificial viscosity and the Morris-Monaghan
alpha switch, softened self-gravity, fixed and variable (grad-h) smoothing
lengths, sink particles (accretion / creation / culling), KDK leapfrog with
adaptive global timestep, and the reference's `.txt` IC/snapshot formats.
See SURVEY.md for the component map and reference citations.
"""

from .config import SimConfig, read_parameters_txt, write_parameters_txt
from .state import Particles, SimState, Sinks
from .integrate import force_eval, prime, run_until, simulate, step

__version__ = "0.1.0"

__all__ = [
    "SimConfig", "read_parameters_txt", "write_parameters_txt",
    "Particles", "Sinks", "SimState",
    "force_eval", "prime", "step", "run_until", "simulate",
]

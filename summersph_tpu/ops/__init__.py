from . import kernels, pairs, eos, density, forces, gravity, neighbors, sinks, smoothing, timestep

__all__ = ["kernels", "pairs", "eos", "density", "forces", "gravity",
           "neighbors", "sinks", "smoothing", "timestep"]

"""SPH density projection imaging (reference `Density_Image.py` equivalent).

The reference tool (/root/reference/Density_Image.py:1-155) loads a
`saveN.txt` snapshot, treats the final row as the star, runs a cKDTree
fixed-radius query per point of a 120^3 grid with a numba-jit cubic spline,
z-projects, and shows an inferno imshow with the sink overlaid.

This version evaluates the same quantity as one vectorised JAX computation:
grid points in batches against all particles (dense masked kernel sums —
image grids are small, so the O(grid x N) product is cheap on device), and
works directly from a snapshot file or an in-memory SimState.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops.kernels import kernel_w
from ..state import Particles, Sinks


def density_grid(
    pos: np.ndarray, mass: np.ndarray, h,
    resolution: int = 120, box: float = 100.0,
    batch: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """SPH density on a resolution^3 grid over [-box, box]^3.

    Returns (grid_density [R,R,R], axis coordinates [R]).  Matches the
    reference's per-gridpoint sum_j m_j W(|x_g - x_j|, h)
    (Density_Image.py:130-139) with h fixed (or per-particle if an array).
    """
    xi = np.linspace(-box, box, resolution)
    X, Y, Z = np.meshgrid(xi, xi, xi, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    posj = jnp.asarray(pos, jnp.float32)
    mj = jnp.asarray(mass, jnp.float32)
    hj = jnp.broadcast_to(jnp.asarray(h, jnp.float32), mj.shape)

    @jax.jit
    def batch_density(p_batch):
        d = p_batch[:, None, :] - posj[None, :, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        return jnp.sum(mj[None, :] * kernel_w(r, hj[None, :]), axis=-1)

    out = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), batch):
        chunk = pts[i:i + batch]
        m = len(chunk)
        if m < batch:  # pad to the static batch shape
            chunk = np.concatenate([chunk, np.zeros((batch - m, 3), chunk.dtype)])
        vals = np.asarray(batch_density(jnp.asarray(chunk, jnp.float32)))
        out[i:i + m] = vals[:m]
    return out.reshape(resolution, resolution, resolution), xi


def projected_density_from_snapshot(
    path, h: Optional[float] = None, resolution: int = 120, box: float = 100.0,
):
    """Load a reference-format snapshot and z-project its SPH density.

    Returns (projected [R,R], axis, sink_xy [S,2]).  Like the reference,
    u==0 rows are the sinks (read via the engine's reader rather than
    positional last-row slicing, Density_Image.py:76-78, which breaks for
    multi-sink snapshots).
    """
    from ..io.txt import read_ic_txt

    p, s = read_ic_txt(path, SimConfig())
    return projected_density(p, s, h=h, resolution=resolution, box=box)


def projected_density(p: Particles, s: Sinks, h: Optional[float] = None,
                      resolution: int = 120, box: float = 100.0):
    alive = np.asarray(p.alive)
    pos = np.asarray(p.pos)[alive]
    mass = np.asarray(p.mass)[alive]
    hval = h if h is not None else np.asarray(p.h)[alive]

    inside = np.all(np.abs(pos) < box, axis=1)   # Density_Image.py:64-74
    grid, xi = density_grid(pos[inside], mass[inside],
                            hval if np.isscalar(hval) else hval[inside],
                            resolution=resolution, box=box)
    projected = grid.sum(axis=2)                 # z-projection, :143
    sink_alive = np.asarray(s.alive)
    sink_xy = np.asarray(s.pos)[sink_alive][:, :2]
    return projected, xi, sink_xy


def save_image(projected, xi, sink_xy, out_path, title="Integrated SPH density"):
    """Render the projection with the reference's presentation (inferno,
    origin lower, sink overlaid red; Density_Image.py:146-155)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(projected.T, origin="lower",
                   extent=[xi[0], xi[-1], xi[0], xi[-1]], cmap="inferno")
    fig.colorbar(im, ax=ax, label="Integrated density")
    ax.set_title(title)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    for sx, sy in sink_xy:
        if abs(sx) < xi[-1] and abs(sy) < xi[-1]:
            ax.plot(sx, sy, ".", color="red", markersize=3)
    fig.savefig(out_path, dpi=130, bbox_inches="tight")
    plt.close(fig)


__all__ = ["density_grid", "projected_density",
           "projected_density_from_snapshot", "save_image"]

"""Measure sorted-window extents for a config: how big must the per-slab
candidate windows (cfg.pallas_window / cfg.window_blocks * 128) be for exact
coverage?  Prints percentiles of (end - aligned_start) over groups/slabs.

Usage: python scripts/window_stats.py [N] [B]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (sitecustomize may have imported jax already —
# the env pins JAX_PLATFORMS to the TPU tunnel, so override via config)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from summersph_tpu.config import SimConfig
from summersph_tpu.models.disc import disc_ic
from summersph_tpu.ops.sorted_grid import LANES, sort_particles


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(fixed_h=h0, neighbor_mode="sorted", sorted_block=B)
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)
    _, grid = sort_particles(state.particles, cfg)
    starts = np.asarray(grid.starts)
    ends = np.asarray(grid.ends)
    ext = ends - (starts // LANES) * LANES
    print(f"N={n} B={B} slabs per group: {starts.shape[1]}")
    for q in (50, 90, 99, 99.9, 100):
        print(f"  p{q:g}: {np.percentile(ext, q):.0f}")
    for W in (256, 384, 512, 640, 768, 1024):
        dropped = np.maximum(ext - W, 0).sum()
        print(f"  W={W}: dropped {dropped}")


if __name__ == "__main__":
    main()

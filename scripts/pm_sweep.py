"""Gravity-on throughput sweep at the graded N=1e6 (round 4, on chip).

Levers measured together for the pm headline (VERDICT r3 item 1):
  * grav_grid 128 vs 256 — the matmul-DFT (ops/mm_dft.py) made the
    512^3-padded transform 26.5 ms, so the 256 mesh's 3.5x smaller
    short-range windows are finally affordable;
  * pm_every 1/4/8 — RESPA far-field subcycling amortizes the CIC
    deposit/gather (68 + 59 ms, the remaining long-range cost);
  * pallas_exact_windows — rotated 128-lane windows on the SPH AND
    short-range gravity kernels.

Uses bench.run_config so the measured cell is exactly what bench.py will
report.  Usage: python scripts/pm_sweep.py [cells...] where a cell is
grid,pm_every,exact e.g. 256,4,1; default sweeps the interesting set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import bench


def main():
    cells = []
    for a in sys.argv[1:]:
        g, pe, ex = a.split(",")
        cells.append((int(g), int(pe), int(ex)))
    if not cells:
        cells = [(128, 1, 0), (128, 4, 1), (256, 4, 0), (256, 4, 1),
                 (256, 8, 1)]
    n = int(os.environ.get("BENCH_N", 1048576))
    steps = int(os.environ.get("BENCH_STEPS", 16))
    import jax
    print(f"platform={jax.devices()[0].platform} N={n}", flush=True)
    for grid, pe, ex in cells:
        os.environ["BENCH_EXACT"] = str(ex)
        try:
            v, util = bench.run_config(n, steps, "pm", True,
                                       grav_grid=grid, pm_every=pe)
            print(f"grid={grid} pm_every={pe} exact={ex}: {v:.3e} "
                  f"p-steps/s  util={util}", flush=True)
        except Exception as e:
            print(f"grid={grid} pm_every={pe} exact={ex}: FAILED {e}",
                  flush=True)


if __name__ == "__main__":
    main()

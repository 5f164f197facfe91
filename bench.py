"""Benchmark: particle-steps/sec on a Keplerian disc (BASELINE.md metric).

Runs on whatever backend JAX picks (the driver runs this on the real TPU
chip).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "sweep": {...}}
vs_baseline is value / 1e8 — the BASELINE.json north star (1e8
particle-steps/sec on a 1e6-particle Keplerian disc on v5e-8; the reference
publishes no numbers of its own, BASELINE.md).  The headline value is the
graded config: N=1e6, single chip.  `sweep` adds smaller-N and
self-gravity (TreePM) variants.

Env knobs: BENCH_N / BENCH_STEPS / BENCH_GRAVITY / BENCH_PALLAS override the
headline config; BENCH_SWEEP=0 skips the sweep (faster CI runs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_config(n, steps, gravity, use_pallas=True):
    """particle-steps/sec for one configuration."""
    import numpy as np

    from summersph_tpu.config import SimConfig
    from summersph_tpu.integrate import prime, run_steps
    from summersph_tpu.models.disc import disc_ic

    # Keplerian disc around a central sink (graded config 3/5 geometry).
    # h chosen so the kernel support holds ~60 neighbours at this N.
    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    # Short-range gravity window: r_cut-cell occupancy scales ~linearly
    # with N at fixed mesh/box (rho * r_cut^3), so size the Pallas gravity
    # windows by N (the in-step grav_window_overflow counter guards drops).
    gw = 384 if n <= 262144 else (512 if n <= 524288 else 768)
    cfg = SimConfig(
        fixed_h=h0, gravity=gravity, neighbor_mode="sorted",
        use_pallas=use_pallas, sorted_block=128, window_group=32,
        pallas_window=256, pallas_fetch_window=768,
        grav_pallas_window=gw, grav_pallas_fetch=gw + 384,
        window_blocks=3, grav_window_blocks=8,
        gamma=1.4, bounding_size=1500.0,
        dt_init=1e-4, dt_min=1e-5, dt_max=1e-3,
    )
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)

    def sync(st):
        # block_until_ready can return without syncing on the tunneled
        # backend (docs/PERF_NOTES.md caveat 1): force a host transfer.
        return float(np.asarray(st.t))

    # Prime the carried-rate KDK (one force evaluation at x_0), then warm up
    # with the same scan length (scan length is a static shape — a different
    # warmup length would leave the compile inside the timing).
    state = prime(state, cfg)
    wu = run_steps(state, cfg, steps)
    sync(wu)

    t0 = time.perf_counter()
    out = run_steps(wu, cfg, steps)
    sync(out)
    dt_wall = time.perf_counter() - t0

    alive = int(out.particles.n_alive)
    return alive * steps / dt_wall


def main():
    n = int(os.environ.get("BENCH_N", 1048576))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    gravity = os.environ.get("BENCH_GRAVITY", "none")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    do_sweep = os.environ.get("BENCH_SWEEP", "1") == "1"

    import jax
    try:  # persistent compile cache (first compiles are minutes on the tunnel)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    value = run_config(n, steps, gravity, use_pallas)
    sweep = {}
    if do_sweep:
        for sn, sg in ((131072, "none"), (n, "pm")):
            if (sn, sg) == (n, gravity):
                continue
            try:
                sweep[f"N={sn},gravity={sg}"] = run_config(
                    sn, steps, sg, use_pallas)
            except Exception as e:  # sweep is best-effort extra evidence
                sweep[f"N={sn},gravity={sg}"] = f"failed: {e}"

    print(json.dumps({
        "metric": f"particle-steps/sec (Keplerian disc, N={n}, "
                  f"gravity={gravity}, single chip)",
        "value": value,
        "unit": "particle-steps/sec",
        "vs_baseline": value / 1e8,
        "sweep": sweep,
    }))


if __name__ == "__main__":
    main()

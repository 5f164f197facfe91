"""jax.profiler device trace of the simulation step, with source mapping.

Captures a trace of `k` steps on the live backend, then prints the top
device ops by total time, each mapped back to its source line via the
compiled HLO metadata — the workflow that located every round-2 hotspot
(searchsorted bisection loops, sink scatter-adds, pack construction).

Usage: python scripts/trace_step.py [N] [k]
Env: TRACE_GRAVITY (none|pm), TRACE_VARH=1, TRACE_OUT (default /tmp/jaxtrace)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from summersph_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from summersph_tpu.config import SimConfig
from summersph_tpu.integrate import prime, step
from summersph_tpu.models.disc import disc_ic


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    gravity = os.environ.get("TRACE_GRAVITY", "none")
    variable_h = os.environ.get("TRACE_VARH", "0") == "1"
    out_dir = os.environ.get("TRACE_OUT", "/tmp/jaxtrace")

    h0 = 100.0 * (60.0 / n) ** (1.0 / 3.0) / 2.0
    cfg = SimConfig(
        fixed_h=None if variable_h else h0, gravity=gravity,
        neighbor_mode="sorted", use_pallas=True,
        sorted_block=128, window_group=32,
        pallas_window=256, pallas_fetch_window=768,
        gamma=1.4, bounding_size=1500.0,
        dt_init=1e-4, dt_min=1e-5, dt_max=1e-3)
    state, _ = disc_ic(n=n, r_max=100.0, m_star=5.0, h0=h0,
                       rotation="keplerian", cfg=cfg, seed=0)

    from summersph_tpu.ops.pm_gravity import grav_tables
    kk = grav_tables(cfg)  # jit argument, never a baked constant

    @jax.jit
    def run(st, kk=None):
        return jax.lax.scan(lambda c, _: (step(c, cfg, kern_k=kk), None),
                            st, None, length=k)[0]

    st = prime(state, cfg)
    out = run(st, kk)
    np.asarray(jnp.ravel(out.t))  # warm (4-byte sync — PERF_NOTES caveat 2)
    with jax.profiler.trace(out_dir):
        out = run(st, kk)
        np.asarray(jnp.ravel(out.t))

    hlo = jax.jit(run).lower(st, kk).compile().as_text()

    path = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e.get("pid"), ""):
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1

    def describe(name):
        m = re.search(rf'%{re.escape(name)} = [^\n]*', hlo)
        if not m:
            return ""
        meta = re.search(
            r'op_name="([^"]*)"[^}]*source_file="([^"]*)"'
            r'[^}]*source_line=(\d+)', m.group(0))
        if meta:
            return (f"{meta.group(1).split('/')[-1][:40]} "
                    f"{meta.group(2).split('/')[-1]}:{meta.group(3)}")
        return ""

    print(f"\nN={n} k={k} gravity={gravity} variable_h={variable_h} — "
          f"top device ops (ms total over {k} steps):")
    for name, d in tot.most_common(30):
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:4d}  {name:32s} "
              f"{describe(name)}")


if __name__ == "__main__":
    main()

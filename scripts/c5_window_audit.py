"""Audit the short-range gravity window drops on a config-5 checkpoint.

The run's `grav_window_overflow` stats slot counts CANDIDATE lanes beyond
the planned window slices (~5e8/step in the fragmenting phase, ~6% of
candidate lanes).  Candidates are cell-stencil members, not true pairs —
this script measures what actually matters physically, entirely offline
(numpy, mirrors ops/pm_gravity.pm_short_range + ops/pallas_pairs.window_plan):

  * the fraction of TRUE within-r_cut pairs dropped, and
  * the sampled relative force contribution |sum Gm r/r^3| of the dropped
    pairs vs the kept short-range pairs, per affected row.

Usage: python scripts/c5_window_audit.py [--ckpt .../checkpoint.npz]
       [--sample-groups 400]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from summersph_tpu.ops.neighbors import SENTINEL_KEY, WINDOW, WINDOW_BITS

KX = 1 << (2 * WINDOW_BITS)
KY = 1 << WINDOW_BITS
PLANE_OFFSETS = np.array([dx * KX + dy * KY
                          for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                         np.int64)
LANES = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="docs/results/collapse1m/checkpoint.npz")
    ap.add_argument("--sample-groups", type=int, default=400)
    args = ap.parse_args()

    d = np.load(args.ckpt)
    cfg = json.loads(bytes(d["config_json"]).decode())
    pos = d["p.pos"].astype(np.float32)
    alive = d["p.alive"]
    mass = np.where(alive, d["p.mass"], 0.0).astype(np.float32)

    # r_s / r_cut exactly as pm_long_range / effective_rcut_rs derive them
    n_mesh = cfg["grav_grid"]
    lo = pos[alive].min(axis=0)
    hi = pos[alive].max(axis=0)
    cell_pm = max((hi - lo).max(), 1e-6) / (n_mesh - 3)
    r_s = cfg["grav_split_rs"] * cell_pm
    rcut_rs = cfg.get("grav_rcut_rs") or min(max(2.25 / cfg["theta"], 3.0), 8.0)
    r_cut = rcut_rs * r_s

    # gravity sort (cell = r_cut, min-corner origin), as pm_short_range
    origin = pos[alive].min(axis=0)
    c = np.clip(np.floor((pos - origin) / r_cut), 0, WINDOW - 1).astype(np.int64)
    key = np.where(alive,
                   (c[:, 0] << (2 * WINDOW_BITS)) | (c[:, 1] << WINDOW_BITS)
                   | c[:, 2], SENTINEL_KEY)
    B = cfg["window_group"]
    cap = pos.shape[0]
    pad_to = -(-cap // max(cfg["sorted_block"], LANES)) * max(
        cfg["sorted_block"], LANES)
    order = np.argsort(key, kind="stable")
    key_s = np.full(pad_to, SENTINEL_KEY, np.int64)
    key_s[:cap] = key[order]
    pos_s = np.zeros((pad_to, 3), np.float32)
    pos_s[:cap] = pos[order]
    m_s = np.zeros(pad_to, np.float32)
    m_s[:cap] = mass[order]

    Gn = pad_to // B
    kmin = key_s.reshape(Gn, B)[:, 0]
    kmax = key_s.reshape(Gn, B)[:, -1]
    first_dead = int((key_s != SENTINEL_KEY).sum())
    lo_w = kmin[:, None] + PLANE_OFFSETS[None, :] - 1
    hi_w = kmax[:, None] + PLANE_OFFSETS[None, :] + 1
    starts = np.searchsorted(key_s, lo_w.ravel(), side="left").reshape(Gn, 9)
    ends = np.searchsorted(key_s, hi_w.ravel(), side="right").reshape(Gn, 9)
    ends = np.maximum(np.minimum(ends, first_dead), starts)

    # window_plan coverage at the gravity knobs
    W = cfg["grav_pallas_window"]
    WB = min(cfg["grav_pallas_fetch"], pad_to)
    S = cfg["sorted_block"] // B
    aligned = (starts // LANES) * LANES
    a3 = aligned.reshape(Gn // S, S, 9)
    prog = np.minimum(a3.min(axis=1), max(pad_to - WB, 0))
    sub = np.clip((a3 - prog[:, None, :]) // LANES, 0,
                  min((WB - W) // LANES, 7))
    eff = (prog[:, None, :] + sub * LANES).reshape(Gn, 9)
    need = -((eff - ends) // W)
    fit = (WB - sub.reshape(Gn, 9) * LANES) // W
    nsl = np.clip(need, 1, np.minimum(fit, 8))
    covered = eff + nsl * W

    dropped = np.maximum(ends - covered, 0)
    total_cand = np.maximum(ends - starts, 0)
    print(f"r_s={r_s:.4f} r_cut={r_cut:.4f}  candidates/row="
          f"{total_cand.sum(axis=1).sum() / first_dead:.0f}")
    print(f"dropped candidates: {dropped.sum():,} of {total_cand.sum():,} "
          f"({100 * dropped.sum() / total_cand.sum():.2f}%)")
    g_aff = np.where(dropped.sum(axis=1) > 0)[0]
    print(f"groups affected: {len(g_aff)}/{Gn} "
          f"({100 * len(g_aff) / Gn:.1f}%)")

    # Sampled truth: for affected groups, count true pairs and the force
    # contribution of dropped vs kept candidates.
    rng = np.random.default_rng(0)
    samp = rng.choice(g_aff, min(args.sample_groups, len(g_aff)),
                      replace=False)
    true_kept = true_drop = 0
    f_ratio = []
    for g in samp:
        rows = slice(g * B, (g + 1) * B)
        rp = pos_s[rows]
        acc_kept = np.zeros((B, 3))
        acc_drop = np.zeros((B, 3))
        for o in range(9):
            s0, e0, c0 = starts[g, o], ends[g, o], covered[g, o]
            e_k = min(e0, c0)
            for lo_i, hi_i, acc, tag in ((s0, e_k, acc_kept, "k"),
                                         (e_k, e0, acc_drop, "d")):
                if hi_i <= lo_i:
                    continue
                cp = pos_s[lo_i:hi_i]
                cm = m_s[lo_i:hi_i]
                dr = cp[None, :, :] - rp[:, None, :]
                r2 = (dr ** 2).sum(-1)
                inr = (r2 > 0) & (r2 < r_cut ** 2)
                if tag == "k":
                    true_kept += int(inr.sum())
                else:
                    true_drop += int(inr.sum())
                w = np.where(inr, cm / np.maximum(r2, 1e-12) ** 1.5, 0.0)
                acc += (w[:, :, None] * dr).sum(axis=1)
        # exact total gravity for these rows (direct sum over ALL mass,
        # unsoftened beyond r > 0) — the denominator that matters: the
        # dropped short-range correction vs the row's full gravitational
        # acceleration (PM long-range + kept short-range ~ this, up to the
        # PM method error which is <<1%).
        a_exact = np.zeros((B, 3))
        chunk = 65536
        for s0 in range(0, first_dead, chunk):
            cp = pos_s[s0:s0 + chunk]
            cm = m_s[s0:s0 + chunk]
            dr = cp[None, :, :] - rp[:, None, :]
            r2 = (dr ** 2).sum(-1)
            w = np.where(r2 > 0, cm / np.maximum(r2, 1e-12) ** 1.5, 0.0)
            a_exact += (w[:, :, None] * dr).sum(axis=1)
        a_d = np.linalg.norm(acc_drop, axis=1)
        a_t = np.linalg.norm(a_exact, axis=1)
        nz = a_t > 0
        if nz.any():
            f_ratio.append(a_d[nz] / a_t[nz])
    f_ratio = np.concatenate(f_ratio) if f_ratio else np.zeros(1)
    tot = true_kept + true_drop
    print(f"sampled true pairs (affected groups): {tot:,}; dropped "
          f"{true_drop:,} ({100 * true_drop / max(tot, 1):.2f}%)")
    print("|dropped short-range| / |exact total gravity| per row "
          "(affected groups): "
          f"median {np.median(f_ratio):.2e}  p90 {np.percentile(f_ratio, 90):.2e}"
          f"  p99 {np.percentile(f_ratio, 99):.2e}  max {f_ratio.max():.2e}")


if __name__ == "__main__":
    main()

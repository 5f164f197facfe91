"""Simulation configuration.

The fixed-h reference generation hardcodes its parameters as compile-time
constants (/root/reference/SUMMER_SPH.f90:7-11) and the variable-h generation
reads a 9-field single-line `parameters.txt`
("SUMMER_SPH - Variable.f90":54-64, 854-919):

    bounding_size max_depth theta gamma eta convergence_criteria
    max_length timestep_scale end_time

`SimConfig` is the engine-native superset: those nine fields plus the knobs
the reference hardcodes elsewhere (alpha-switch constants SUMMER_SPH.f90:317,
viscosity beta=2*alpha SUMMER_SPH.f90:378, dt hysteresis bounds
SUMMER_SPH.f90:855-859, sink radius SUMMER_SPH.f90:694, save cadence
SUMMER_SPH.f90:868-874) and TPU-engine parameters (cell-grid sizing, gravity
mode, dtype).  It is a frozen (hashable) dataclass so jitted functions can
close over it as a static value.  `read_parameters_txt` /
`write_parameters_txt` round-trip the reference file format.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SimConfig:
    # --- the reference `parameters.txt` nine ("SUMMER_SPH - Variable.f90":54-64)
    bounding_size: float = 1500.0       # SUMMER_SPH.f90:11
    max_depth: int = 1000               # SUMMER_SPH.f90:8 (tree depth; unused by cell grid)
    theta: float = 0.5                  # BH opening angle, SUMMER_SPH.f90:825
    gamma: float = 1.4                  # adiabatic index, SUMMER_SPH.f90:465-466
    eta: float = 1.2                    # h = eta (m/rho)^(1/3) target, V:529
    convergence_criteria: float = 1.0e-3  # h-iteration relative tolerance, V:534
    max_length: float = 100.0           # h upper bound during iteration, V:531
    timestep_scale: float = 0.25        # dt safety factor, SUMMER_SPH.f90:851
    end_time: float = 1000.0            # SUMMER_SPH.f90:873

    # --- smoothing-length mode
    # fixed_h set => fixed smoothing length everywhere (reference fixed-h
    # generation, h=2.5, SUMMER_SPH.f90:11); None => variable grad-h SPH.
    fixed_h: Optional[float] = 2.5

    # --- artificial viscosity (Monaghan + Morris-Monaghan switch)
    alpha_min: float = 0.1              # decay floor, SUMMER_SPH.f90:317
    alpha_decay: float = 0.15           # decay rate coefficient, SUMMER_SPH.f90:317
    beta_factor: float = 2.0            # Pi uses beta = beta_factor*alpha, SUMMER_SPH.f90:378
    av_eps: float = 0.01                # mu denominator softening, SUMMER_SPH.f90:373

    # --- timestep control (SUMMER_SPH.f90:831-860)
    dt_init: float = 1.0e-2             # SUMMER_SPH.f90:875
    dt_max: float = 0.1                 # grow cap, SUMMER_SPH.f90:855
    dt_min: float = 1.0e-4              # shrink floor, SUMMER_SPH.f90:857
    dt_grow: float = 1.5
    dt_shrink: float = 0.5
    # Bound dt by the candidate directly (collapse guard — ops/timestep.py
    # module docstring); False restores the literal reference hysteresis
    # (SUMMER_SPH.f90:855-859), which cannot track a collapse runaway.
    dt_bound_candidate: bool = True
    # Hierarchical block timesteps (blockstep.py): dt_bins power-of-two
    # rungs below the base step, dt_r = dt_base / 2^r; only the particles
    # closing a rung boundary get force re-evaluations each substep (the
    # Pallas kernels skip inactive row blocks).  1 = global timestep (the
    # reference's scheme, SUMMER_SPH.f90:831-860 — dt_bins > 1 is a
    # documented deviation for collapse-class runs whose dt ranges span
    # 1000x; see docs/ROUND4.md).  Requires the single-chip sorted engine
    # with reuse_forces.
    dt_bins: int = 1

    # --- output cadence: n_saves evenly spaced checkpoints over end_time
    n_saves: int = 1000                 # SUMMER_SPH.f90:868-874

    # --- sinks
    sink_radius: float = 3.5            # default accretion radius for ICs, SUMMER_SPH.f90:694
    sink_capacity: int = 8              # fixed sink-slot count (creation fills slots)
    sink_create_density: float = 0.5    # creation threshold m(eta/h)^3 > 0.5, V:560
    sink_create_mass: float = 1.0e-11   # seed mass of a created sink, V:581
    # Merge sinks closer than sink_merge_factor * min(radius_i, radius_j)
    # (ops/sinks.merge_sinks).  0 disables — the literal reference
    # behaviour: its `check_sink_merger` is an empty stub
    # ("SUMMER_SPH - Variable.f90":1067-1073).  Enable (~1.0) for
    # fragmenting collapses, where unmergeable sink pairs otherwise
    # saturate `sink_capacity`.
    sink_merge_factor: float = 0.0

    # --- gravity
    # 'none'   : no self-gravity (Sod tube / ring configs)
    # 'direct' : chunked all-pairs softened gravity (exact oracle)
    # 'pm'     : FFT particle-mesh + short-range correction (TreePM split) —
    #            the O(N log N) replacement for the reference's theta=0.5
    #            Barnes-Hut monopole walk, with comparable (~1%) force error.
    # 'bh'     : accepted as a reference-compat *alias* of 'pm' (there is no
    #            recursive tree walk in this engine); `theta` maps onto the
    #            PM split accuracy — see `effective_rcut_rs`.
    gravity: str = "none"
    grav_chunk: int = 1024              # pairwise chunk size for 'direct'
    grav_grid: int = 128                # PM mesh cells per axis (pre-padding)
    # Gaussian split scale in mesh cells.  Short-range pair work scales as
    # (split_rs)^3 at fixed rcut_rs; 1.0 measures 0.5% rms force error on a
    # 100:1 clustered cloud (1.5 -> 0.23%) — both inside the reference
    # theta=0.5 BH walk's ~1% class (tests/test_gravity.py).
    grav_split_rs: float = 1.0
    # short-range cutoff in units of r_s; None derives it from `theta` via
    # effective_rcut_rs() so the reference's one gravity-accuracy knob
    # (parameters.txt theta, SUMMER_SPH.f90:825) controls PM accuracy too
    grav_rcut_rs: Optional[float] = None
    # 128-wide blocks per gravity window: r_cut-sized cells hold ~rho*r_cut^3
    # particles, so honest coverage needs window_group + 6*rho*r_cut^3 + 127
    # lanes (measured: ~900-lane windows for a uniform 1e6 ball at the
    # default 128^3 mesh).  The in-step overflow counter (SimState.stats)
    # reports drops; raise this when it trips.
    grav_window_blocks: int = 8
    # long-range force gradient: 'fd' = single potential FFT + 4th-order
    # finite differences (2 big FFTs/solve); 'spectral' = exact F(k) = -ik phi
    # (4 big FFTs/solve, ~2x slower, slightly tighter mid-k accuracy)
    grav_gradient: str = "fd"
    # Poisson-solve transform backend.  'matmul' (default) evaluates the
    # padded 3-D DFT as pruned per-axis MXU matmuls (ops.mm_dft): XLA's TPU
    # FFT costs 1.9 s at the 512^3-padded 256^3 mesh (127x the 256^3-padded
    # cost for 8x the volume — scripts/c5_profile.py) while the matmul form
    # runs at MXU speed and skips the zero-padded half of the input and the
    # uncropped part of the output.  'xla' = jnp.fft rfftn/irfftn (the
    # round-1..3 path; requires grav_gradient='fd' only for parity of the
    # wraparound ghost reads).  'matmul' implies grav_gradient='fd'.
    grav_fft: str = "matmul"
    # Short-range overflow fallback: a compacted worklist of the candidate
    # slices the static windows could not cover (a condensing core can put
    # ~rho r_cut^3 >> 8 * W particles in one stencil cell — no static window
    # bound survives arbitrary clustering).  Each item is one
    # (group, offset, 512-lane slice) of residual candidates, evaluated in
    # a scan-chunked XLA pass and added to the window sums; the
    # grav_window_overflow stats slot then counts only what exceeds THIS
    # budget too.  0 disables (literal static-window behaviour).  Audit of
    # the 1e6 collapse at 1.22 t_ff: the static plan dropped 54% of true
    # short-range pairs (median 19% of |a_grav| per affected row) —
    # scripts/c5_window_audit.py.
    grav_overflow_items: int = 0
    # Fuse the short-range (TreePM complement) gravity pair sums into the
    # Pallas SPH FORCE kernel: when r_cut <= the SPH cell size (fine
    # meshes: at grav_grid=256 on the N=1e6 bench disc, r_cut = 3.5 AU vs
    # cell = 3.9 AU) every gravity pair is already inside the SPH +-1-cell
    # stencil, so the complement costs ~14 extra VPU ops on lanes the
    # force kernel already touches instead of a second 7-operand sort +
    # window plan + kernel launch.  The r_cut <= cell precondition is
    # checked per step: a violating step reports n_alive in the
    # grav_window_overflow stats slot (loud, like every coverage knob).
    # Single-chip sorted+Pallas engine only; off = separate short-range
    # pass (ops.pm_gravity.pm_short_range).
    grav_fuse_short: bool = False
    # Recompute the PM long-range (mesh FFT) force every k-th step and HOLD
    # it in between (RESPA / Gadget-style far-field subcycling; the
    # short-range pair complement stays per-step).  The far field varies on
    # the dynamical time ~1/sqrt(G rho), 1e2-1e4 Courant steps, so small k
    # costs force error O(k * dt * |dv|/|v|) while removing the dominant
    # FFT from (k-1)/k of the steps (measured 1.9 s of a 1.75 s step at
    # grav_grid=256, N=1e6 — docs/ROUND3.md item 14).  1 = literal
    # reference behaviour (gravity every step, SUMMER_SPH.f90:818-829).
    # Requires neighbor_mode='sorted' without slab decomposition.
    pm_every: int = 1

    # --- neighbour search
    # 'sorted' : SFC-sorted window engine (production path, ops.sorted_grid)
    # 'grid'   : hashed cell grid (ops.neighbors)
    # 'dense'  : O(N^2) all-pairs (small N / brute-force oracle in tests)
    neighbor_mode: str = "grid"
    cell_cap: int = 64                  # 'grid': max particles per hashed cell
    # 'sorted': rows per Pallas program / padding granule (multiple of 128)
    sorted_block: int = 128
    # 'sorted': rows per stencil *window group* — windows are searched per
    # `window_group` consecutive sorted rows, so each window only has to
    # cover that group's key span + two 3-cell column occupancies + the
    # 128-lane DMA alignment slop.  Decoupling this from sorted_block
    # (Pallas programs sub-block it) cuts the candidate lanes per row ~2x
    # at equal drop rate (measured, ball geometry: p99 extent 215 at
    # window_group=32 vs 358 at 128, N-independent).  Must divide both
    # sorted_block and 128.
    window_group: int = 32
    window_blocks: int = 3              # 'sorted': 128-wide blocks per window
    use_pallas: bool = False            # 'sorted': Pallas pair kernels
    pallas_window: int = 256            # Pallas: per-group compute window
    # Pallas: per-program fetch window (DMA granularity).  Must cover the
    # spread of a program's group windows + pallas_window; the gap to
    # pallas_window is capped at 7*128 lanes (3-bit packed sub-offsets).
    pallas_fetch_window: int = 768
    # Run the Pallas kernels in interpret mode (CPU-executable): tests
    # exercise the exact production code path on the virtual device mesh.
    pallas_interpret: bool = False
    # Exact-start compute windows: fetch [fields, 256]-lane blocks at the
    # 128-aligned base below each group window's TRUE start and lane-rotate
    # them (pltpu.roll) so every compute slice is exactly 128 lanes anchored
    # at the first real candidate.  Removes the 128-lane DMA alignment slop
    # AND the W-granularity padding that force aligned windows to ~256
    # lanes/offset (true spans are p50 72 / p99 110 at window_group=32 —
    # docs/ROUND3.md), cutting pair-pass VPU lanes ~2x.  The per-group scalar
    # plan packs (3-bit base, 7-bit shift) per offset; pallas_window is
    # ignored (slices are 128 wide), pallas_fetch_window still bounds the
    # per-program DMA.  False = the round-3 aligned-window kernels.
    pallas_exact_windows: bool = False
    # Pallas short-range gravity (use_pallas): compute / fetch window pair
    # for the r_cut-sized gravity cells.  Occupancy scales with
    # rho * r_cut^3 (~280 particles/cell for a uniform 1e6 ball at the
    # default mesh) — grav_window_overflow in SimState.stats reports drops.
    grav_pallas_window: int = 1024
    grav_pallas_fetch: int = 1408

    # --- h-iteration (variable-h mode)
    h_iter_max: int = 3                 # fixed Newton iteration count (masked convergence)
    # cell-size headroom of the per-step sort in variable-h mode: h may grow
    # up to (sort_h_pad * h_max) during the step's Newton update while the
    # step's one shared neighbour structure stays exact
    sort_h_pad: float = 1.2
    # Cell sizing statistic: cells are 2 * h_pad * quantile(h_live, q).
    # 1.0 (default) = the exact h_max sizing — every pair is inside the
    # +-1-cell stencil.  q < 1 sizes cells by the BULK of the h
    # distribution instead of its tail: in a collapse the rim's capped h
    # would otherwise pin the global cell size while the core condenses,
    # putting thousands of small-h core particles in one cell — candidate
    # windows blow out exactly where sink formation needs exact density
    # (measured: the N=65536 TPU collapse stalled at t~t_ff with 8e6
    # dropped candidates/step and no sink; scripts/collapse_diag.py).
    # With q < 1 the h cap min(max_length, cell/2) tracks the shrinking
    # bulk, clamping only the top (1-q) tail (rim particles, gravity-
    # dominated); particles whose PREVIOUS h still exceeds the shrunken
    # cell/2 lose reach for one step and are counted in grid.n_clamped.
    # The reference octree has no such coupling (per-particle walk,
    # SUMMER_SPH.f90:323-457) — this knob is the grid engine's deliberate,
    # monitored equivalent of its fixed `max_length` clamp (V:531).
    cell_h_quantile: float = 1.0

    # --- multi-chip decomposition (parallel.decomp; axis_name runs only)
    # 'gather': replicated global sort, each device owns a 1/D row slab of
    #           it, columns are the all_gathered full set — O(N) memory and
    #           comm per device, simple and fast at N <= ~1e6 x 8.
    # 'slab'  : SFC rank-slab ownership with sampled-splitter all_to_all
    #           redistribution and rim (halo) ppermute exchange — memory
    #           and comm per device are O(N/D + rim), the scaling mode.
    decomp: str = "gather"
    # 'slab': rim rows exchanged with each rank-neighbour (multiple of 128).
    # Must cover the stencil's rank-space reach (~3 x-planes of particles);
    # under-coverage is counted in the stats vector, never silent.
    halo_rows: int = 1024
    # 'slab': rim rows for the PM short-range pass, whose r_cut stencil
    # reaches further than the SPH kernel's (r_cut >= several SPH cells).
    grav_halo_rows: int = 2048
    # 'slab': rank-neighbour hops per side of a rim exchange.  1 suffices
    # when slabs are much larger than the stencil's rank reach (the
    # production regime); raise it when per-device particle counts are
    # small enough that a stencil can span several devices (the
    # `decomp_pressure` stats slot reports under-coverage loudly).
    halo_hops: int = 1
    # 'slab': per-destination all_to_all chunk capacity (rows).  Bounds how
    # many particles may migrate from one device to one other device in a
    # single step; overflow keeps the particle home for a step (mis-owned,
    # counted loudly in stats).
    migrate_rows: int = 1024
    # 'slab': per-device splitter sample size (the all_gathered sample is
    # decomp_samples * n_devices keys; slab imbalance ~ N/samples).
    decomp_samples: int = 256

    # --- integrator
    # One force evaluation per KDK step: the reference recomputes forces at
    # the start of each step (SUMMER_SPH.f90:895-898) at the *same positions*
    # as the previous step's post-drift evaluation; carrying acc/du/dalpha
    # across steps halves the work (the standard production-SPH KDK form).
    # The carried forces predate the step epilogue (h update, accretion) by
    # one half-kick — set False to recompute both evals like the reference.
    reuse_forces: bool = True

    # --- numerics
    dtype: str = "float32"              # 'float32' | 'float64'
    # Kahan-compensated u accumulation in the kicks (state.Particles.u_c):
    # recovers ~f64-quality energy accumulation on the f32 production path
    # (the reference is f64 end-to-end, SUMMER_SPH.f90:6) for one extra
    # sort operand.  Off by default; enable for long (>=1e4-step)
    # conservation-critical runs.
    kahan_u: bool = False

    def np_dtype(self):
        import jax.numpy as jnp
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    def with_(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)

    def effective_rcut_rs(self) -> float:
        """Short-range cutoff (units of r_s), derived from `theta` if unset.

        The PM tail-truncation error scales ~exp(-rcut^2 / 4 r_s^2); mapping
        theta -> rcut_rs = clip(2.25/theta, 3, 8) makes the reference's
        opening-angle knob a monotone accuracy control with theta=0.5 (the
        reference's hardcoded call-site value, SUMMER_SPH.f90:825) giving
        rcut_rs=4.5 — roughly the reference walk's ~1% force-error class.
        Validated in tests/test_gravity.py::test_theta_controls_pm_accuracy.
        """
        if self.grav_rcut_rs is not None:
            return float(self.grav_rcut_rs)
        t = max(float(self.theta), 1.0e-3)
        return min(max(2.25 / t, 3.0), 8.0)


_PARAM_FIELDS = (
    "bounding_size", "max_depth", "theta", "gamma", "eta",
    "convergence_criteria", "max_length", "timestep_scale", "end_time",
)


def read_parameters_txt(path, base: Optional[SimConfig] = None) -> SimConfig:
    """Read the reference `parameters.txt` (header line + one data line).

    Format: "SUMMER_SPH - Variable.f90":854-919 — a skipped header, then one
    whitespace-separated line of the nine fields in `_PARAM_FIELDS` order.
    Reading a parameter file implies the variable-h code path, so `fixed_h`
    is cleared unless `base` overrides it.
    """
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    if len(lines) < 2:
        raise ValueError(f"{path}: expected header + data line")
    vals = lines[-1].split()
    if len(vals) < 9:
        raise ValueError(f"{path}: expected 9 fields, got {len(vals)}")
    kw = {}
    for name, raw in zip(_PARAM_FIELDS, vals):
        kw[name] = int(raw) if name == "max_depth" else float(raw)
    cfg = base if base is not None else SimConfig(fixed_h=None)
    return cfg.with_(**kw)


def write_parameters_txt(path, cfg: SimConfig) -> None:
    """Write a reference-compatible `parameters.txt`."""
    with open(path, "w") as f:
        f.write(" ".join(_PARAM_FIELDS) + "\n")
        f.write(" ".join(
            str(int(getattr(cfg, n))) if n == "max_depth" else repr(float(getattr(cfg, n)))
            for n in _PARAM_FIELDS) + "\n")


__all__ = ["SimConfig", "read_parameters_txt", "write_parameters_txt"]

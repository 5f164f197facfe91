"""Core SPH pair interactions (gather formulation, component-wise layout).

Physics mirrors the reference's pair loops but reformulated gather-only:
each particle i accumulates its own sums over candidate neighbours j, every
pair evaluated from both sides.  The reference instead does a half-pair
update (j < i writes both i and j, SUMMER_SPH.f90:354,383-391) which *races*
under OpenMP (both endpoints written from concurrent iterations with no
atomics); the gather form is the natural dense/XLA formulation, deterministic
and race-free by construction (SURVEY.md §2.3).

TPU layout note: all pairwise tensors are 2-D [rows, candidates] with the
candidate axis as the (128-lane) minor dimension.  Vector quantities are
carried as separate x/y/z component arrays — a trailing length-3 axis would
occupy 3 of 128 lanes and waste ~98% of the VPU (measured 10x+ end-to-end).

Every division is where-guarded so masked/self/degenerate pairs contribute
exactly zero instead of NaN.

Unified fixed/variable-h formulation: the fixed-h generation
(SUMMER_SPH.f90:295-395) is the variable-h one
("SUMMER_SPH - Variable.f90":324-432) with h_i = h_j = const and
Omega = 1, so a single code path serves both; the engine simply sets
omega = 1 when `cfg.fixed_h` is set.

Reference formulas implemented (V = "SUMMER_SPH - Variable.f90"):
  density      rho_i   = sum_j m_j W(r_ij, h_i)                 (V:485)
  grad-h       draw_i  = sum_j m_j dW/dh(r_ij, h_i)             (V:487-488)
               Omega_i = 1 + h_i/(3 rho_i) * draw_i             (V:455)
  AV           mu   = hbar (v.r) / (r^2 + 0.01 hbar^2), v.r<0   (V:406)
               Pi   = (-abar cbar mu + 2 abar mu^2) / rhobar    (V:412)
  momentum     a_i  = -sum_j m_j [ P_i/(Om_i rho_i^2) gradWi
                       + P_j/(Om_j rho_j^2) gradWj
                       + Pi (gradWi+gradWj)/2 ]                 (V:415-419)
  energy       du_i = sum_j m_j (v_ij . gradWbar)
                       (P_i/(Om_i rho_i^2) + Pi/2)              (V:421-425)
  alpha source araw_i = sum_j m_j (v_ij . gradWbar)             (V:427-428)
where gradWi = n_ij dW(r, h_i), gradWj = n_ij dW(r, h_j), and
gradWbar = (gradWi + gradWj)/2; v.r is the unnormalised v_ij . r_ij
(taken before the separation is normalised, SUMMER_SPH.f90:359-363).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from .kernels import kernel_dwdh, kernel_w, kernel_w_dw


def _safe_inv(x, cond):
    """1/x where cond else 0 (no NaN from masked lanes)."""
    return jnp.where(cond, 1.0 / jnp.where(cond, x, 1.0), 0.0)


def density_sums(dxx, dxy, dxz, h_i, m_j, mask):
    """Density + grad-h raw sums over NEIGHBOUR lanes (self excluded).

    dxx/dxy/dxz: [..., C] components of x_i - x_j.  Zero-distance lanes
    (the particle's own candidate slot) are masked out here and the self
    contribution W(0) is added analytically by `finalize_density` — so a
    truncated candidate window can lose neighbours (counted by the overflow
    stats) but can NEVER lose the self term.  Without this split, a row
    whose own column fell outside an overflowing window came back with
    rho = 0 -> the dead-lane sentinel rho = 1 -> the h iteration collapsed
    h onto m(eta/h)^3 = 1 and spawned spurious sinks (the round-2 config-5
    death; scripts/collapse_diag.py).  The reference sums self via its own
    tree leaf instead (SUMMER_SPH.f90:443-455) — same totals.
    h_i: [..., 1]; m_j, mask: [..., C].
    Returns (rho [...], omega_raw [...]) WITHOUT the self term.
    """
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    r = jnp.sqrt(r2)
    w = kernel_w(r, h_i)
    dwdh = kernel_dwdh(r, h_i)
    m = jnp.where(mask & (r2 > 0.0), m_j, 0.0)
    rho = jnp.sum(m * w, axis=-1)
    omega_raw = jnp.sum(m * dwdh, axis=-1)
    return rho, omega_raw


def finalize_density(rho, omega_raw, h, alive, m):
    """Add the analytic self term, apply the grad-h Omega correction, and
    make dead lanes inert.

    Self: W(0, h) = 1/(pi h^3), dW/dh(0, h) = -3/(pi h^4) (w_shape(0) = 1,
    dw_shape(0) = 0) — added here unconditionally so a live particle always
    has rho >= m/(pi h^3) > 0 regardless of window coverage (see
    density_sums).  Omega_i = 1 + h_i/(3 rho_i) * sum_j m_j dW/dh (V:455).
    Dead particles get rho = 1, Omega = 1 so no downstream division can
    produce NaN.
    """
    inv_h3 = 1.0 / (jnp.pi * h * h * h)
    rho = rho + m * inv_h3
    omega_raw = omega_raw - 3.0 * m * inv_h3 / h
    ok = alive & (rho > 0.0)
    rho_safe = jnp.where(ok, rho, 1.0)
    omega = 1.0 + (h / (3.0 * rho_safe)) * jnp.where(ok, omega_raw, 0.0)
    # Guard against pathological Omega (isolated particles): clamp away from 0.
    omega = jnp.where(jnp.abs(omega) > 1.0e-4, omega, 1.0)
    return rho_safe, omega


def force_sums(
    dxx, dxy, dxz,
    vx, vy, vz,
    h_i, h_j,
    p_i, p_j,
    rho_i, rho_j,
    om_i, om_j,
    cs_i, cs_j,
    al_i, al_j,
    m_j, mask,
    cfg: SimConfig,
):
    """Pressure + artificial-viscosity pair sums.

    i-fields are [..., 1]; j-fields and `mask` are [..., C]; dx*/v* are the
    [..., C] components of x_i - x_j and v_i - v_j.  Self pairs (r == 0) are
    excluded by the r > 0 guard, as in the reference's half-pair j<i loop
    (SUMMER_SPH.f90:354).
    Returns (ax, ay, az, du, alpha_raw), each [...].
    """
    r2 = dxx * dxx + dxy * dxy + dxz * dxz
    r = jnp.sqrt(r2)
    valid = mask & (r > 0.0)
    inv_r = _safe_inv(r, valid)

    # Gradients from both sides' kernels (grad-h symmetrisation, V:413-414).
    _, dw_i = kernel_w_dw(r, h_i)
    _, dw_j = kernel_w_dw(r, h_j)
    dwbar = 0.5 * (dw_i + dw_j)

    # Unnormalised v.r with the Monaghan switch: only approaching pairs feel
    # viscosity (SUMMER_SPH.f90:359-363).
    vdotr = vx * dxx + vy * dxy + vz * dxz
    vdotr_neg = jnp.minimum(vdotr, 0.0)

    hbar = 0.5 * (h_i + h_j)
    mu = hbar * vdotr_neg / (r2 + cfg.av_eps * hbar * hbar)
    cbar = 0.5 * (cs_i + cs_j)
    abar = 0.5 * (al_i + al_j)
    rhobar = 0.5 * (rho_i + rho_j)
    visc = (-abar * cbar * mu + cfg.beta_factor * abar * mu * mu) * _safe_inv(
        rhobar, valid & (rhobar > 0.0))

    # P/(Omega rho^2) terms; rho of live particles is > 0, masked lanes
    # guarded anyway.
    pterm_i = p_i * _safe_inv(om_i * rho_i * rho_i, valid)
    pterm_j = p_j * _safe_inv(om_j * rho_j * rho_j, valid)

    m = jnp.where(valid, m_j, 0.0)

    # Scalar pair coefficient: contributions along n_ij = dx/r.
    scal = pterm_i * dw_i + pterm_j * dw_j + visc * dwbar
    coef = -m * scal * inv_r
    ax = jnp.sum(coef * dxx, axis=-1)
    ay = jnp.sum(coef * dxy, axis=-1)
    az = jnp.sum(coef * dxz, axis=-1)

    # v_ij . gradWbar, averaged over both kernels (V:411).
    vdotgradw = vdotr * inv_r * dwbar

    du = jnp.sum(m * vdotgradw * (pterm_i + 0.5 * visc), axis=-1)
    alpha_raw = jnp.sum(m * vdotgradw, axis=-1)
    return ax, ay, az, du, alpha_raw


def alpha_rate(alpha_raw, rho, alpha, cs, h, cfg: SimConfig):
    """Morris-Monaghan switch: source on compression + decay to alpha_min.

    dalpha_i = max(araw_i / rho_i, 0)
               + alpha_decay (alpha_min - alpha_i) cs_i / h_i
    (SUMMER_SPH.f90:315-318; V:344-347 uses per-particle h.)
    """
    src = jnp.maximum(alpha_raw / jnp.where(rho > 0.0, rho, 1.0), 0.0)
    return src + cfg.alpha_decay * (cfg.alpha_min - alpha) * cs / h


__all__ = ["density_sums", "finalize_density", "force_sums", "alpha_rate"]

"""SPH smoothing kernel and gravitational-softening kernel (closed form).

The reference tabulates the cubic-spline kernel W(q), its radial derivative
dW/dr, and a gravitational softening factor f(q) on a uniform grid in
q = r/h and linearly interpolates at runtime
(/root/reference/SUMMER_SPH.f90:55-146, "SUMMER_SPH - Variable.f90":69-160).
Tables are a scalar-CPU optimisation; on TPU the closed-form piecewise
polynomials vectorise perfectly on the VPU, are branch-free via `jnp.where`,
and are *more* accurate than linear interpolation.  A tabulated mode is still
provided (`KernelTable`) for bit-level validation against the reference
scheme.

Definitions (3D cubic spline, compact support 2h):

    W(r, h)  = w(q) / (pi h^3),      q = r / h
    w(q)     = 1 - 1.5 q^2 + 0.75 q^3          0 <= q <= 1
             = 0.25 (2 - q)^3                  1 <  q <= 2
             = 0                               q  > 2
    dW/dr    = w'(q) / (pi h^4)
    w'(q)    = -3 q + 2.25 q^2                 0 <= q <= 1
             = -0.75 (2 - q)^2                 1 <  q <= 2

    dW/dh    = -(3 W + r dW/dr) / h   (exact; note the reference's
               variable-h generation uses (3W - r dW/dr)/h instead,
               "SUMMER_SPH - Variable.f90":487 — a sign slip on the 3W term.
               We implement the exact derivative; `dwdh_reference_compat`
               reproduces the reference's expression for parity checks.)

Gravitational softening factor f(q) (multiplies G M / r^2; Plummer-like core,
exactly Newtonian outside 2h) — same piecewise polynomials the reference
tabulates (/root/reference/SUMMER_SPH.f90:81-101):

    f(q) = (40 q^3 - 36 q^5 + 15 q^6) / 30                    0 <= q <= 1
         = (80 q^3 - 90 q^4 + 36 q^5 - 5 q^6 - 2) / 30        1 <  q <= 2
         = 1                                                  q  > 2
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..utils.units import PI


def w_shape(q):
    """Dimensionless cubic-spline shape function w(q), support [0, 2]."""
    q = jnp.asarray(q)
    inner = 1.0 - 1.5 * q * q + 0.75 * q * q * q
    two_m_q = 2.0 - q
    outer = 0.25 * two_m_q * two_m_q * two_m_q
    return jnp.where(q <= 1.0, inner, jnp.where(q <= 2.0, outer, 0.0))


def dw_shape(q):
    """Dimensionless derivative w'(q) of the cubic-spline shape function."""
    q = jnp.asarray(q)
    inner = -3.0 * q + 2.25 * q * q
    two_m_q = 2.0 - q
    outer = -0.75 * two_m_q * two_m_q
    return jnp.where(q <= 1.0, inner, jnp.where(q <= 2.0, outer, 0.0))


def kernel_w(r, h):
    """3D cubic-spline kernel W(r, h) = w(r/h) / (pi h^3)."""
    q = r / h
    return w_shape(q) / (PI * h ** 3)


def kernel_dw(r, h):
    """Radial derivative dW/dr = w'(r/h) / (pi h^4)."""
    q = r / h
    return dw_shape(q) / (PI * h ** 4)


def kernel_w_dw(r, h):
    """Fused (W, dW/dr) evaluation — one q, shared predicates."""
    q = r / h
    inv_pih3 = 1.0 / (PI * h ** 3)
    return w_shape(q) * inv_pih3, dw_shape(q) * inv_pih3 / h


def kernel_dwdh(r, h):
    """Exact dW/dh = -(3 W + r dW/dr) / h."""
    w, dw = kernel_w_dw(r, h)
    return -(3.0 * w + r * dw) / h


def dwdh_reference_compat(r, h):
    """The reference variable-h generation's dW/dh expression.

    "SUMMER_SPH - Variable.f90":487 computes W_h = -(r*dW - 3*W)/h, i.e.
    (3W - r dW/dr)/h.  Provided only for parity testing; the engine uses
    :func:`kernel_dwdh`.
    """
    w, dw = kernel_w_dw(r, h)
    return (3.0 * w - r * dw) / h


def grav_shape(q):
    """Softening factor f(q) for the force G M f(q) / r^2 (piecewise poly)."""
    q = jnp.asarray(q)
    q2 = q * q
    q3 = q2 * q
    inner = (40.0 * q3 - 36.0 * q3 * q2 + 15.0 * q3 * q3) / 30.0
    outer = (80.0 * q3 - 90.0 * q2 * q2 + 36.0 * q3 * q2 - 5.0 * q3 * q3 - 2.0) / 30.0
    return jnp.where(q <= 1.0, inner, jnp.where(q <= 2.0, outer, 1.0))


def grav_softening(r, h):
    """f(r/h): multiplies G M / r^2; == 1 beyond 2h (pure Newtonian)."""
    return grav_shape(r / h)


@dataclasses.dataclass(frozen=True)
class KernelTable:
    """Tabulated kernel with linear interpolation, mirroring the reference.

    The reference samples nq points over q in [0, 2] (nq = 5000 fixed-h
    generation /root/reference/SUMMER_SPH.f90:8, 2500 variable generation)
    and linearly interpolates.  Used only to validate that the closed form
    agrees with the reference's table scheme to interpolation error.
    """

    nq: int = 5000

    def __post_init__(self):
        dq = 2.0 / self.nq
        q = jnp.arange(self.nq + 1) * dq
        object.__setattr__(self, "_w", w_shape(q))
        object.__setattr__(self, "_dw", dw_shape(q))
        object.__setattr__(self, "_g", grav_shape(q))
        object.__setattr__(self, "_dq", dq)

    def _interp(self, table, q):
        i = jnp.clip((q / self._dq).astype(jnp.int32), 0, self.nq - 1)
        frac = (q - i * self._dq) / self._dq
        val = (1.0 - frac) * table[i] + frac * table[i + 1]
        return val

    def w(self, r, h):
        q = r / h
        val = jnp.where(q <= 2.0, self._interp(self._w, jnp.minimum(q, 2.0)), 0.0)
        return val / (PI * h ** 3)

    def dw(self, r, h):
        q = r / h
        val = jnp.where(q <= 2.0, self._interp(self._dw, jnp.minimum(q, 2.0)), 0.0)
        return val / (PI * h ** 4)

    def grav(self, r, h):
        q = r / h
        return jnp.where(q <= 2.0, self._interp(self._g, jnp.minimum(q, 2.0)), 1.0)


__all__ = [
    "w_shape",
    "dw_shape",
    "kernel_w",
    "kernel_dw",
    "kernel_w_dw",
    "kernel_dwdh",
    "dwdh_reference_compat",
    "grav_shape",
    "grav_softening",
    "KernelTable",
]

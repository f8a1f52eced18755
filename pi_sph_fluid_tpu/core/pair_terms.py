"""Per-pair scalar terms of the WCSPH momentum equation.

The reference force pass (`calculate_accelerations`, `pi_sph_fluid.c:303-373`)
builds, for every neighbor pair (i, j), a single scalar

    t_ij = pressure_ij + artificial_pressure_ij + viscosity_ij

and then accumulates the acceleration as the SPH gradient
``sum_j m_j * t_ij * grad_i W_ij``.  The fluid-fluid and fluid-boundary
variants differ in two places (`pi_sph_fluid.c:350,362`):

* boundary pressure term uses only p_i/rho_i^2 (the wall has no pressure),
* boundary viscosity divides by rho_i alone instead of the pair mean.

These functions are pure elementwise float32 math over arbitrarily-shaped
pair arrays, so the same code serves the vmap reference path and the fused
Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig

__all__ = [
    "artificial_pressure_ref_w",
    "pair_term_fluid_fluid",
    "pair_term_fluid_boundary",
]


def artificial_pressure_ref_w(cfg: SPHConfig) -> float:
    """Denominator kernel value W(q=0.2) of the Macklin artificial-pressure
    term (`pi_sph_fluid.c:325`: ``W(0.2*H, 0, 0, 0)``)."""
    import numpy as np

    q = np.float32(cfg.q_artificial_pressure)
    tmp1 = np.float32(1.0) - np.float32(0.5) * q
    tmp2 = np.float32(1.0) + np.float32(2.0) * q
    return float(np.float32(cfg.kernel_norm) * tmp1**4 * tmp2)


def _artificial_pressure(w_ij, cfg: SPHConfig):
    """k * (W_ij / W(0.2H))^4 surface-tension term (`pi_sph_fluid.c:325`)."""
    ratio = w_ij / jnp.float32(artificial_pressure_ref_w(cfg))
    r2 = ratio * ratio
    return jnp.float32(cfg.k_artificial_pressure) * (r2 * r2)


def _viscosity_mu(dx, dy, du, dv, cfg: SPHConfig):
    """Monaghan artificial-viscosity mu_ij and the approach gate
    (`pi_sph_fluid.c:328-334`)."""
    xy_dot_uv = dx * du + dy * dv
    xy_dot_xy = dx * dx + dy * dy
    h = jnp.float32(cfg.h)
    mu = h * xy_dot_uv / (xy_dot_xy + jnp.float32(cfg.eps_visc) * h * h)
    return mu, xy_dot_uv < 0.0


def pair_term_fluid_fluid(dx, dy, du, dv, p_i, rho_i, p_j, rho_j, w_ij, cfg: SPHConfig):
    """Scalar t_ij for a fluid-fluid pair (`pi_sph_fluid.c:317-337`).

    dx/dy/du/dv are (i - j) differences; w_ij the precomputed kernel value.
    """
    pressure = p_i / (rho_i * rho_i) + p_j / (rho_j * rho_j)
    artif = _artificial_pressure(w_ij, cfg)
    mu, approaching = _viscosity_mu(dx, dy, du, dv, cfg)
    mean_rho = (rho_i + rho_j) * 0.5
    visc = jnp.where(
        approaching,
        -jnp.float32(cfg.alpha_visc) * jnp.float32(cfg.c) * mu / mean_rho,
        0.0,
    )
    return pressure + artif + visc


def pair_term_fluid_boundary(dx, dy, du, dv, p_i, rho_i, w_ij, cfg: SPHConfig):
    """Scalar t_ij for a fluid-boundary pair (`pi_sph_fluid.c:346-365`).

    Boundary particles carry no pressure and the viscosity denominator is the
    fluid density alone (`pi_sph_fluid.c:350,362`).  Boundary velocity is zero
    in the reference scenes but du/dv are taken as inputs for generality.
    """
    pressure = p_i / (rho_i * rho_i)
    artif = _artificial_pressure(w_ij, cfg)
    mu, approaching = _viscosity_mu(dx, dy, du, dv, cfg)
    visc = jnp.where(
        approaching,
        -jnp.float32(cfg.alpha_visc) * jnp.float32(cfg.c) * mu / rho_i,
        0.0,
    )
    return pressure + artif + visc

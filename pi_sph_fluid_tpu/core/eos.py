"""Tait (WCSPH) equation of state.

Mirrors `calculate_particle_pressure` (`pi_sph_fluid.c:294-301`):
    B = C^2 * RHO_0 / 7
    p = B * ((rho/rho_0)^7 - 1), clamped at 0 from below
(the clamp is the reference's explicit "hack" for tensile instability).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig

__all__ = ["tait_pressure"]


def tait_pressure(rho, cfg: SPHConfig):
    """Elementwise pressure from density; float32; negative clamped to 0."""
    ratio = jnp.asarray(rho, jnp.float32) / jnp.float32(cfg.rho_0)
    # (rho/rho0)^7 via explicit multiplies (cheaper + more predictable than powf)
    r2 = ratio * ratio
    r4 = r2 * r2
    ratio7 = r4 * r2 * ratio
    p = jnp.float32(cfg.tait_b) * (ratio7 - 1.0)
    return jnp.maximum(p, 0.0)

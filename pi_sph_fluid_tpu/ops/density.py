"""SPH density pass (vectorised jnp reference path).

Implements `calculate_density` (`pi_sph_fluid.c:263-289`):

    rho_i = m_i * W(0)                      (self term, :274-275)
          + sum_{j in fluid}    m_j  W_ij   (:278-280)
          + sum_{j in boundary} psi_j W_ij  (:283-285)

as masked reductions over fixed-capacity candidate windows.  This module is
the semantic oracle; the fused Pallas kernel (ops/pallas) must match it
exactly (same masks, same summation structure).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig
from ..core.kernels import kernel_w, w_self
from .neighbors import Candidates, pair_mask

__all__ = ["weighted_kernel_sum", "density_pass"]


def weighted_kernel_sum(qx, qy, tx, ty, tw, cand: Candidates, cfg: SPHConfig, exclude_self: bool):
    """sum_j tw_j * W_ij over each query's accepted candidates.

    This is the vectorised `sph(ones, ..., MASS)` (`pi_sph_fluid.c:200-214`)
    with tw as the leading factor (mass / pseudo-mass / ones).
    """
    xj = tx[cand.idx]
    yj = ty[cand.idx]
    wj = tw[cand.idx]
    dx = qx[:, None] - xj
    dy = qy[:, None] - yj
    r = jnp.sqrt(dx * dx + dy * dy)
    self_idx = jnp.arange(qx.shape[0], dtype=jnp.int32) if exclude_self else None
    mask = pair_mask(r, cand.valid, cfg, self_idx=self_idx, cand_idx=cand.idx)
    w = kernel_w(dx, dy, cfg)
    return jnp.sum(jnp.where(mask, wj * w, 0.0), axis=1)


def density_pass(fluid, boundary, cand_ff: Candidates, cand_fb: Candidates, cfg: SPHConfig):
    """New fluid densities.  ``fluid`` must be in grid-sorted order (queries
    are the sorted fluid set, so self-exclusion is slot == slot)."""
    rho_self = fluid.m * jnp.float32(w_self(cfg))
    rho_ff = weighted_kernel_sum(
        fluid.x, fluid.y, fluid.x, fluid.y, fluid.m, cand_ff, cfg, exclude_self=True
    )
    rho_fb = weighted_kernel_sum(
        fluid.x, fluid.y, boundary.x, boundary.y, boundary.m, cand_fb, cfg, exclude_self=False
    )
    return rho_self + rho_ff + rho_fb

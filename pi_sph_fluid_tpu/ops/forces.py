"""SPH acceleration pass (vectorised jnp reference path).

Implements `calculate_accelerations` (`pi_sph_fluid.c:303-373`): for each
fluid particle, a scalar pair term t_ij (symmetric pressure + Macklin
artificial pressure + Monaghan artificial viscosity) summed through the SPH
gradient with mass leading factor, over fluid neighbors and boundary
neighbors separately:

    a_i = g - sum_{j in fluid} m_j t_ij grad_i W_ij
            - sum_{j in bdry} psi_j t^b_ij grad_i W_ij      (:370-371)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig
from ..core.kernels import kernel_grad_w, kernel_w
from ..core.pair_terms import pair_term_fluid_boundary, pair_term_fluid_fluid
from .neighbors import Candidates, pair_mask

__all__ = ["acceleration_pass"]


def _pair_geometry(qx, qy, tx, ty, cand: Candidates):
    xj = tx[cand.idx]
    yj = ty[cand.idx]
    dx = qx[:, None] - xj
    dy = qy[:, None] - yj
    r = jnp.sqrt(dx * dx + dy * dy)
    return dx, dy, r


def acceleration_pass(fluid, boundary, cand_ff: Candidates, cand_fb: Candidates, gx, gy, cfg: SPHConfig):
    """(du_dt, dv_dt) for the grid-sorted fluid set."""
    n = fluid.x.shape[0]
    slot = jnp.arange(n, dtype=jnp.int32)

    # ---- fluid-fluid contribution (`pi_sph_fluid.c:314-340`) ----
    dx, dy, r = _pair_geometry(fluid.x, fluid.y, fluid.x, fluid.y, cand_ff)
    mask = pair_mask(r, cand_ff.valid, cfg, self_idx=slot, cand_idx=cand_ff.idx)
    w = kernel_w(dx, dy, cfg)
    du = fluid.u[:, None] - fluid.u[cand_ff.idx]
    dv = fluid.v[:, None] - fluid.v[cand_ff.idx]
    t_ff = pair_term_fluid_fluid(
        dx, dy, du, dv,
        fluid.p[:, None], fluid.rho[:, None],
        fluid.p[cand_ff.idx], fluid.rho[cand_ff.idx],
        w, cfg,
    )
    gwx, gwy = kernel_grad_w(dx, dy, cfg)
    mj = fluid.m[cand_ff.idx]
    coef = jnp.where(mask, mj * t_ff, 0.0)
    sum_ff_x = jnp.sum(coef * gwx, axis=1)
    sum_ff_y = jnp.sum(coef * gwy, axis=1)

    # ---- fluid-boundary contribution (`pi_sph_fluid.c:343-368`) ----
    dx, dy, r = _pair_geometry(fluid.x, fluid.y, boundary.x, boundary.y, cand_fb)
    mask = pair_mask(r, cand_fb.valid, cfg)
    w = kernel_w(dx, dy, cfg)
    du = fluid.u[:, None] - boundary.u[cand_fb.idx]
    dv = fluid.v[:, None] - boundary.v[cand_fb.idx]
    t_fb = pair_term_fluid_boundary(
        dx, dy, du, dv,
        fluid.p[:, None], fluid.rho[:, None],
        w, cfg,
    )
    gwx, gwy = kernel_grad_w(dx, dy, cfg)
    psi = boundary.m[cand_fb.idx]
    coef = jnp.where(mask, psi * t_fb, 0.0)
    sum_fb_x = jnp.sum(coef * gwx, axis=1)
    sum_fb_y = jnp.sum(coef * gwy, axis=1)

    du_dt = gx - sum_ff_x - sum_fb_x
    dv_dt = gy - sum_ff_y - sum_fb_y
    return du_dt, dv_dt

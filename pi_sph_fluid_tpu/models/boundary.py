"""Akinci boundary pseudo-mass precompute.

Implements `calculate_boundary_pseudomass` (`pi_sph_fluid.c:242-261`):
psi_i = rho_i / sum_{j != i, |r_ij| < 2H} W_ij over boundary-boundary
neighbors.  Note the reference's sum excludes the self term W(0) (same-set
neighbor queries drop self, `pi_sph_fluid.c:130,144`) — we match that, not
the textbook Akinci formula which includes it.

Runs once at scene build (`pi_sph_fluid.c:600-601`); the boundary grid and
pseudo-masses are immutable afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SPHConfig
from ..state import BoundaryState
from ..ops.density import weighted_kernel_sum
from ..ops.grid import GridContext, build_grid
from ..ops.neighbors import gather_candidates

__all__ = ["prepare_boundary"]


def prepare_boundary(boundary: BoundaryState, cfg: SPHConfig) -> tuple[BoundaryState, GridContext]:
    """Sort the boundary set into grid order and fill in pseudo-masses.

    Returns the grid-sorted BoundaryState (with ``m`` = psi) and its static
    GridContext, both reused every step without recomputation
    (`pi_sph_fluid.c:599-601`).
    """

    @jax.jit
    def _compute(b: BoundaryState):
        grid = build_grid(b.x, b.y, cfg)
        bs = b.permute(grid.order)
        cand = gather_candidates(bs.x, bs.y, grid, cfg)
        ones = jnp.ones_like(bs.x)
        recip_volume = weighted_kernel_sum(
            bs.x, bs.y, bs.x, bs.y, ones, cand, cfg, exclude_self=True
        )
        psi = bs.rho / recip_volume
        return bs._replace(m=psi), grid

    return _compute(boundary)

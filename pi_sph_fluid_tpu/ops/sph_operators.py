"""Generic SPH interpolation operators (component #6, SURVEY.md).

The reference exposes two generic sums with a selectable leading factor
(`enum leading_factor {MASS, VOLUME}`, `pi_sph_fluid.c:198-231`):

    sph:           A_i = sum_j f_j * w_j * W_ij
    sph_gradient:  grad A_i = sum_j f_j * w_j * grad_i W_ij

where w_j = m_j (MASS) or m_j / rho_j (VOLUME — the fundamental SPH
approximation, defined but never called in the reference; provided here for
the same API completeness).  The physics passes (ops/density.py,
ops/forces.py, the Pallas kernels) are fused specializations of these; this
module is the general-purpose user-facing form, e.g. for interpolating
custom per-particle quantities onto query points.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig
from ..core.kernels import kernel_grad_w, kernel_w
from .neighbors import Candidates, pair_mask

__all__ = ["sph_interpolate", "sph_gradient"]


def _leading(m_j, rho_j, leading_factor: str):
    if leading_factor == "mass":
        return m_j
    if leading_factor == "volume":
        return m_j / rho_j
    raise ValueError(f"leading_factor must be 'mass' or 'volume', got {leading_factor!r}")


def sph_interpolate(quantity, qx, qy, tx, ty, tm, trho, cand: Candidates,
                    cfg: SPHConfig, leading_factor: str = "mass",
                    exclude_self: bool = False):
    """A_i = sum_j quantity_j * leading_j * W_ij over accepted candidates.

    ``quantity``/targets are indexed in the (grid-sorted) target order;
    queries may be any point set with candidates from ops/neighbors.
    """
    w_j = _leading(tm[cand.idx], trho[cand.idx], leading_factor)
    dx = qx[:, None] - tx[cand.idx]
    dy = qy[:, None] - ty[cand.idx]
    r = jnp.sqrt(dx * dx + dy * dy)
    self_idx = jnp.arange(qx.shape[0], dtype=jnp.int32) if exclude_self else None
    mask = pair_mask(r, cand.valid, cfg, self_idx=self_idx, cand_idx=cand.idx)
    w = kernel_w(dx, dy, cfg)
    return jnp.sum(jnp.where(mask, quantity[cand.idx] * w_j * w, 0.0), axis=1)


def sph_gradient(quantity, qx, qy, tx, ty, tm, trho, cand: Candidates,
                 cfg: SPHConfig, leading_factor: str = "mass",
                 exclude_self: bool = False):
    """grad A_i = sum_j quantity_j * leading_j * grad_i W_ij; returns (gx, gy).

    ``quantity`` may be per-candidate-lane (same shape as cand.idx, e.g. a
    precomputed pair term) or per-target (gathered through cand.idx).
    """
    q = quantity if quantity.shape == cand.idx.shape else quantity[cand.idx]
    w_j = _leading(tm[cand.idx], trho[cand.idx], leading_factor)
    dx = qx[:, None] - tx[cand.idx]
    dy = qy[:, None] - ty[cand.idx]
    r = jnp.sqrt(dx * dx + dy * dy)
    self_idx = jnp.arange(qx.shape[0], dtype=jnp.int32) if exclude_self else None
    mask = pair_mask(r, cand.valid, cfg, self_idx=self_idx, cand_idx=cand.idx)
    gwx, gwy = kernel_grad_w(dx, dy, cfg)
    coef = jnp.where(mask, q * w_j, 0.0)
    return jnp.sum(coef * gwx, axis=1), jnp.sum(coef * gwy, axis=1)

"""Candidate gathering and pair masks on top of the counting-sort grid.

Replaces `find_neighbors` + `read_neighbors` (`pi_sph_fluid.c:126-182`).  The
reference copies each particle's <=48 neighbors into a stack SoA buffer; the
vectorised equivalent gathers a fixed-capacity window per row span and carries
a validity mask instead of a count.  Capacity overflow (more candidates in a
span than ``row_span_cap``) silently truncates in the gather, so
``span_overflow`` exposes the dropped-candidate count for runtime monitoring
(SURVEY.md §4: the reference's de-facto strategy is invariant monitoring).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SPHConfig
from .grid import GridContext, row_spans

__all__ = ["Candidates", "gather_candidates", "span_overflow", "pair_mask", "brute_force_neighbor_mask"]


class Candidates(NamedTuple):
    """Fixed-capacity candidate window per query.

    idx:   (Nq, 3*cap) int32 — sorted-array slot of each candidate (clamped)
    valid: (Nq, 3*cap) bool  — lane holds a real candidate (span membership
           only; distance cutoff is applied separately by ``pair_mask``)
    """

    idx: jnp.ndarray
    valid: jnp.ndarray


def gather_candidates(qx, qy, grid: GridContext, cfg: SPHConfig, cap: int | None = None) -> Candidates:
    """Materialise candidate slots for each query from its 3 row spans."""
    cap = cfg.row_span_cap if cap is None else cap
    starts, ends = row_spans(qx, qy, grid, cfg)          # (Nq, 3)
    lane = jnp.arange(cap, dtype=jnp.int32)              # (cap,)
    idx = starts[:, :, None] + lane[None, None, :]       # (Nq, 3, cap)
    valid = idx < ends[:, :, None]
    n = grid.order.shape[0]
    idx = jnp.minimum(idx, n - 1)
    return Candidates(idx=idx.reshape(idx.shape[0], -1), valid=valid.reshape(idx.shape[0], -1))


def span_overflow(qx, qy, grid: GridContext, cfg: SPHConfig, cap: int | None = None):
    """Total candidates dropped by the fixed capacity (0 == exact physics)."""
    cap = cfg.row_span_cap if cap is None else cap
    starts, ends = row_spans(qx, qy, grid, cfg)
    return jnp.sum(jnp.maximum(ends - starts - cap, 0))


def pair_mask(r, valid, cfg: SPHConfig, self_idx=None, cand_idx=None):
    """The reference's neighbor acceptance test (`pi_sph_fluid.c:144`):
    distance strictly < 2H, lane valid, and (same-set queries) not self."""
    mask = valid & (r < jnp.float32(cfg.support_radius))
    if self_idx is not None:
        mask = mask & (cand_idx != self_idx[:, None])
    return mask


def brute_force_neighbor_mask(qx, qy, tx, ty, cfg: SPHConfig, exclude_self: bool):
    """O(Nq*Nt) all-pairs acceptance mask — the validation oracle
    (the reference cites brute-force comparison as the idiom, `README.md:110`)."""
    dx = qx[:, None] - tx[None, :]
    dy = qy[:, None] - ty[None, :]
    r = jnp.sqrt(dx * dx + dy * dy)
    mask = r < jnp.float32(cfg.support_radius)
    if exclude_self:
        nq = qx.shape[0]
        mask = mask & ~jnp.eye(nq, tx.shape[0], dtype=bool)
    return mask

"""Row-triple merged candidate layout — the round-2 pair-kernel data structure.

**Why.**  The round-1 kernels shared one candidate window across a whole
TQ=128-query tile: 128 queries in one cell row span ~19 cells at the bench
occupancy, so every query computed against a ~22-cell union window — 6-12x
more pair lanes than the true 3x3-cell stencil (`pi_sph_fluid.c:136-141`)
needs.  Per-query-block windows fix that, but with the plain row layout a
block's candidates are 3 disjoint spans (rows r-1, r, r+1), each paying its
own 128-lane DMA-alignment and chunk quantization.

**The structure.**  For each grid row r, a *segment* holds every candidate a
row-r query can see — all particles (fluid AND boundary, merged) of rows
r-1, r, r+1 — ordered **column-major**: segment r = concat over columns c of
[row r-1 fluid, row r-1 boundary, row r fluid, row r boundary, row r+1 ...].
Consequences:

* a block of QB consecutive queries (cells [c0, c1] of row r) has exactly
  **one** contiguous candidate window: segment-r columns [c0-1, c1+1] —
  one span, one DMA, ~(QB + 3*occupancy) true lanes;
* the array holds only real particles (no layout pads), so window length
  tracks true candidate count;
* fluid and boundary share lanes: density sums m~*W with m~ = mass or
  pseudo-mass (identical formulas, `pi_sph_fluid.c:274-285`); the force
  pass's boundary asymmetries (`pi_sph_fluid.c:350,362`) reduce to two
  per-candidate constants (see rows below);
* **no per-lane masks**: a lane outside the window but inside the fetched
  chunk is a real particle >= 1 whole cell away in x (or an inert segment
  pad), so the q < 2 support test kills it; self-pairs need no exclusion
  (density keeps the self term, which IS the reference's explicit
  m*W(0) (`pi_sph_fluid.c:274-275`); force self-terms vanish as dx=dy=0);
* segments are separated by >= CAP + 128 inert pad lanes, so a fetch that
  overruns a segment can never reach the next segment's duplicates.

Candidate row order (the (8, L) "trip" array):
  0 x, 1 y, 2 u, 3 v, 4 m~ (mass | pseudo-mass),
  5 a_j (viscosity denominator weight: 0.5 fluid, 1.0 boundary),
  6 c_press (p_j/rho_j^2 fluid, 0 boundary),
  7 rho_eff (0.5*rho_j fluid, 0 boundary)
so the pair-mean density denominator (q_rho+c_rho)/2 (`pi_sph_fluid.c:333`)
and the boundary's fluid-only denominator (`pi_sph_fluid.c:362`) unify as
a_j*q_rho + rho_eff_j.

Overflows are counted, never silent: window lanes beyond the block cap are
reported by ``window_spans`` like round 1's span overflow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...config import SPHConfig

__all__ = ["TripleSpec", "TripleCtx", "triple_spec", "build_triple_ctx",
           "gather_trip", "INERT_X"]

LANE = 128
INERT_X = -1e6  # inert slots sit far outside the domain -> q >= 2 kills them
_INVALID = -(1 << 30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TripleSpec(NamedTuple):
    """Static shape parameters of the triple layout (host-side ints)."""

    tq: int          # queries per kernel tile
    qb: int          # queries per window block
    cap: int         # max candidate lanes per block window (incl. alignment)
    rowcap: int      # layout slots per cell row (multiple of tq)
    n_layout: int    # rowcap * n_rows
    L: int           # static triple-array length
    n_src: int       # gather-source rows: n_layout + nb + 1 (inert)

    @property
    def nqb(self) -> int:
        return self.tq // self.qb

    @property
    def n_tiles(self) -> int:
        return self.n_layout // self.tq


class TripleCtx(NamedTuple):
    """Per-resort traced context: where every candidate lives.

    trip_src: (L,) int32    — gather-source row feeding each triple slot
    w_start:  (n_tiles, nqb) int32 — per-block window starts (triple coords)
    w_len:    (n_tiles, nqb) int32 — true window lengths
    overflow: () int32      — window lanes beyond cap (must be 0)
    """

    trip_src: jnp.ndarray
    w_start: jnp.ndarray
    w_len: jnp.ndarray
    overflow: jnp.ndarray


def triple_spec(cfg: SPHConfig, n_real: int, nb: int, tq: int, qb: int,
                cap: int, row_slack: float) -> TripleSpec:
    """Compute static sizes.  rowcap logic matches spans.layout_size."""
    assert tq % qb == 0 and cap % LANE == 0
    per_cell = (cfg.cell_length / cfg.r) ** 2
    max_row = int(cfg.n_cell_cols * per_cell * row_slack) + 1
    rowcap = _round_up(min(max_row, n_real) + tq, tq)
    n_layout = rowcap * cfg.n_cell_rows
    # sum of segment strides <= 3(n+nb) + n_rows*(cap+128+127), plus a dump
    # guard zone; every segment start is 128-aligned
    L = _round_up(3 * (n_real + nb) + cfg.n_cell_rows * (cap + 2 * LANE - 1) + 2 * LANE, LANE)
    return TripleSpec(tq=tq, qb=qb, cap=cap, rowcap=rowcap, n_layout=n_layout,
                      L=L, n_src=n_layout + nb + 1)


def build_triple_ctx(
    spec: TripleSpec,
    cfg: SPHConfig,
    sk: jnp.ndarray,            # (n_layout,) sorted fluid cell keys (pads = n_cells)
    cell_starts: jnp.ndarray,   # (n_cells+2,) fluid CSR (sorted coords)
    b_cell_starts: jnp.ndarray, # (n_cells+1,) boundary CSR (static)
    b_keys_sorted: jnp.ndarray, # (nb,) boundary cell id per sorted boundary slot
    cells_layout: jnp.ndarray,  # (n_layout,) cell id per layout slot (pads = n_cells)
) -> TripleCtx:
    """All per-resort index structures, built with row gathers + arithmetic
    only (1-D element gathers are ~5x slower than row gathers on TPU)."""
    m = cfg.n_cell_cols
    n_rows = cfg.n_cell_rows
    n_cells = cfg.n_cells
    nb = b_keys_sorted.shape[0]
    tq, qb, cap, rowcap = spec.tq, spec.qb, spec.cap, spec.rowcap
    nqb, n_tiles = spec.nqb, spec.n_tiles

    # ---- per-cell count grids --------------------------------------------
    fcnt = (cell_starts[1:n_cells + 1] - cell_starts[:n_cells]).reshape(n_rows, m)
    bcnt = (b_cell_starts[1:n_cells + 1] - b_cell_starts[:n_cells]).reshape(n_rows, m)
    cnt_all = fcnt + bcnt
    zero_row = jnp.zeros((1, m), jnp.int32)
    A = jnp.concatenate([zero_row, zero_row, cnt_all, zero_row, zero_row], axis=0)
    # A[r + 2] == cnt_all[r]; A handles r-2..r+2 without branches
    row3 = A[1:n_rows + 1] + A[2:n_rows + 2] + A[3:n_rows + 3]   # (n_rows, m)

    # ---- segment offsets (128-aligned, cap+128 guard pad between) ---------
    seg_len = jnp.sum(row3, axis=1)
    seg_stride = ((seg_len + cap + 2 * LANE - 1) // LANE) * LANE
    seg_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(seg_stride, dtype=jnp.int32)[:-1]])
    tcol_start = seg_start[:, None] + (jnp.cumsum(row3, axis=1, dtype=jnp.int32) - row3)
    tcol_end = tcol_start + row3

    # ---- per-cell table T: one row gather serves all per-particle needs ---
    rs = jnp.arange(n_rows, dtype=jnp.int32)
    up_valid = rs < n_rows - 1
    dn_valid = rs > 0
    rs_up = jnp.minimum(rs + 1, n_rows - 1)
    rs_dn = jnp.maximum(rs - 1, 0)
    base_up = jnp.where(up_valid[:, None], tcol_start[rs_up], _INVALID)
    base_mid = tcol_start + A[1:n_rows + 1]                       # + cnt[r-1]
    base_dn = jnp.where(dn_valid[:, None],
                        tcol_start[rs_dn] + A[:n_rows] + A[1:n_rows + 1],
                        _INVALID)                                  # + cnt[r-2] + cnt[r-1]
    wlo = tcol_start[:, jnp.maximum(jnp.arange(m) - 1, 0)]
    whi = tcol_end[:, jnp.minimum(jnp.arange(m) + 1, m - 1)]
    cstart_grid = cell_starts[:n_cells].reshape(n_rows, m)
    row_start_f = cell_starts[rs * m][:, None] + jnp.zeros((1, m), jnp.int32)
    T = jnp.stack([wlo, whi, base_up, base_mid, base_dn,
                   cstart_grid, row_start_f, fcnt], axis=-1).reshape(n_cells, 8)
    T = jnp.concatenate([T, jnp.full((1, 8), _INVALID, jnp.int32)], axis=0)

    # ---- fluid scatter: 3 destinations per sorted particle ----------------
    j = jnp.arange(spec.n_layout, dtype=jnp.int32)
    Tj = T[jnp.minimum(sk, n_cells)]                 # (n_layout, 8) row gather
    k_cell = j - Tj[:, 5]                            # rank within cell
    k_row = j - Tj[:, 6]                             # rank within row
    real = sk < n_cells
    in_layout = real & (k_row < rowcap)
    row_of = sk // m
    layout_slot = row_of * rowcap + k_row            # gather-source index

    L = spec.L
    oob = jnp.int32(L)                               # mode='drop' sink
    def fdst(base):
        ok = in_layout & (base >= 0)
        return jnp.where(ok, base + k_cell, oob)

    trip_src = jnp.full((L,), spec.n_src - 1, jnp.int32)  # default: inert row
    for base in (Tj[:, 2], Tj[:, 3], Tj[:, 4]):
        trip_src = trip_src.at[fdst(base)].set(
            layout_slot, mode="drop", unique_indices=True)

    # ---- boundary scatter (static cells, but offsets move with fcnt) ------
    jb = jnp.arange(nb, dtype=jnp.int32)
    Tb = T[b_keys_sorted]
    kb = jb - b_cell_starts[b_keys_sorted]
    src_b = spec.n_layout + jb
    for base in (Tb[:, 2], Tb[:, 3], Tb[:, 4]):
        dst = jnp.where(base >= 0, base + Tb[:, 7] + kb, oob)
        trip_src = trip_src.at[dst].set(src_b, mode="drop", unique_indices=True)

    # ---- per-(tile, block) candidate windows ------------------------------
    cells_b = cells_layout.reshape(n_tiles * nqb, qb)
    valid_b = cells_b < n_cells                      # valid slots are a prefix
    c_first = cells_b[:, 0]
    c_last = jnp.max(jnp.where(valid_b, cells_b, -1), axis=1)
    has_q = c_last >= 0
    T_lo = T[jnp.where(has_q, c_first, n_cells)]     # row gathers (12k-count)
    T_hi = T[jnp.where(has_q, c_last, n_cells)]
    w_start = jnp.where(has_q, T_lo[:, 0], 0).astype(jnp.int32)
    w_len = jnp.where(has_q, T_hi[:, 1] - T_lo[:, 0], 0).astype(jnp.int32)
    extra = w_start % LANE
    overflow = jnp.sum(jnp.maximum(extra + w_len - cap, 0)).astype(jnp.int32)
    return TripleCtx(trip_src=trip_src,
                     w_start=w_start.reshape(n_tiles, nqb),
                     w_len=w_len.reshape(n_tiles, nqb),
                     overflow=overflow)


def gather_trip(src_all: jnp.ndarray, trip_src: jnp.ndarray) -> jnp.ndarray:
    """(n_src, 8) gather-source -> (8, L) triple candidate array.

    Row gather + narrow transpose; both measured near memory speed on TPU,
    unlike per-element gathers.
    """
    return src_all[trip_src].T

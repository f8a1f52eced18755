"""Row-padded particle layout + per-tile candidate spans for the kernels.

**Why a layout.**  The Pallas kernels process TQ consecutive particles per
grid instance, and their candidates must be a *bounded* number of contiguous
spans of the particle array.  With plain cell-sorted packing, a tile that
straddles a cell-row boundary spans a huge column range, and its candidate
spans can approach a full grid row — unbounded by the tile size, so no
static cap is safe.

**The layout.**  After the counting sort, each cell row r is placed at the
fixed offset ``r * rowcap`` (rowcap a multiple of TQ), padded with inert
slots.  Consequences:

* a tile lies entirely inside one cell row -> its queries cover a contiguous
  cell range [c0, c1] of that row;
* its candidates are exactly **3 spans** (rows r-1, r, r+1, columns
  c0-1..c1+1), each bounded by (c1-c0+3) * cell occupancy ~ TQ + O(1);
* lane validity is simply m > 0 (pads have zero mass), which also keeps
  every pair contribution inert without extra flags.

Layout-space is the kernels' working representation: state arrays stay in
it between steps (pads interspersed per row), and the per-step re-layout is
a single fused gather (the permutation the sort already required).

Overflows are counted, never silent (SURVEY.md §4): ``lost`` counts
particles beyond a row's capacity (a conservation violation — raise
row_slack if ever non-zero), ``overflow`` counts candidates beyond the span
cap (including the 128-lane DMA alignment slack).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...config import SPHConfig

__all__ = ["RowLayout", "TileSpans", "layout_size", "build_row_layout", "layout_spans", "NR_SPANS"]

NR_SPANS = 3
LANE = 128


class RowLayout(NamedTuple):
    """Mapping from layout slots to sorted-array slots.

    src:    (n_layout,) int32 — sorted slot feeding each layout slot
    valid:  (n_layout,) bool  — layout slot holds a real particle
    lost:   () int32          — particles dropped by rowcap (must be 0)
    """

    src: jnp.ndarray
    valid: jnp.ndarray
    lost: jnp.ndarray


class TileSpans(NamedTuple):
    start: jnp.ndarray     # (n_tiles, 3) int32 — span starts (layout or target coords)
    length: jnp.ndarray    # (n_tiles, 3) int32 — true span lengths
    overflow: jnp.ndarray  # () int32 — candidates beyond cap


def layout_size(cfg: SPHConfig, n_real: int, tq: int, row_slack: float) -> tuple[int, int]:
    """(rowcap, n_layout) for a scene of n_real particles.

    rowcap must hold the *physical* worst case, not the average: fluid
    settles into the bottom rows (a dam break concentrates all particles
    into ~area/(width*cell) rows), so size by columns x max particles per
    cell.  Per-cell occupancy is bounded by the rest lattice (cell/R)^2
    times a compression slack — WCSPH holds density within a few percent,
    so ``row_slack`` (default 1.35) is generous.  Capped at n_real (a row
    cannot hold more than everything).
    """
    per_cell = (cfg.cell_length / cfg.r) ** 2
    max_row = int(cfg.n_cell_cols * per_cell * row_slack) + 1
    rowcap = -(-(min(max_row, n_real) + tq) // tq) * tq
    return rowcap, rowcap * cfg.n_cell_rows


def build_row_layout(n_sorted: int, cell_starts, cfg: SPHConfig,
                     rowcap: int) -> RowLayout:
    """Compute the layout gather from CSR offsets of a cell-sorted view.

    Structured as (n_rows, rowcap) broadcasts — the slot -> row mapping is
    arithmetic, so no per-slot gathers are needed (they were the dominant
    cost of the naive formulation on TPU).
    """
    m = cfg.n_cell_cols
    n_rows = cfg.n_cell_rows

    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    row_start = cell_starts[row_ids * m]                       # (n_rows,)
    row_count = cell_starts[(row_ids + 1) * m] - row_start

    k = jnp.arange(rowcap, dtype=jnp.int32)[None, :]           # (1, rowcap)
    valid = k < jnp.minimum(row_count, rowcap)[:, None]        # (n_rows, rowcap)
    src = jnp.minimum(row_start[:, None] + k, n_sorted - 1)
    lost = jnp.sum(jnp.maximum(row_count - rowcap, 0))
    return RowLayout(src=src.reshape(-1).astype(jnp.int32),
                     valid=valid.reshape(-1),
                     lost=lost.astype(jnp.int32))


def layout_spans(layout: RowLayout, cells, cell_starts, target_cell_starts,
                 cfg: SPHConfig, rowcap: int, tq: int, cap: int,
                 target_rowcap: int | None = None) -> TileSpans:
    """Candidate spans per layout tile.

    If ``target_rowcap`` is given, spans are in the target's *layout*
    coordinates (fluid-fluid: same layout); otherwise in the target's plain
    sorted coordinates (fluid-boundary: the static boundary array).

    cells:              (n_layout,) cell id per layout slot (n_cells for pads).
    cell_starts:        CSR offsets of the *query* sorted view (row occupancy).
    target_cell_starts: CSR offsets of the *target* sorted view.
    """
    m = cfg.n_cell_cols
    n_rows = cfg.n_cell_rows
    n_layout = layout.src.shape[0]
    n_tiles = n_layout // tq

    t = jnp.arange(n_tiles, dtype=jnp.int32)
    row = (t * tq) // rowcap
    k0 = (t * tq) % rowcap
    # valid slots are a prefix of each row, so the tile's query count is
    # arithmetic in the query view's row occupancy — no per-slot reductions
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    row_count = cell_starts[(row_ids + 1) * m] - cell_starts[row_ids * m]
    qcount = jnp.clip(jnp.minimum(row_count[row], rowcap) - k0, 0, tq)
    has_q = qcount > 0
    c0 = jnp.where(has_q, cells[0::tq] % m, 0)
    last_slot = t * tq + jnp.maximum(qcount - 1, 0)
    c1 = jnp.where(has_q, cells[last_slot] % m, 0)
    clo = jnp.maximum(c0 - 1, 0)
    chi = jnp.minimum(c1 + 1, m - 1)

    dr = jnp.asarray([-1, 0, 1], jnp.int32)[None, :]
    rows = row[:, None] + dr
    ok = (rows >= 0) & (rows < n_rows) & has_q[:, None]
    rows_c = jnp.clip(rows, 0, n_rows - 1)

    lo = target_cell_starts[rows_c * m + clo[:, None]]
    hi = target_cell_starts[rows_c * m + chi[:, None] + 1]
    if target_rowcap is not None:
        # rebase into the target's row-padded layout coordinates
        t_row_start = target_cell_starts[rows_c * m]
        lo = rows_c * target_rowcap + (lo - t_row_start)
        hi = rows_c * target_rowcap + (hi - t_row_start)

    start = jnp.where(ok, lo, 0).astype(jnp.int32)
    length = jnp.where(ok, hi - lo, 0).astype(jnp.int32)

    # kernels DMA from a 128-aligned start and mask the leading lanes
    extra = start % LANE
    overflow = jnp.sum(jnp.maximum(extra + length - cap, 0)).astype(jnp.int32)
    return TileSpans(start=start, length=length, overflow=overflow)


def layout_qb_windows(layout: RowLayout, cells, cell_starts, target_cell_starts,
                      cfg: SPHConfig, rowcap: int, tq: int, qb: int,
                      target_rowcap: int) -> tuple:
    """Per-(tile, span-row, query-block) candidate windows, fluid-fluid only.

    A whole tile's span covers the union of its queries' column ranges; a
    block of ``qb`` consecutive queries needs only its own [qc0-1, qc1+1]
    columns of each row — typically one 128-lane chunk instead of the whole
    span.  Returns (lo, hi): (n_tiles, 3*nqb) int32 absolute layout
    coordinates, hi exclusive, empty (lo == hi == 0) when invalid.
    """
    m = cfg.n_cell_cols
    n_rows = cfg.n_cell_rows
    n_layout = layout.src.shape[0]
    n_tiles = n_layout // tq
    nqb = tq // qb

    t = jnp.arange(n_tiles, dtype=jnp.int32)
    row = (t * tq) // rowcap                                    # (n_tiles,)
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    row_count = cell_starts[(row_ids + 1) * m] - cell_starts[row_ids * m]
    k0 = (t * tq) % rowcap
    qcount = jnp.clip(jnp.minimum(row_count[row], rowcap) - k0, 0, tq)  # (n_tiles,)

    # first/last valid query cell per block (valid slots are a row prefix)
    blk = jnp.arange(nqb, dtype=jnp.int32)[None, :]             # (1, nqb)
    b0 = blk * qb
    bcount = jnp.clip(qcount[:, None] - b0, 0, qb)              # (n_tiles, nqb)
    has_q = bcount > 0
    first_slot = t[:, None] * tq + b0
    last_slot = first_slot + jnp.maximum(bcount - 1, 0)
    qc0 = jnp.where(has_q, cells[first_slot] % m, 0)
    qc1 = jnp.where(has_q, cells[last_slot] % m, 0)

    dr = jnp.asarray([-1, 0, 1], jnp.int32)[None, :, None]      # (1, 3, 1)
    rows = row[:, None, None] + dr                              # (n_tiles, 3, 1)
    ok = (rows >= 0) & (rows < n_rows) & has_q[:, None, :]
    rows_c = jnp.clip(rows, 0, n_rows - 1)
    clo = jnp.maximum(qc0 - 1, 0)[:, None, :]
    chi = jnp.minimum(qc1 + 1, m - 1)[:, None, :]

    lo = target_cell_starts[rows_c * m + clo]
    hi = target_cell_starts[rows_c * m + chi + 1]
    t_row_start = target_cell_starts[rows_c * m]
    lo = rows_c * target_rowcap + (lo - t_row_start)
    hi = rows_c * target_rowcap + (hi - t_row_start)
    lo = jnp.where(ok, lo, 0).astype(jnp.int32)
    hi = jnp.where(ok, hi, 0).astype(jnp.int32)
    return lo.reshape(n_tiles, 3 * nqb), hi.reshape(n_tiles, 3 * nqb)

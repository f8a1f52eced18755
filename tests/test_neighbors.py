"""Neighbor engine validation vs brute-force O(N^2) — the idiom the reference
itself cites for validation (`README.md:110`, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.scene import build_drop_scene
from pi_sph_fluid_tpu.ops.grid import build_grid, cell_ids, row_spans
from pi_sph_fluid_tpu.ops.neighbors import (
    brute_force_neighbor_mask,
    gather_candidates,
    pair_mask,
    span_overflow,
)

CFG = SPHConfig()
RNG = np.random.default_rng(0)


def random_points(n, pad=0.0):
    x = RNG.uniform(0.0 - pad, CFG.width + pad, n).astype(np.float32)
    y = RNG.uniform(0.0 - pad, CFG.height + pad, n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def neighbor_set_from_engine(qx, qy, tx, ty, exclude_self, cap=64):
    """Set of accepted (query, sorted-target-original-index) pairs."""
    grid = build_grid(tx, ty, CFG)
    txs, tys = tx[grid.order], ty[grid.order]
    cand = gather_candidates(qx, qy, grid, CFG, cap=cap)
    dx = qx[:, None] - txs[cand.idx]
    dy = qy[:, None] - tys[cand.idx]
    r = jnp.sqrt(dx * dx + dy * dy)
    self_idx = None
    if exclude_self:
        # queries must be the sorted target set for self-exclusion
        self_idx = jnp.arange(qx.shape[0], dtype=jnp.int32)
    mask = pair_mask(r, cand.valid, CFG, self_idx=self_idx, cand_idx=cand.idx)
    pairs = set()
    orig = np.asarray(grid.order)
    m = np.asarray(mask)
    idx = np.asarray(cand.idx)
    for i in range(qx.shape[0]):
        for k in np.nonzero(m[i])[0]:
            pairs.add((i, int(orig[idx[i, k]])))
    return pairs


def brute_pairs(qx, qy, tx, ty, exclude_self):
    mask = np.asarray(brute_force_neighbor_mask(qx, qy, tx, ty, CFG, exclude_self))
    return {(i, j) for i, j in zip(*np.nonzero(mask))}


def test_cell_ids_match_reference_formula():
    x = jnp.asarray([0.0, 0.2, 3.99], jnp.float32)
    y = jnp.asarray([0.0, 0.2, 1.99], jnp.float32)
    ids = np.asarray(cell_ids(x, y, CFG))
    cell = CFG.cell_length
    m = CFG.n_cell_cols
    expect = [int(yy / cell) * m + int(xx / cell) for xx, yy in [(0.0, 0.2), (0.2, 0.2), (3.99, 1.99)]]
    assert ids[0] == int(0.0 / cell) * m + 0
    assert ids[1] == expect[1]
    assert ids[2] == expect[2]


def test_grid_shape_matches_reference():
    # 21 x 11 = 231 cells at defaults (SURVEY.md §2 #4)
    assert CFG.n_cell_cols == 21
    assert CFG.n_cell_rows == 11
    assert CFG.n_cells == 231


def test_cell_starts_are_csr():
    x, y = random_points(500)
    grid = build_grid(x, y, CFG)
    starts = np.asarray(grid.cell_starts)
    assert starts[0] == 0 and starts[-1] == 500
    assert (np.diff(starts) >= 0).all()
    sc = np.asarray(grid.sorted_cells)
    assert (np.diff(sc) >= 0).all()
    # every particle is inside its claimed cell span
    ids = np.asarray(cell_ids(x, y, CFG))[np.asarray(grid.order)]
    np.testing.assert_array_equal(ids, sc)


def test_row_spans_cover_stencil():
    x, y = random_points(300)
    grid = build_grid(x, y, CFG)
    starts, ends = row_spans(x, y, grid, CFG)
    assert starts.shape == (300, 3)
    assert bool(jnp.all(ends >= starts))


@pytest.mark.parametrize("n", [10, 100, 700])
def test_same_set_neighbors_match_brute_force(n):
    x, y = random_points(n)
    grid = build_grid(x, y, CFG)
    xs, ys = x[grid.order], y[grid.order]
    engine = neighbor_set_from_engine(xs, ys, x, y, exclude_self=True, cap=256)
    # brute force on sorted queries vs original targets
    brute = brute_pairs(xs, ys, x, y, exclude_self=False)
    orig = np.asarray(grid.order)
    brute = {(i, j) for (i, j) in brute if orig[i] != j}
    assert engine == brute


def test_cross_set_neighbors_match_brute_force():
    qx, qy = random_points(200)
    tx, ty = random_points(300)
    engine = neighbor_set_from_engine(qx, qy, tx, ty, exclude_self=False, cap=256)
    brute = brute_pairs(qx, qy, tx, ty, exclude_self=False)
    assert engine == brute


def test_out_of_domain_queries_dont_crash():
    qx, qy = random_points(50, pad=0.5)
    tx, ty = random_points(100)
    engine = neighbor_set_from_engine(qx, qy, tx, ty, exclude_self=False, cap=256)
    brute = brute_pairs(qx, qy, tx, ty, exclude_self=False)
    # in-domain behavior must match; out-of-domain queries clamp to edge
    # cells, which can only lose pairs beyond the support radius — engine
    # pairs must still be a subset of brute and contain all pairs whose
    # query is in-domain.
    in_dom = (np.asarray(qx) >= 0) & (np.asarray(qx) <= CFG.width) & \
             (np.asarray(qy) >= 0) & (np.asarray(qy) <= CFG.height)
    assert engine <= brute
    assert {(i, j) for (i, j) in brute if in_dom[i]} <= engine


def test_span_overflow_detects_capacity_loss():
    fluid, _ = build_drop_scene(CFG)
    grid = build_grid(fluid.x, fluid.y, CFG)
    xs, ys = fluid.x[grid.order], fluid.y[grid.order]
    assert int(span_overflow(xs, ys, grid, CFG, cap=64)) == 0
    assert int(span_overflow(xs, ys, grid, CFG, cap=2)) > 0


def test_default_capacity_suffices_for_drop_scene():
    fluid, _ = build_drop_scene(CFG)
    grid = build_grid(fluid.x, fluid.y, CFG)
    xs, ys = fluid.x[grid.order], fluid.y[grid.order]
    assert int(span_overflow(xs, ys, grid, CFG)) == 0

"""Pallas metaball renderer: the production path for large scenes.

Same math as render/metaballs.py (field = sum_j W_ij / W(px_width/2), lit
when >= 1, `pi_sph_fluid.c:380-411`), but the pixel field is computed by a
span-DMA kernel like the pair passes, so rendering a 1M-particle scene costs
one pass over the pixel tiles instead of a (n_pixels, cap) gather.

The reference's pixels-as-particles trick goes one step further here: pixel
centers are *static* queries, so their cell sort, row-padded layout, and CSR
offsets are all computed once at renderer build.  Per frame, only the
fluid-side spans (from the live fluid layout's CSR offsets) are recomputed —
cheap jnp — and one kernel over ~64-256 pixel tiles produces the field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SPHConfig
from ..core.kernels import kernel_w_scalar
from ..models.engine_pallas import PallasEngine, PackedSim
from ..models.scene import pixel_centers
from ..ops.grid import cell_ids
from ..ops.pallas.pair_kernels import LANE, _aligned_start, _pad8, _pair_w
from ..ops.pallas.spans import RowLayout, layout_spans
from .metaballs import pack_framebuffer

__all__ = ["PallasRenderer"]


def _field_kernel(
    f_start, f_len,
    q_ref,            # (tq, 8) pixel tile: x, y, valid-marker
    fc_hbm,           # (8, n_fluid_layout + cap) fluid candidates
    out_ref,          # (tq, 8): field in column 0
    cf, sem_f,
    *, cfg: SPHConfig, tq: int, nr: int, cap: int, interpret: bool,
):
    i = pl.program_id(0)
    ib = i % 8
    support = jnp.float32(cfg.support_radius)

    for s in range(nr):
        a, _ = _aligned_start(f_start[ib, s])

        # unconditional: predicated start/wait pairs unbalance the DMA
        # semaphores (the round-1 hardware NaN bug, commit 673adb1) — empty
        # spans cost only negligible bandwidth
        def _go(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[s], sem_f.at[s]
            ).start()

        _go()

    qx = q_ref[:, 0].reshape(tq, 1)
    qy = q_ref[:, 1].reshape(tq, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    acc = jnp.zeros((tq, 1), jnp.float32)

    for s in range(nr):
        a, extra = _aligned_start(f_start[ib, s])
        length = f_len[ib, s]

        def _wait(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[s], sem_f.at[s]
            ).wait()

        _wait()
        total = jnp.minimum(extra + length, cap)
        n_chunks = (total + LANE - 1) // LANE

        def chunk(c, acc):
            off = pl.multiple_of(c * LANE, LANE)
            cx = cf[s, 0, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cf[s, 1, pl.ds(off, LANE)].reshape(1, LANE)
            dx = qx - cx
            dy = qy - cy
            r, w, _ = _pair_w(dx, dy, cfg)
            lane_idx = off + lane
            mask = (lane_idx >= extra) & (lane_idx < total) & (r < support)
            return acc + jnp.sum(jnp.where(mask, w, 0.0), axis=1, keepdims=True)

        acc = jax.lax.fori_loop(0, n_chunks, chunk, acc)

    out_ref[:, 0:1] = acc
    out_ref[:, 1:8] = jnp.zeros((tq, 7), jnp.float32)


class PallasRenderer:
    """render(sim: PackedSim) -> page-packed uint8 framebuffer, on device."""

    def __init__(self, engine: PallasEngine, rows: int = 64, cols: int = 128,
                 tq: int = 8, cap: int | None = None, interpret: bool | None = None):
        # tq is small by design: pixels are sparse relative to fine fluid
        # grids, so a wide pixel tile spans many fluid cells (a 128-pixel
        # tile over a 1M-particle grid covers a full fluid row).  8 pixels
        # (the sublane minimum) keeps spans bounded; cap is sized from the
        # physical bound: tile pixel extent in fluid cells x max occupancy.
        cfg = engine.cfg
        self.engine = engine
        self.cfg = cfg
        self.rows, self.cols = rows, cols
        self.tq = tq
        if cap is None:
            px_spacing = cfg.width / cols
            cells_per_tile = tq * px_spacing / cfg.cell_length + 3
            per_cell = (cfg.cell_length / cfg.r) ** 2 * 1.35
            cap = int(cells_per_tile * per_cell) + LANE
            cap = -(-cap // LANE) * LANE
        self.cap = cap
        self.interpret = engine.dims.interpret if interpret is None else interpret

        # max metaball distance: px_width/2 of the reference's 128-col raster
        # (`pi_sph_fluid.c:399-401`)
        px_width = np.float32(cfg.width) / np.float32(128.0)
        self.w_ref = float(kernel_w_scalar(np.float32(px_width) / np.float32(2.0), cfg))

        # ---- static pixel layout (host-side, once) ----
        px, py = pixel_centers(cfg, rows, cols)
        keys = np.asarray(cell_ids(jnp.asarray(px), jnp.asarray(py), cfg))
        order = np.argsort(keys, kind="stable")
        px_s, py_s, keys_s = px[order], py[order], keys[order]
        counts = np.bincount(keys_s + 1, minlength=cfg.n_cells + 2)
        px_cell_starts = np.cumsum(counts).astype(np.int32)

        m = cfg.n_cell_cols
        row_ids = np.arange(cfg.n_cell_rows)
        row_start = px_cell_starts[row_ids * m]
        row_count = px_cell_starts[(row_ids + 1) * m] - row_start
        rowcap = int(-(-max(1, row_count.max()) // tq) * tq)
        n_layout = rowcap * cfg.n_cell_rows

        slot = np.arange(n_layout)
        r_of = slot // rowcap
        k_of = slot % rowcap
        valid = k_of < row_count[r_of]
        src = np.minimum(row_start[r_of] + k_of, len(px_s) - 1)

        q = np.zeros((n_layout, 8), np.float32)
        q[:, 0] = np.where(valid, px_s[src], -1e6)
        q[:, 1] = np.where(valid, py_s[src], -1e6)
        self.q_packed = jnp.asarray(q)
        self.px_cells = jnp.asarray(np.where(valid, keys_s[src], cfg.n_cells).astype(np.int32))
        self.px_layout = RowLayout(
            src=jnp.asarray(src.astype(np.int32)),
            valid=jnp.asarray(valid),
            lost=jnp.asarray(0, jnp.int32),
        )
        self.px_cell_starts = jnp.asarray(px_cell_starts)
        self.px_rowcap = rowcap
        # static un-layout: row-major pixel index -> layout slot
        unsort = np.zeros(rows * cols, np.int32)
        unsort[order[src[valid]]] = np.nonzero(valid)[0]
        self.unsort = jnp.asarray(unsort)
        self.n_tiles = n_layout // tq

    # ------------------------------------------------------------------
    def field(self, sim: PackedSim) -> jnp.ndarray:
        """Raw metaball field per row-major pixel, shape (rows*cols,).

        Requires the state's row-padded layout to be *fresh* (positions not
        drifted more than one tick past the last relayout): the CSR offsets
        are recomputed from live positions and must agree with the layout's
        slot assignment.  A state carried resort_every-1 ticks past its
        relayout can shift span windows by the number of cell-crossing
        particles and wrongly unlight threshold pixels — SimRunner therefore
        clamps resort_every to 1 whenever a renderer is attached.
        """
        cfg, eng = self.cfg, self.engine
        packed = sim.packed
        # the state is in layout order and positions haven't moved since the
        # last relayout, so recomputing CSR offsets reproduces its grid
        keys = jnp.where(packed[:, 4] > 0, cell_ids(packed[:, 0], packed[:, 1], cfg),
                         cfg.n_cells)
        counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
        cell_starts = jnp.cumsum(counts, dtype=jnp.int32)

        spans = layout_spans(self.px_layout, self.px_cells, self.px_cell_starts,
                             cell_starts, cfg, self.px_rowcap, self.tq, self.cap,
                             target_rowcap=eng.rowcap)
        fc_packed = jnp.pad(packed.T, ((0, 0), (0, self.cap)))

        kernel = functools.partial(_field_kernel, cfg=cfg, tq=self.tq,
                                   nr=3, cap=self.cap, interpret=self.interpret)
        span_spec = pl.BlockSpec((8, 3), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((self.q_packed.shape[0], 8), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(self.n_tiles,),
                in_specs=[
                    span_spec, span_spec,
                    pl.BlockSpec((self.tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=pl.BlockSpec((self.tq, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((3, 8, self.cap), jnp.float32),
                    pltpu.SemaphoreType.DMA((3,)),
                ],
            ),
            interpret=self.interpret,
        )(_pad8(spans.start), _pad8(spans.length), self.q_packed, fc_packed)
        return out[self.unsort, 0] / jnp.float32(self.w_ref)

    def render(self, sim: PackedSim) -> jnp.ndarray:
        lit = (self.field(sim) >= 1.0).reshape(self.rows, self.cols)
        return pack_framebuffer(lit, self.rows, self.cols)

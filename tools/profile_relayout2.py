#!/usr/bin/env python3
"""Find device-heavy pieces inside one executable by cumulative composition."""

import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_pallas import PallasDims, PallasEngine, _INERT_ROW
from pi_sph_fluid_tpu.ops.grid import cell_ids
from pi_sph_fluid_tpu.ops.pallas.spans import build_row_layout, layout_spans


def timeit(fn, *args, reps=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    r = math.sqrt(6.35 / 100_000)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = PallasEngine(cfg, boundary, bgrid, fluid.n, PallasDims())
    sim = eng.prime(fluid, (0.0, -9.81))
    pk, ids = sim.packed, sim.ids
    n_layout, rowcap = eng.n_layout, eng.rowcap

    def upto(stage):
        def f(pk, ids):
            keys = jnp.where(pk[:, 4] > 0, cell_ids(pk[:, 0], pk[:, 1], cfg), cfg.n_cells)
            if stage == 0:
                return keys
            order = jnp.argsort(keys, stable=True).astype(jnp.int32)
            if stage == 1:
                return order
            counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
            cell_starts = jnp.cumsum(counts, dtype=jnp.int32)
            if stage == 2:
                return order, cell_starts
            layout = build_row_layout(n_layout, cell_starts, cfg, rowcap)
            if stage == 3:
                return order, cell_starts, layout.lost
            perm = order[layout.src]
            if stage == 4:
                return perm
            v = layout.valid
            packed_new = jnp.where(v[:, None], pk[perm, :], jnp.asarray(_INERT_ROW))
            if stage == 5:
                return packed_new
            ids_new = jnp.where(v, ids[perm], -1)
            cells = jnp.where(v, keys[perm], cfg.n_cells)
            if stage == 6:
                return packed_new, ids_new, cells
            f_spans = layout_spans(layout, cells, cell_starts, cell_starts, cfg,
                                   rowcap, 128, 512, target_rowcap=rowcap)
            if stage == 7:
                return packed_new, ids_new, cells, f_spans.start, f_spans.length
            b_spans = layout_spans(layout, cells, cell_starts, eng.b_cell_starts,
                                   cfg, rowcap, 128, 256)
            return packed_new, ids_new, cells, f_spans.start, b_spans.start
        return jax.jit(f)

    names = ["keys", "+argsort", "+hist/cumsum", "+row_layout", "+perm", "+row gather",
             "+ids/cells", "+f_spans", "+b_spans"]
    prev = 0.0
    for s, name in enumerate(names):
        t = timeit(upto(s), pk, ids)
        print(f"{name:14s} cum={t:7.3f} ms   delta={t - prev:7.3f} ms")
        prev = t

    # dispatch overhead: trivial executable
    f_triv = jax.jit(lambda x: x + 1.0)
    small = jnp.zeros((8, 128), jnp.float32)
    print(f"trivial exec:  {timeit(f_triv, small):7.3f} ms")
    # pipelined dispatch of trivial op, 200 reps
    print(f"trivial x200:  {timeit(f_triv, small, reps=200):7.3f} ms")


if __name__ == "__main__":
    main()

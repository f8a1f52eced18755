#!/usr/bin/env python3
"""Micro-profile the relayout internals at 100k (pool scene)."""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    print(f"n_layout={n_layout} rowcap={rowcap}")

    f_keys = jax.jit(lambda pk: jnp.where(pk[:, 4] > 0, cell_ids(pk[:, 0], pk[:, 1], cfg), cfg.n_cells))
    print(f"keys:        {timeit(f_keys, pk):7.3f} ms")
    keys = f_keys(pk)

    f_sort = jax.jit(lambda k: jnp.argsort(k, stable=True).astype(jnp.int32))
    print(f"argsort:     {timeit(f_sort, keys):7.3f} ms")
    order = f_sort(keys)

    f_hist = jax.jit(lambda k: jnp.cumsum(jnp.zeros(cfg.n_cells + 2, jnp.int32).at[k + 1].add(1), dtype=jnp.int32))
    print(f"hist+cumsum: {timeit(f_hist, keys):7.3f} ms")
    cell_starts = f_hist(keys)

    f_layout = jax.jit(lambda cs: build_row_layout(n_layout, cs, cfg, rowcap))
    print(f"row_layout:  {timeit(f_layout, cell_starts):7.3f} ms")
    layout = f_layout(cell_starts)

    f_perm = jax.jit(lambda o, src: o[src])
    print(f"perm gather: {timeit(f_perm, order, layout.src):7.3f} ms")
    perm = f_perm(order, layout.src)

    f_rowg = jax.jit(lambda pk, perm, v: jnp.where(v[:, None], pk[perm, :], jnp.asarray(_INERT_ROW)))
    print(f"row gather:  {timeit(f_rowg, pk, perm, layout.valid):7.3f} ms")

    f_cells = jax.jit(lambda k, perm, v: jnp.where(v, k[perm], cfg.n_cells))
    print(f"cells gathr: {timeit(f_cells, keys, perm, layout.valid):7.3f} ms")
    cells = f_cells(keys, perm, layout.valid)

    f_spans = jax.jit(lambda l, c, cs: layout_spans(l, c, cs, cs, cfg, rowcap, 128, 512, target_rowcap=rowcap))
    print(f"spans:       {timeit(f_spans, layout, cells, cell_starts):7.3f} ms")

    # whole relayout as one jit for comparison
    f_all = jax.jit(lambda pk, ids: eng._relayout(pk, ids))
    print(f"relayout:    {timeit(f_all, pk, ids):7.3f} ms")

    # sort directly on n_layout=1.9e5 random keys, for scale comparison
    kk = jax.random.randint(jax.random.PRNGKey(0), (n_layout,), 0, cfg.n_cells, dtype=jnp.int32)
    print(f"argsort rnd: {timeit(f_sort, kk):7.3f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Cumulative stage probe of the v3 relayout on TPU."""

import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.ops.grid import cell_ids
from pi_sph_fluid_tpu.ops.pallas.spans import build_row_layout
from pi_sph_fluid_tpu.ops.pallas import triple as T


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = 100_000
    r = math.sqrt(6.35 / n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=256, qb=16, cap=256)
    sim = eng.prime(fluid, (0.0, -9.81))
    pk = sim.packed
    spec = eng.spec
    m = cfg.n_cell_cols
    n_rows = cfg.n_cell_rows
    n_cells = cfg.n_cells
    nb = eng.b_keys_sorted.shape[0]
    b_cs = eng.b_cell_starts
    b_keys = eng.b_keys_sorted

    def upto(stage):
        def f(pk):
            x, y, mm = pk[:, 0], pk[:, 1], pk[:, 4]
            keys = jnp.where(mm > 0, cell_ids(x, y, cfg), cfg.n_cells)
            iota = jnp.arange(spec.n_layout, dtype=jnp.int32)
            sk, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
            if stage == 0:
                return sk
            counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
            cell_starts = jnp.cumsum(counts, dtype=jnp.int32)
            if stage == 1:
                return sk, cell_starts
            layout = build_row_layout(spec.n_layout, cell_starts, cfg, spec.rowcap)
            packed_sorted = pk[order]
            packed_new = jnp.where(layout.valid[:, None],
                                   packed_sorted[layout.src], eng.inert_row)
            if stage == 2:
                return packed_new
            cells = jnp.where(packed_new[:, 4] > 0,
                              cell_ids(packed_new[:, 0], packed_new[:, 1], cfg),
                              cfg.n_cells)
            if stage == 3:
                return packed_new, cells

            # --- inlined build_triple_ctx stages ---
            fcnt = (cell_starts[1:n_cells + 1] - cell_starts[:n_cells]).reshape(n_rows, m)
            bcnt = (b_cs[1:n_cells + 1] - b_cs[:n_cells]).reshape(n_rows, m)
            cnt_all = fcnt + bcnt
            zero_row = jnp.zeros((1, m), jnp.int32)
            A = jnp.concatenate([zero_row, zero_row, cnt_all, zero_row, zero_row], axis=0)
            row3 = A[1:n_rows + 1] + A[2:n_rows + 2] + A[3:n_rows + 3]
            seg_len = jnp.sum(row3, axis=1)
            seg_stride = ((seg_len + spec.cap + 255) // 128) * 128
            seg_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                         jnp.cumsum(seg_stride, dtype=jnp.int32)[:-1]])
            tcol_start = seg_start[:, None] + (jnp.cumsum(row3, axis=1, dtype=jnp.int32) - row3)
            tcol_end = tcol_start + row3
            rs = jnp.arange(n_rows, dtype=jnp.int32)
            up_valid = rs < n_rows - 1
            dn_valid = rs > 0
            base_up = jnp.where(up_valid[:, None], tcol_start[jnp.minimum(rs + 1, n_rows - 1)], -(1 << 30))
            base_mid = tcol_start + A[1:n_rows + 1]
            base_dn = jnp.where(dn_valid[:, None],
                                tcol_start[jnp.maximum(rs - 1, 0)] + A[:n_rows] + A[1:n_rows + 1],
                                -(1 << 30))
            wlo = tcol_start[:, jnp.maximum(jnp.arange(m) - 1, 0)]
            whi = tcol_end[:, jnp.minimum(jnp.arange(m) + 1, m - 1)]
            cstart_grid = cell_starts[:n_cells].reshape(n_rows, m)
            row_start_f = cell_starts[rs * m][:, None] + jnp.zeros((1, m), jnp.int32)
            Tt = jnp.stack([wlo, whi, base_up, base_mid, base_dn,
                            cstart_grid, row_start_f, fcnt], axis=-1).reshape(n_cells, 8)
            Tt = jnp.concatenate([Tt, jnp.full((1, 8), -(1 << 30), jnp.int32)], axis=0)
            if stage == 4:
                return packed_new, Tt

            j = jnp.arange(spec.n_layout, dtype=jnp.int32)
            Tj = Tt[jnp.minimum(sk, n_cells)]
            if stage == 5:
                return packed_new, Tj
            k_cell = j - Tj[:, 5]
            k_row = j - Tj[:, 6]
            real = sk < n_cells
            in_layout = real & (k_row < spec.rowcap)
            row_of = sk // m
            layout_slot = row_of * spec.rowcap + k_row
            oob = jnp.int32(spec.L)
            trip_src = jnp.full((spec.L,), spec.n_src - 1, jnp.int32)
            for base in (Tj[:, 2], Tj[:, 3], Tj[:, 4]):
                ok = in_layout & (base >= 0)
                trip_src = trip_src.at[jnp.where(ok, base + k_cell, oob)].set(
                    layout_slot, mode="drop", unique_indices=True)
            if stage == 6:
                return packed_new, trip_src
            jb = jnp.arange(nb, dtype=jnp.int32)
            Tb = Tt[b_keys]
            kb = jb - b_cs[b_keys]
            src_b = spec.n_layout + jb
            for base in (Tb[:, 2], Tb[:, 3], Tb[:, 4]):
                dst = jnp.where(base >= 0, base + Tb[:, 7] + kb, oob)
                trip_src = trip_src.at[dst].set(src_b, mode="drop", unique_indices=True)
            if stage == 7:
                return packed_new, trip_src
            cells_b = cells.reshape(spec.n_tiles * spec.nqb, spec.qb)
            valid_b = cells_b < n_cells
            c_first = cells_b[:, 0]
            c_last = jnp.max(jnp.where(valid_b, cells_b, -1), axis=1)
            has_q = c_last >= 0
            T_lo = Tt[jnp.where(has_q, c_first, n_cells)]
            T_hi = Tt[jnp.where(has_q, c_last, n_cells)]
            w_start = jnp.where(has_q, T_lo[:, 0], 0).astype(jnp.int32)
            w_len = jnp.where(has_q, T_hi[:, 1] - T_lo[:, 0], 0).astype(jnp.int32)
            return packed_new, trip_src, w_start, w_len
        return jax.jit(f)

    names = ["sort", "+hist", "+layout gathers", "+cells", "+T table",
             "+T[sk] gather", "+fluid scatters", "+bdry scatters", "+windows"]
    prev = 0.0
    for s, name in enumerate(names):
        t = timeit(upto(s), pk)
        print(f"{name:18s} cum={t:7.3f}  delta={t-prev:7.3f} ms")
        prev = t

    # and the trip gather / DUS pieces
    pk2, ctx, _ = jax.jit(eng._relayout)(pk)
    f1 = jax.jit(lambda pk, src: eng._geo_src(pk)[src].T)
    print(f"trip gather (L,8)+T: {timeit(f1, pk2, ctx.trip_src):7.3f} ms")
    rp = jnp.zeros((spec.n_src, 2), jnp.float32)
    f2 = jax.jit(lambda t, rp, src: jax.lax.dynamic_update_slice(t, rp[src].T, (6, 0)))
    trip = f1(pk2, ctx.trip_src)
    print(f"rp gather (L,2)+DUS: {timeit(f2, trip, rp, ctx.trip_src):7.3f} ms")


if __name__ == "__main__":
    main()

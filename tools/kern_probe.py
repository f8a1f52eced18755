#!/usr/bin/env python3
"""Isolate per-block overhead in the window kernels: DMA construct/issue,
semaphore waits, fori_loop setup, SMEM reads, VPU math."""

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.ops.pallas.window_kernels import _aligned, NFIELDS

LANE = 128
X, Y, M = 0, 1, 4


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_call(spec, cfg, variant):
    nqb, qb, cap, tq = spec.nqb, spec.qb, spec.cap, spec.tq
    n_tiles = spec.n_tiles
    norm = float(cfg.kernel_norm)
    inv_h = 1.0 / float(cfg.h)

    def kernel(w_start, w_len, w_start_n, w_len_n, q_ref, trip_hbm, out_ref,
               stage, sem):
        i = pl.program_id(0)
        ib = i % 8
        cur = lambda b: w_start[ib, b]
        nxt = lambda b: jnp.where(ib == 7, w_start_n[0, b],
                                  w_start[jnp.minimum(ib + 1, 7), b])
        slot = i % 2

        def start(get, s):
            for b in range(nqb):
                a, _ = _aligned(get(b))

                def _go(a=a, b=b, s=s):
                    pltpu.make_async_copy(
                        trip_hbm.at[:, pl.ds(a, cap)], stage.at[s, b], sem.at[s, b]
                    ).start()

                _go()

        if variant != "nodma":
            @pl.when(i == 0)
            def _():
                start(cur, slot)

            @pl.when(i + 1 < n_tiles)
            def _():
                start(nxt, (i + 1) % 2)

            for b in range(nqb):
                a, _ = _aligned(cur(b))

                def _wait(a=a, b=b):
                    pltpu.make_async_copy(
                        trip_hbm.at[:, pl.ds(a, cap)], stage.at[slot, b], sem.at[slot, b]
                    ).wait()

                _wait()

        if variant == "skeleton" or variant == "nodma":
            out_ref[:, :] = jnp.zeros((tq, 4), jnp.float32)
            return

        if variant == "dynmath":  # current: dynamic fori per block
            for b in range(nqb):
                st = w_start[ib, b]
                ln = w_len[ib, b]
                a, extra = _aligned(st)
                total = jnp.minimum(extra + ln, cap)
                nch = (total + LANE - 1) // LANE
                qx = q_ref[b * qb:(b + 1) * qb, X].reshape(qb, 1)
                qy = q_ref[b * qb:(b + 1) * qb, Y].reshape(qb, 1)

                def chunk(c, acc, b=b, qx=qx, qy=qy):
                    off = pl.multiple_of(c * LANE, LANE)
                    cx = stage[slot, b, X, pl.ds(off, LANE)].reshape(1, LANE)
                    cy = stage[slot, b, Y, pl.ds(off, LANE)].reshape(1, LANE)
                    cm = stage[slot, b, M, pl.ds(off, LANE)].reshape(1, LANE)
                    dx = qx - cx
                    dy = qy - cy
                    q = jnp.sqrt(dx * dx + dy * dy) * inv_h
                    t1 = jnp.maximum(1.0 - 0.5 * q, 0.0)
                    t1sq = t1 * t1
                    return acc + (cm * (t1sq * t1sq)) * (1.0 + 2.0 * q)

                acc = jax.lax.fori_loop(0, nch, chunk, jnp.zeros((qb, LANE), jnp.float32))
                rho = norm * jnp.sum(acc, axis=1, keepdims=True)
                out_ref[b * qb:(b + 1) * qb, 0:1] = rho

        elif variant == "staticmath":  # static unrolled chunks, static slices
            for b in range(nqb):
                qx = q_ref[b * qb:(b + 1) * qb, X].reshape(qb, 1)
                qy = q_ref[b * qb:(b + 1) * qb, Y].reshape(qb, 1)
                acc = jnp.zeros((qb, LANE), jnp.float32)
                for c in range(cap // LANE):
                    cx = stage[slot, b, X, c * LANE:(c + 1) * LANE].reshape(1, LANE)
                    cy = stage[slot, b, Y, c * LANE:(c + 1) * LANE].reshape(1, LANE)
                    cm = stage[slot, b, M, c * LANE:(c + 1) * LANE].reshape(1, LANE)
                    dx = qx - cx
                    dy = qy - cy
                    q = jnp.sqrt(dx * dx + dy * dy) * inv_h
                    t1 = jnp.maximum(1.0 - 0.5 * q, 0.0)
                    t1sq = t1 * t1
                    acc = acc + (cm * (t1sq * t1sq)) * (1.0 + 2.0 * q)
                rho = norm * jnp.sum(acc, axis=1, keepdims=True)
                out_ref[b * qb:(b + 1) * qb, 0:1] = rho

        elif variant == "staticmath_nowait":  # static math on stale data, no waits
            for b in range(nqb):
                qx = q_ref[b * qb:(b + 1) * qb, X].reshape(qb, 1)
                acc = jnp.zeros((qb, LANE), jnp.float32)
                for c in range(cap // LANE):
                    cx = stage[slot, b, X, c * LANE:(c + 1) * LANE].reshape(1, LANE)
                    acc = acc + qx - cx
                out_ref[b * qb:(b + 1) * qb, 0:1] = jnp.sum(acc, axis=1, keepdims=True)

    def call(ws, wl, q_packed, trip):
        pad = (-n_tiles) % 8 + 8
        ws_p = jnp.pad(ws, ((0, pad), (0, 0)))
        wl_p = jnp.pad(wl, ((0, pad), (0, 0)))
        span_spec = pl.BlockSpec((8, nqb), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
        span_ahead = pl.BlockSpec((8, nqb), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                span_spec, span_spec, span_ahead, span_ahead,
                pl.BlockSpec((tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((tq, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, nqb, NFIELDS, cap), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nqb)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((spec.n_layout, 4), jnp.float32),
            grid_spec=grid_spec,
        )(ws_p, wl_p, ws_p, wl_p, q_packed, trip)

    return jax.jit(call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--qb", type=int, default=16)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()
    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=128, qb=args.qb, cap=args.cap)
    sim = eng.prime(fluid, (0.0, -9.81))
    pk2, ctx, _ = jax.jit(eng._relayout)(sim.packed)
    trip = jax.jit(lambda pk: eng._geo_src(pk)[ctx.trip_src].T)(pk2)
    print(f"n={fluid.n} tiles={eng.spec.n_tiles} qb={args.qb} cap={args.cap}")
    for variant in ("nodma", "skeleton", "staticmath_nowait", "staticmath", "dynmath"):
        call = make_call(eng.spec, cfg, variant)
        t = timeit(call, ctx.w_start, ctx.w_len, pk2, trip)
        print(f"{variant:22s} {t:7.3f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Probe density-kernel output/query-layout variants on the real TPU."""

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
from pi_sph_fluid_tpu.ops.pallas.window_kernels import (_aligned, _doublebuffer,
                                                        _pad8, _span_specs,
                                                        _wait_windows, NFIELDS)

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


def make_density(spec, cfg, out_cols, hoist, eos_inside):
    nqb, qb, cap, tq = spec.nqb, spec.qb, spec.cap, spec.tq
    n_tiles = spec.n_tiles
    norm = float(cfg.kernel_norm)
    inv_h = 1.0 / float(cfg.h)
    inv_rho0 = 1.0 / float(cfg.rho_0)
    tait_b = float(cfg.tait_b)

    def kernel(w_start, w_start_n, q_ref, trip_hbm, out_ref, stage, sem):
        i = pl.program_id(0)
        ib = i % 8
        slot, cur = _doublebuffer(spec, False, n_tiles, i, ib,
                                  trip_hbm, stage, sem, w_start, w_start_n)
        _wait_windows(spec, trip_hbm, stage, sem, cur, slot)
        if hoist:
            qx_t = q_ref[:, X].reshape(tq, 1)
            qy_t = q_ref[:, Y].reshape(tq, 1)
        for b in range(nqb):
            qlo = b * qb
            if hoist:
                qx = qx_t[qlo:qlo + qb]
                qy = qy_t[qlo:qlo + qb]
            else:
                qx = q_ref[qlo:qlo + qb, X].reshape(qb, 1)
                qy = q_ref[qlo:qlo + qb, Y].reshape(qb, 1)
            acc = jnp.zeros((qb, LANE), jnp.float32)
            for c in range(cap // LANE):
                lo = c * LANE
                cx = stage[slot, b, X, lo:lo + LANE].reshape(1, LANE)
                cy = stage[slot, b, Y, lo:lo + LANE].reshape(1, LANE)
                cm = stage[slot, b, M, lo:lo + LANE].reshape(1, LANE)
                dx = qx - cx
                dy = qy - cy
                q = jnp.sqrt(dx * dx + dy * dy) * inv_h
                t1 = jnp.maximum(1.0 - 0.5 * q, 0.0)
                t1sq = t1 * t1
                acc = acc + (cm * (t1sq * t1sq)) * (1.0 + 2.0 * q)
            rho = norm * jnp.sum(acc, axis=1, keepdims=True)
            if eos_inside:
                ratio = rho * inv_rho0
                r2 = ratio * ratio
                r4 = r2 * r2
                p = jnp.maximum(tait_b * (r4 * r2 * ratio - 1.0), 0.0)
                cpress = jnp.where(rho > 0.0, p / (rho * rho), 0.0)
                out_ref[qlo:qlo + qb, 0:1] = rho
                out_ref[qlo:qlo + qb, 1:2] = p
                out_ref[qlo:qlo + qb, 2:3] = cpress
                out_ref[qlo:qlo + qb, 3:4] = 0.5 * rho
            elif out_cols == 1:
                out_ref[qlo:qlo + qb, 0:1] = rho
            else:
                out_ref[qlo:qlo + qb, :] = jnp.broadcast_to(rho, (qb, out_cols))

    def call(ws, q_packed, trip):
        ws_p = _pad8(ws)
        here, ahead = _span_specs(spec)
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                here, ahead,
                pl.BlockSpec((tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((tq, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, nqb, NFIELDS, cap), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nqb)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((spec.n_layout, out_cols), jnp.float32),
            grid_spec=grid_spec,
        )(ws_p, ws_p, q_packed, trip)

    return jax.jit(call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tq", type=int, default=256)
    ap.add_argument("--qb", type=int, default=16)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()
    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=args.tq, qb=args.qb, cap=args.cap)
    sim = eng.prime(fluid, (0.0, -9.81))
    pk2, ctx, _ = jax.jit(eng._relayout)(sim.packed)
    trip = jax.jit(lambda pk: eng._geo_src(pk)[ctx.trip_src].T)(pk2)
    print(f"n={fluid.n} tiles={eng.spec.n_tiles} tq={args.tq} qb={args.qb} cap={args.cap}")
    variants = [
        ("out4 eos-in no-hoist", dict(out_cols=4, hoist=False, eos_inside=True)),
        ("out4 eos-in hoist   ", dict(out_cols=4, hoist=True, eos_inside=True)),
        ("out1 eos-out hoist  ", dict(out_cols=1, hoist=True, eos_inside=False)),
        ("out8 eos-out hoist  ", dict(out_cols=8, hoist=True, eos_inside=False)),
        ("out8 eos-out no-hoist", dict(out_cols=8, hoist=False, eos_inside=False)),
        ("out128 eos-out hoist", dict(out_cols=128, hoist=True, eos_inside=False)),
    ]
    for name, kw in variants:
        call = make_density(eng.spec, cfg, **kw)
        t = timeit(call, ctx.w_start, pk2, trip)
        print(f"{name:24s} {t:7.3f} ms")


if __name__ == "__main__":
    main()

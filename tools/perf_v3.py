#!/usr/bin/env python3
"""v3 window engine: TPU hardware validation + performance measurement."""

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.models.engine_pallas import PallasDims, PallasEngine


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tq", type=int, default=128)
    ap.add_argument("--qb", type=int, default=16)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--resort", type=int, default=4)
    ap.add_argument("--compare-v1", action="store_true")
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    g = jnp.asarray((0.0, -9.81), jnp.float32)

    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=args.tq, qb=args.qb, cap=args.cap)
    print(f"n={fluid.n} n_layout={eng.spec.n_layout} L={eng.spec.L} "
          f"rowcap={eng.spec.rowcap} tiles={eng.spec.n_tiles}")
    sim = eng.prime(fluid, (0.0, -9.81))
    jax.block_until_ready(sim.packed)

    # sanity vs v1 engine: same rho after one fresh relayout+passes
    if args.compare_v1:
        eng1 = PallasEngine(cfg, boundary, bgrid, fluid.n, PallasDims())
        sim1 = eng1.prime(fluid, (0.0, -9.81))
        f3 = eng.unpad(sim)
        f1 = eng1.unpad(sim1)
        dr = np.max(np.abs(np.asarray(f3.rho) - np.asarray(f1.rho)) / np.asarray(f1.rho))
        da = np.max(np.abs(np.asarray(sim.au)[np.asarray(sim.ids) >= 0]))
        print(f"prime rho max rel err vs v1: {dr:.3e}  (|au| max {da:.2f})")

    # piece timings
    rel = jax.jit(lambda pk: eng._relayout(pk)[0])
    print(f"relayout:   {timeit(rel, sim.packed):7.3f} ms")
    pk2, ctx, ovf = jax.jit(eng._relayout)(sim.packed)
    print(f"overflow:   {int(ovf)}")
    trip = jax.jit(lambda pk: eng._geo_src(pk)[ctx.trip_src].T)(pk2)
    f_gather = jax.jit(lambda pk: eng._geo_src(pk)[ctx.trip_src].T)
    print(f"trip gathr: {timeit(f_gather, pk2):7.3f} ms")
    from pi_sph_fluid_tpu.ops.pallas.window_kernels import density_window_call, forces_window_call
    f_dens = jax.jit(lambda q, t: density_window_call(q, t, ctx.w_start, cfg, eng.spec))
    print(f"density:    {timeit(f_dens, pk2, trip):7.3f} ms")
    dens = f_dens(pk2, trip)
    f_forc = jax.jit(lambda q, d, t: forces_window_call(q, d, t, ctx.w_start, g, cfg, eng.spec))
    print(f"forces:     {timeit(f_forc, pk2, dens, trip):7.3f} ms")
    step = jax.jit(eng.make_step())
    print(f"full step:  {timeit(lambda s: step(s, g)[0].packed, sim, reps=10):7.3f} ms")

    # multi-step throughput
    for resort in (1, args.resort):
        multi = jax.jit(eng.make_multi_step(resort_every=resort))
        gt = jnp.broadcast_to(g, (args.steps, 2))
        sim2, st = multi(sim, gt)
        jax.block_until_ready(sim2.packed)
        t0 = time.perf_counter()
        sim2, st = multi(sim, gt)
        jax.block_until_ready(sim2.packed)
        wall = time.perf_counter() - t0
        ps = fluid.n * args.steps / wall
        print(f"resort={resort}: {ps/1e6:8.2f} M ps/s   ({wall/args.steps*1e3:6.3f} ms/step) "
              f"overflow={int(jnp.max(st.neighbor_overflow))} "
              f"rho_err={float(jnp.max(st.max_rho_error_pct)):.3f}%")


if __name__ == "__main__":
    main()

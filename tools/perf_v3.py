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
    ap.add_argument("--tq", type=int, default=256)
    ap.add_argument("--qb", type=int, default=16)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--seg-q", type=int, default=2)
    ap.add_argument("--planes", type=int, default=2,
                    help="2=dual-plane fetch (default), 1=exact-start fetch")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--resorts", type=str, default="1,4")
    ap.add_argument("--pieces", action="store_true")
    ap.add_argument("--band", type=int, default=None,
                    help="banded candidate gather: band rows (0=off, "
                         "unset=auto per triple_spec)")
    ap.add_argument("--concatfree", action="store_true",
                    help="probe: pad-form kick-drift with (pk, acc) "
                         "carries — no column extracts, no concat "
                         "(engine_v3.make_multi_step_concatfree)")
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    g = jnp.asarray((0.0, -9.81), jnp.float32)

    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=args.tq, qb=args.qb,
                       cap=args.cap, seg_q=args.seg_q, planes=args.planes,
                       band=args.band)
    print(f"n={fluid.n} n_layout={eng.spec.n_layout} L={eng.spec.L} "
          f"tiles={eng.spec.n_tiles} band_h={eng.spec.band_h} "
          f"band_p={eng.spec.band_p}")
    sim = eng.prime(fluid, (0.0, -9.81))
    jax.block_until_ready(sim.packed)

    if args.pieces:
        rel = jax.jit(eng._relayout)
        print(f"relayout:   {timeit(lambda pk: rel(pk)[0], sim.packed):7.3f} ms")
        pk2, ctx, ovf = rel(sim.packed)
        print(f"overflow:   {int(ovf)}")
        pp = jax.jit(lambda pk, ctx: eng._pair_passes(pk, ctx, g))
        print(f"pair passes:{timeit(lambda: pp(pk2, ctx)[0]):7.3f} ms")
        step = jax.jit(eng.make_step())
        print(f"full step:  {timeit(lambda s: step(s, g)[0].packed, sim):7.3f} ms")

    for resort in (int(x) for x in args.resorts.split(",")):
        if args.concatfree and resort > 1:
            multi = jax.jit(eng.make_multi_step_concatfree(
                resort_every=resort))
        else:
            multi = jax.jit(eng.make_multi_step(resort_every=resort))
        # round up to a whole group (resort<=1 is the exact per-step path)
        steps = args.steps if resort <= 1 else -(-args.steps // resort) * resort
        gt = jnp.broadcast_to(g, (steps, 2))
        sim2, st = multi(sim, gt)
        jax.block_until_ready(sim2.packed)
        t0 = time.perf_counter()
        sim2, st = multi(sim, gt)
        jax.block_until_ready(sim2.packed)
        wall = time.perf_counter() - t0
        ps = fluid.n * steps / wall
        print(f"resort={resort}: {ps/1e6:8.2f} M ps/s   ({wall/steps*1e3:6.3f} ms/step) "
              f"overflow={int(jnp.max(st.neighbor_overflow))} "
              f"rho_err={float(jnp.max(st.max_rho_error_pct)):.3f}%")


if __name__ == "__main__":
    main()

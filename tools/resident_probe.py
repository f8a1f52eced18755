#!/usr/bin/env python3
"""The VMEM-resident megakernel ceiling, measured (round 5, VERDICT r4 #4).

ROOFLINE §3's last untested formulation lever: a G-ticks-per-invocation
megakernel (relayout outside, candidates refreshed in-VMEM) would delete
the per-tick gather + layout-copy pipeline.  Building it requires either
an in-kernel gather (measured dead: per-run DMAs, MXU one-hot — §2) or a
3-span direct fetch (derived ≥1.5x kernel lanes — §2).  Before paying for
that build, this probe measures the structure's CEILING exactly:

  stage A (shipped): the production sticky group — per-tick gathers +
     dual builds + kernels + kick-drift glue.
  stage B (skeleton): the same scan with the candidate arrays FROZEN at
     their group-start values — per-tick cost is kernels + kick-drift
     glue ONLY.  The physics is deliberately stale/wrong (candidate
     positions stop moving), but every kernel invocation, DMA pattern,
     and XLA op is shape-identical to a megakernel whose in-VMEM refresh
     were FREE and lane-neutral.

  ceiling(B) bounds EVERY megakernel variant from above at equal lane
  count; a real one pays refresh on top (≥1.5x kernel lanes for 3-span,
  §2).  If B/A is small, the lever is dead by measurement.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/resident_probe.py
Reference: the hot pair loop `pi_sph_fluid.c:317-337`.
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.ops.pallas.window_kernels import (
    density_window_call, forces_window_call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--resort", type=int, default=64)
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n)
    sim = eng.prime(fluid, (0.0, -9.81))
    g = jnp.asarray((0.0, -9.81), jnp.float32)
    gt = jnp.broadcast_to(g, (args.steps, 2))
    n = fluid.n
    print(f"n={n} resort={args.resort} steps={args.steps}")

    def run(fn, state):
        out = fn(state, gt)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(state, gt)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    # ---- stage A: the shipped sticky group --------------------------------
    wall_a = run(jax.jit(eng.make_multi_step(resort_every=args.resort)), sim)
    print(f"A shipped  : {n*args.steps/wall_a/1e6:8.2f} M ps/s  "
          f"({wall_a/args.steps*1e3:6.3f} ms/step)")

    # ---- stage B: frozen candidates (kernels + integration only) ----------
    dt = jnp.float32(cfg.dt)
    half_dt = jnp.float32(0.5) * dt
    half_f = 0.5 * float(cfg.dt)

    def frozen_multi(sim, g_trace):
        groups = g_trace.reshape(-1, args.resort, 2)

        def group(carry, g_group):
            pk, au, av = carry
            u = pk[:, 2] + half_dt * au
            v = pk[:, 3] + half_dt * av
            pk = jnp.concatenate(
                [(pk[:, 0] + dt * u)[:, None], (pk[:, 1] + dt * v)[:, None],
                 u[:, None], v[:, None], pk[:, 4:]], axis=1)
            pk, ctx, _ = eng._relayout(pk)
            # group-start candidate builds, as shipped
            geo_d_src = jnp.concatenate([
                jnp.concatenate([pk[:, 0:2], pk[:, 4:5], eng._zcol], axis=1),
                eng.b_geo_d, eng.inert_row_d], axis=0)
            geo_d = eng._expand(geo_d_src[ctx.trip_src].T)
            geo8, rp = density_window_call(pk, geo_d, ctx.w_start, ctx.flen,
                                           cfg, eng.spec)
            geo_f_src = jnp.concatenate([geo8, eng.b_geo, eng.inert_row],
                                        axis=0)
            geo_f = eng._expand(geo_f_src[ctx.trip_src].T)
            pk, acc = forces_window_call(pk, geo8, rp, geo_f, ctx.w_start,
                                         ctx.flen, g_group[0], cfg, eng.spec,
                                         half_dt=half_f)

            def carried(c, g_j):
                pk, acc = c
                u = pk[:, 2] + half_dt * acc[:, 0]
                v = pk[:, 3] + half_dt * acc[:, 1]
                pk2 = jnp.concatenate(
                    [(pk[:, 0] + dt * u)[:, None],
                     (pk[:, 1] + dt * v)[:, None],
                     u[:, None], v[:, None], pk[:, 4:]], axis=1)
                # FROZEN geo_d / geo_f: no re-gather, no dual build — the
                # kernels and their DMA pattern are exactly the shipped
                # per-tick cost, minus redistribution.  Physics: stale.
                geo8_t, rp_t = density_window_call(
                    pk2, geo_d, ctx.w_start, ctx.flen, cfg, eng.spec)
                pk3, acc = forces_window_call(
                    pk2, geo8_t, rp_t, geo_f, ctx.w_start, ctx.flen, g_j,
                    cfg, eng.spec, half_dt=half_f)
                return (pk3, acc), ()

            (pk, acc), _ = jax.lax.scan(carried, (pk, acc), g_group[1:])
            return (pk, acc[:, 0], acc[:, 1]), ()

        carry, _ = jax.lax.scan(group, (sim.packed, sim.au, sim.av), groups)
        return carry

    wall_b = run(jax.jit(frozen_multi), sim)
    print(f"B skeleton : {n*args.steps/wall_b/1e6:8.2f} M ps/s  "
          f"({wall_b/args.steps*1e3:6.3f} ms/step)")
    print(f"ceiling ratio B/A = {wall_a/wall_b:5.2f}x; a 3-span megakernel "
          f"pays >= 1.5x kernel lanes on top of B's kernel time")


if __name__ == "__main__":
    main()

"""Map the 250k/slab throughput dip (STATUS r5 gap #4) across per-slab loads.

Round 5's strong-scaling rows measured the dd backend at 125k / 250k / 500k
per slab and found 250k BELOW both neighbors (15.3M vs 20.4M / 16.9M ps/s)
with smooth static geometry (grid occupancy 5.4 particles/cell, capacity
ratios monotone — see the geometry table in ROOFLINE §4b).  This sweep adds
intermediate loads in the same session so the dip's SHAPE is measured:
a lone anomaly at 250k points at an XLA compilation/tiling choice for that
shape; a smooth valley points at a real bandwidth/occupancy regime.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/dd_load_sweep.py \
      [--loads 125000,175000,250000,350000,500000] [--resort 32] [--steps 384]

Reference anchor: the scale-out parallelism row `pi_sph_fluid.c:610`; the
1M@60Hz operating points ride these loads (BASELINE.md).
"""
import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.parallel.domain_window import WindowDomain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loads", type=str,
                    default="125000,175000,200000,250000,300000,350000,500000")
    ap.add_argument("--resort", type=int, default=32)
    ap.add_argument("--steps", type=int, default=384)
    args = ap.parse_args()

    for n_t in (int(s) for s in args.loads.split(",")):
        r = math.sqrt(6.35 / n_t)
        cfg = sph.SPHConfig(r=r)
        fluid, braw = sph.build_pool_scene(cfg)
        boundary, bgrid = sph.prepare_boundary(braw, cfg)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
        dd = WindowDomain(cfg, boundary, bgrid, fluid.n, mesh)
        state = dd.init(fluid)
        gt = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                              (args.steps, 2))
        multi = jax.jit(dd.make_multi_step(resort_every=args.resort))
        s2, st = multi(state, gt)               # compile + warm
        jax.block_until_ready(s2.fluid.x)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            s2, st = multi(state, gt)
            jax.block_until_ready(s2.fluid.x)
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        ms = wall / args.steps * 1e3
        ps = fluid.n * args.steps / wall
        print(f"n={fluid.n:7d} r{args.resort}: {ms:7.3f} ms/step "
              f"{ps / 1e6:7.2f} M ps/s "
              f"(min/max {fluid.n * args.steps / max(walls) / 1e6:.2f}/"
              f"{fluid.n * args.steps / min(walls) / 1e6:.2f}) "
              f"ovf={int(np.max(np.asarray(st['overflow'])))} "
              f"stale={int(np.sum(np.asarray(st['stale'])))} "
              f"n_valid={int(np.asarray(st['n_valid'])[-1])}", flush=True)


if __name__ == "__main__":
    main()

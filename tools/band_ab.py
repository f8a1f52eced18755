#!/usr/bin/env python3
"""Same-session A/B: banded candidate gather (TripleSpec.band_h) vs the
plain gather, end-to-end through the production engine at the loads where
the XLA gather cliff bites (tools/gather_cliff_probe.py).

Usage: band_ab.py --n 250000 --resort 64 --steps 128 [--bands 0,auto]
Prints one line per arm; 'auto' resolves per triple_spec's BAND_AUTO_MIN.
"""
import argparse
import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--resort", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--bands", type=str, default="0,auto")
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    steps = -(-args.steps // args.resort) * args.resort
    g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32), (steps, 2))

    for tok in args.bands.split(","):
        band = None if tok == "auto" else int(tok)
        eng = WindowEngine(cfg, boundary, bgrid, fluid.n, band=band)
        sim = eng.prime(fluid, (0.0, -9.81))
        multi = jax.jit(eng.make_multi_step(resort_every=args.resort))
        sim2, st = multi(sim, g)
        jax.block_until_ready(sim2.packed)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            sim2, st = multi(sim, g)
            jax.block_until_ready(sim2.packed)
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        print(f"band={tok}(h={eng.spec.band_h},P={eng.spec.band_p}) "
              f"n={fluid.n} r{args.resort}: "
              f"{fluid.n * steps / wall / 1e6:7.2f} M ps/s "
              f"({wall / steps * 1e3:6.3f} ms/step) "
              f"min/max {fluid.n * steps / max(walls) / 1e6:.2f}/"
              f"{fluid.n * steps / min(walls) / 1e6:.2f} "
              f"ovf={int(jnp.max(st.neighbor_overflow))} "
              f"stale={int(jnp.sum(st.stale))}", flush=True)
        del eng, sim, sim2, multi


if __name__ == "__main__":
    main()

"""Sticky-group vs per-step WindowDomain cost on the real chip (1 slab).

Round 2 measured a carried tick at ~23 ms vs a 14 ms full step at 100k —
the 'XLA scheduling pathology' of VERDICT r2 weak #1.  Round 3 replaced
the carried tick's two lane-dimension DUS scatters (pk.at[ghost, 0:4].set)
with whole-row gather + one whole-row scatter; this probe quantifies it.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/dd_probe.py [--n N]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    dd = WindowDomain(cfg, boundary, bgrid, fluid.n, mesh)
    state = dd.init(fluid)
    gt = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                          (args.steps, 2))

    for resort in (1, 4, 8):
        multi = jax.jit(dd.make_multi_step(resort_every=resort))
        s2, st = multi(state, gt)
        jax.block_until_ready(s2.fluid.x)
        t0 = time.perf_counter()
        s2, st = multi(state, gt)
        jax.block_until_ready(s2.fluid.x)
        wall = time.perf_counter() - t0
        ms = wall / args.steps * 1e3
        ps = fluid.n * args.steps / wall
        print(f"resort={resort}: {ms:7.3f} ms/step  {ps/1e6:7.2f} M ps/s  "
              f"ovf={int(np.max(np.asarray(st['overflow'])))} "
              f"n_valid={int(np.asarray(st['n_valid'])[-1])}")


if __name__ == "__main__":
    main()

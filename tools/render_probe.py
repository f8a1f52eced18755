"""Render cost at scale: frame reuse vs self-relayout (VERDICT r2 weak #4).

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/render_probe.py --n 1000000
"""
import argparse
import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.render.metaballs_window import WindowRenderer


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=128)
    ap.add_argument("--resort", type=int, default=4)
    ap.add_argument("--band", type=int, default=None,
                    help="engine band rows (0=plain gather, default auto)")
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, band=args.band)
    rend = WindowRenderer(eng, args.rows, args.cols)
    print(f"n={fluid.n} band_h={eng.spec.band_h} reuse_cap={rend.reuse_cap} "
          f"self_cap={rend.fspec.cap} px_layout={rend.spec.n_layout}")
    sim = eng.prime(fluid, (0.0, -9.81))
    multi = jax.jit(eng.make_multi_step(resort_every=args.resort,
                                        return_frame=True))
    g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                         (args.resort, 2))
    sim, st, frame = jax.block_until_ready(multi(sim, g))

    reuse = jax.jit(rend.render_from_frame)
    fb, ov = reuse(sim, frame)
    print(f"reuse overflow={int(ov)}")
    print(f"render_from_frame: {timeit(reuse, sim, frame):8.3f} ms/frame")
    full = jax.jit(rend.render)
    fb2, ov2 = full(sim)
    print(f"self overflow={int(ov2)}")
    print(f"self-relayout:     {timeit(full, sim):8.3f} ms/frame")


if __name__ == "__main__":
    main()

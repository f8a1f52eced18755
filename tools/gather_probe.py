"""Gather cost-model probe (round 3).

The per-tick candidate gathers (geo_src[trip_src]) were measured at
~1.6 ms/tick at 100k in round 2 — the second-largest step cost.  Round-3
levers (merged single gather, narrow cp/re planes, carried-tick refresh,
bf16 storage) each pay off under a different cost model, so this probe
measures, on the real chip with the real bench-scale index vector:

  * row width scaling: (L, k) f32 gathers for k in {1, 2, 4, 8, 16}
  * dtype scaling: bf16 vs f32 at k = 8
  * the _dual() plane build on the gathered result
  * a row scatter (the inverse-map alternative)

If cost ~ rows (scalar-core issue bound), narrow planes buy nothing and
only *fewer gather ops* matter; if cost ~ bytes, bf16 and narrow planes
halve the bill.  Run:

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/gather_probe.py
"""

import math
import time

import jax
import jax.numpy as jnp

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.models.scene import build_pool_scene

N = 100_000
K = 100  # scan iterations per timing


def main():
    r = math.sqrt(6.35 / N)
    cfg = SPHConfig(r=r)
    fluid, braw = build_pool_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n)
    packed = eng._initial_packed(fluid)
    pk, ctx, _ = jax.jit(eng._relayout)(packed)
    trip_src = ctx.trip_src
    L = eng.spec.L
    n_src = eng.spec.n_src
    print(f"n={fluid.n} n_layout={eng.spec.n_layout} L={L} n_src={n_src}")

    def timed(name, fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"{name:34s} {dt:8.3f} ms/iter")
        return dt

    def make_gather(k, dtype):
        src0 = jnp.zeros((n_src, k), dtype)

        @jax.jit
        def run(src0, idx):
            def body(c, _):
                src = src0 + c.astype(dtype)
                g = src[idx]
                return c + g[0, 0].astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        return lambda: run(src0, trip_src)

    for k in (1, 2, 4, 8, 16):
        timed(f"gather (L,{k}) f32", make_gather(k, jnp.float32))
    timed("gather (L,8) bf16", make_gather(8, jnp.bfloat16))
    timed("gather (L,4) bf16", make_gather(4, jnp.bfloat16))

    # element gather (flat 1-D) for reference
    src_flat = jnp.zeros((n_src,), jnp.float32)

    @jax.jit
    def run_flat(src0, idx):
        def body(c, _):
            g = (src0 + c)[idx]
            return c + g[0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    timed("gather (L,) element f32", lambda: run_flat(src_flat, trip_src))

    # the dual-plane build on a gathered (8, L) array
    g8 = jnp.zeros((8, L), jnp.float32)

    @jax.jit
    def run_dual(a0):
        def body(c, _):
            a = a0 + c
            d = jnp.concatenate([a, jnp.pad(a[:, 64:], ((0, 0), (0, 64)))], axis=1)
            return c + d[0, 0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    timed("dual build (8,L)->(8,2L) f32", run_dual, g8)

    # row scatter: (n_layout, 8) values into L slots at trip-positions
    # (first-copy positions approximated by a shuffled subset of slots)
    vals = jnp.zeros((eng.spec.n_layout, 8), jnp.float32)
    dst = jax.random.permutation(jax.random.PRNGKey(0),
                                 jnp.arange(L, dtype=jnp.int32))[: eng.spec.n_layout]

    @jax.jit
    def run_scatter(vals0, dst):
        def body(c, _):
            v = vals0 + c
            out = jnp.zeros((L, 8), jnp.float32).at[dst].set(v)
            return c + out[0, 0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    timed("row scatter (n,8)->L slots", run_scatter, vals, dst)

    # elementwise integrate in candidate space: (8, 2L) read+write
    @jax.jit
    def run_integrate(a0):
        def body(c, _):
            d = a0 + c
            d = d.at[0].add(d[2] * jnp.float32(1e-4))
            return c + d[0, 0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    timed("elementwise update (8,2L)", run_integrate,
          jnp.zeros((8, 2 * L), jnp.float32))


if __name__ == "__main__":
    main()

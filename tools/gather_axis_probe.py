"""Gather-axis probe (round 4).

The round-4 device trace (tools/trace_probe.py) shows the candidate
redistribution pipeline costing ~2.4 ms/tick: the two row gathers
(fusion.219/.221, 0.37 ms each) PLUS the layout copies XLA inserts to
re-lay the (L, k){1,0} gather output into the kernels' candidate-major
(k, 2L) HBM operand (copy.391/.394, ~0.28 ms combined).  If an axis-1
gather on a pre-transposed (k, n_src) source costs the same as the row
gather, it produces the kernel layout DIRECTLY and the transposing
copies die.  This probe measures both END-TO-END (gather -> dual-plane
build), on the real bench-scale index vector:

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/gather_axis_probe.py
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
K = 100


def main():
    r = math.sqrt(6.35 / N)
    cfg = SPHConfig(r=r)
    fluid, braw = build_pool_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n)
    packed = eng._initial_packed(fluid)
    pk, ctx, _ = jax.jit(eng._relayout)(packed)
    idx = ctx.trip_src
    L = eng.spec.L
    n_src = eng.spec.n_src
    print(f"n={fluid.n} L={L} n_src={n_src}")

    def dual(a):
        return jnp.concatenate([a, jnp.pad(a[:, 64:], ((0, 0), (0, 64)))],
                               axis=1)

    def timed(name, fn, *args):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"{name:44s} {dt:8.3f} ms/iter")
        return dt

    for k in (4, 8):
        src = jnp.zeros((n_src, k), jnp.float32)
        srcT = jnp.zeros((k, n_src), jnp.float32)

        @jax.jit
        def row_gather_dual(s0, idx):
            def body(c, _):
                s = s0 + c
                d = dual(s[idx].T)
                return c + d[0, 0], ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        @jax.jit
        def axis1_gather_dual(s0, idx):
            def body(c, _):
                s = s0 + c
                d = dual(jnp.take(s, idx, axis=1))
                return c + d[0, 0], ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        timed(f"row gather (L,{k}) -> .T -> dual (shipped)",
              row_gather_dual, src, idx)
        timed(f"axis-1 gather ({k},n)[:, idx] -> dual",
              axis1_gather_dual, srcT, idx)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Microbenchmarks for the round-2 kernel redesign decisions.

Measures on the attached TPU:
  * argsort vs single-array packed sort (relayout cost driver)
  * row-gather throughput (L, k) <- (n, k)[idx]  (triple-array rebuild)
  * narrow transpose (L, k) -> (k, L)
  * 1-D int32 scatter (trip_src build)
  * current engine piece timings (relayout, span build, density, forces)
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_pallas import PallasDims, PallasEngine


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    for n in (200_000, 2_000_000):
        print(f"--- n = {n} ---")
        keys = jax.random.randint(key, (n,), 0, 20_000, dtype=jnp.int32)

        t = timeit(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys)
        print(f"argsort stable int32:        {t:8.3f} ms")
        t = timeit(jax.jit(lambda k: jnp.argsort(k)), keys)
        print(f"argsort default int32:       {t:8.3f} ms")

        # packed single-array sort: key*2^k + idx when bits allow
        def packed_sort(k):
            packed = k.astype(jnp.int64) * (1 << 22) + jnp.arange(k.shape[0], dtype=jnp.int64)
            s = jnp.sort(packed)
            return (s & ((1 << 22) - 1)).astype(jnp.int32)
        t = timeit(jax.jit(packed_sort), keys)
        print(f"packed int64 sort:           {t:8.3f} ms")

        def sort_pair(k):
            idx = jnp.arange(k.shape[0], dtype=jnp.int32)
            _, o = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
            return o
        t = timeit(jax.jit(sort_pair), keys)
        print(f"lax.sort (key,idx) stable:   {t:8.3f} ms")

        # row gather: (L, k) <- (n, k)[idx]
        src8 = jax.random.normal(key, (n, 8), jnp.float32)
        L = 3 * n
        idx = jax.random.randint(key, (L,), 0, n, dtype=jnp.int32)
        for k in (2, 4, 8):
            srck = src8[:, :k]
            t = timeit(jax.jit(lambda s, i: s[i]), srck, idx)
            gb = L * k * 4 * 2 / 1e9
            print(f"row gather (L,{k}) L={L}:    {t:8.3f} ms  ({gb/t*1e3:6.1f} GB/s eff)")

        # gather + transpose fused
        t = timeit(jax.jit(lambda s, i: s[i].T), src8[:, :4], idx)
        print(f"row gather (L,4) + T:        {t:8.3f} ms")

        # narrow transpose
        big = jax.random.normal(key, (L, 4), jnp.float32)
        t = timeit(jax.jit(lambda x: x.T.copy() if hasattr(x.T, 'copy') else x.T), big)
        print(f"transpose (L,4)->(4,L):      {t:8.3f} ms")

        # scatter 1-D int32
        dst_idx = jax.random.permutation(key, L)[:n].astype(jnp.int32)
        vals = jnp.arange(n, dtype=jnp.int32)
        t = timeit(jax.jit(lambda di, v: jnp.zeros((L,), jnp.int32).at[di].set(v, unique_indices=True)), dst_idx, vals)
        print(f"scatter int32 n->{L}:        {t:8.3f} ms")

        # histogram scatter-add (CSR build)
        t = timeit(jax.jit(lambda k: jnp.zeros(20_002, jnp.int32).at[k + 1].add(1)), keys)
        print(f"hist scatter-add:            {t:8.3f} ms")

    # ---- current engine piece timings at 100k (pool scene) ----
    print("--- current engine pieces, pool 100k ---")
    r = math.sqrt(6.35 / 100_000)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = PallasEngine(cfg, boundary, bgrid, fluid.n, PallasDims())
    sim = eng.prime(fluid, (0.0, -9.81))
    g = jnp.asarray((0.0, -9.81), jnp.float32)
    print(f"n_fluid={fluid.n} n_layout={eng.n_layout} rowcap={eng.rowcap} "
          f"n_cells={cfg.n_cells} rows={cfg.n_cell_rows} cols={cfg.n_cell_cols}")

    relayout = jax.jit(lambda pk, ids: eng._relayout(pk, ids))
    t = timeit(relayout, sim.packed, sim.ids)
    print(f"relayout (sort+hist+gather): {t:8.3f} ms")

    build = jax.jit(lambda pk, ids: eng._build_spans(pk, ids))
    t = timeit(build, sim.packed, sim.ids)
    print(f"build_spans (incl relayout): {t:8.3f} ms")

    pk2, ids2, spans, _ = build(sim.packed, sim.ids)
    f_spans, b_spans, _ = spans
    # span stats
    fl = np.asarray(f_spans.length)
    fs = np.asarray(f_spans.start)
    extra = fs % 128
    print(f"fluid span len: mean={fl[fl>0].mean():.0f} p99={np.percentile(fl[fl>0],99):.0f} "
          f"max={fl.max()} nonzero_tiles={np.count_nonzero(fl.sum(1))}/{fl.shape[0]}")
    chunks = np.ceil(np.minimum(extra + fl, 512) / 128).sum()
    print(f"total fluid chunks/step: {chunks:.0f} -> lanes/query = {chunks*128*128/fluid.n:.0f}")
    bl = np.asarray(b_spans.length)
    print(f"boundary span len: sum={bl.sum()} nonzero tiles={np.count_nonzero(bl.sum(1))}")

    from pi_sph_fluid_tpu.ops.pallas.pair_kernels import density_eos_call, forces_call
    dims = eng.dims
    fc = jnp.pad(pk2.T, ((0, 0), (0, dims.cap)))
    dens = jax.jit(lambda q, f: density_eos_call(q, f, eng.bc_packed, f_spans, b_spans, cfg, dims))
    t = timeit(dens, pk2, fc)
    print(f"density kernel:              {t:8.3f} ms")
    rhop = dens(pk2, fc)
    rp = jnp.pad(rhop.T, ((0, 0), (0, dims.cap)))
    forc = jax.jit(lambda q, rr, f, rpk: forces_call(q, rr, f, rpk, eng.bc_packed, f_spans, b_spans, g, cfg, dims))
    t = timeit(forc, pk2, rhop, fc, rp)
    print(f"forces kernel:               {t:8.3f} ms")

    step = jax.jit(eng.make_step())
    t = timeit(lambda s: step(s, g)[0].packed, sim, reps=10)
    print(f"full step (resort_every=1):  {t:8.3f} ms")


if __name__ == "__main__":
    main()

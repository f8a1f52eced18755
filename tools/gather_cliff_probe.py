#!/usr/bin/env python3
"""XLA row-gather cost cliff + banded-gather A/B (round 5).

The candidate gather (`src[trip_src]`, an (L, k) row gather from an
(n_src, k) source) is the engine's redistribution backbone: it runs
twice per tick (geometry rows into the density kernel, force-candidate
rows into the forces kernel).  On v5e, XLA's row gather falls off a
measured cost cliff once the SOURCE outgrows ~7-8 MB (~230k 8-col f32
rows): the same index set costs ~1 ms below the cliff and 2.5-9x above
it.  That made the two gathers ~60% of a 500k tick and the dominant
cost at 1M+ — and explains the round-5 "250k dip" (STATUS gap #4).

Fix (shipped, `TripleSpec.band_h` / `WindowEngine._take`): trip_src is
segment-ordered, so each contiguous chunk of L reads one contiguous
layout band plus the static boundary tail.  Chunking L into P pieces
and gathering each from an h-row `dynamic_slice` band keeps every
local source in the fast small-source mode at ANY scale.  Bitwise rows
(tests/test_window_engine.py::test_banded_gather_bitwise); undersized
bands scream x1e6 through the overflow channel.

Modes:
  --synthetic   sweep L (n_src = L/2.22) over the cliff with
                bench-shaped sorted-ish indices, in-scan
  --real N      build the real engine at N, time shipped vs banded on
                the actual trip_src (k=4 and k=8 sources)
  --hsweep N    band-rows sweep on the real trip_src

Measured (v5e, 2026-08, same session):
  synthetic: L=500k 0.91 ms -> L=520k 2.49 ms -> L=524288 5.44 ms
  real 500k trip_src (L=1.11M, n_src=509k): k=4 6.14 -> 3.78 ms (1.6x),
    k=8 11.75 -> 3.88 ms (3.0x) at h=120k/P=5
  end-to-end engine (perf_v3, r32): 250k 16.8 -> 21.6M ps/s (+29%)

Reference anchor: the pair loop `/root/reference/pi_sph_fluid.c:317-337`
(the C code's linked-list walk has no analogous redistribution cost).
"""
import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


def dual(a):
    return jnp.concatenate([a, jnp.pad(a[:, 64:], ((0, 0), (0, 64)))],
                           axis=1)


def synthetic(K=100):
    key = jax.random.PRNGKey(0)
    for L in (400_000, 460_000, 500_000, 520_000, 524_288, 528_000,
              560_000, 660_000, 800_000, 1_100_000):
        n_src = int(L / 2.22)
        src = jax.random.normal(key, (n_src, 8), jnp.float32)
        idx = np.minimum((np.arange(L) * (n_src / L)).astype(np.int32)
                         + np.random.randint(0, 64, L).astype(np.int32),
                         n_src - 1)
        idx = jnp.asarray(idx)

        @jax.jit
        def loop(src):
            def body(c, _):
                return c + src[idx][0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        t = timed(loop, src)
        print(f"L={L:8d} n_src={n_src:7d}: {t / K * 1e3:7.3f} ms/gather",
              flush=True)


def _engine_trip(n):
    r = math.sqrt(6.35 / n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, band=0)
    pk = eng._initial_packed(fluid)
    _, ctx, ovf = jax.jit(eng._relayout)(pk)
    print(f"n={fluid.n} n_layout={eng.spec.n_layout} L={eng.spec.L} "
          f"n_src={eng.spec.n_src} ovf={int(ovf)}")
    return eng.spec, np.asarray(ctx.trip_src)


def _banded_fn(idx_np, n_layout, n_src, L, h, P, k, K):
    nb = n_src - n_layout - 1
    Lc = -(-L // P)
    tsr = np.pad(idx_np, (0, P * Lc - L),
                 constant_values=n_src - 1).reshape(P, Lc)
    is_b = tsr >= n_layout
    start = np.clip(np.where(is_b, 1 << 30, tsr).min(axis=1),
                    0, n_layout - h).astype(np.int32)
    local = np.where(is_b, tsr - n_layout + h, tsr - start[:, None])
    ovfb = int(((local < 0) | (local > h + nb)).sum())
    local_j = jnp.asarray(np.clip(local, 0, h + nb))
    start_j = jnp.asarray(start)

    @jax.jit
    def banded(src):
        tail = src[n_layout:]

        def body(c, _):
            outs = []
            for p in range(P):
                band = jax.lax.dynamic_slice(src, (start_j[p], 0),
                                             (h, src.shape[1]))
                outs.append(jnp.concatenate([band, tail], 0)[local_j[p]])
            g = dual(jnp.concatenate(outs, axis=0)[:L].T)
            return c + g[0, 0], None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    return banded, ovfb


def real(n, h, K=50):
    spec, idx_np = _engine_trip(n)
    n_layout, L, n_src = spec.n_layout, spec.L, spec.n_src
    idx = jnp.asarray(idx_np)
    for k in (4, 8):
        src = jax.random.normal(jax.random.PRNGKey(0), (n_src, k),
                                jnp.float32)

        @jax.jit
        def shipped(src):
            def body(c, _):
                return c + dual(src[idx].T)[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        t0 = timed(shipped, src) / K * 1e3
        P = int(np.ceil(n_layout / max(h - 16_384, 1)))
        banded, ovfb = _banded_fn(idx_np, n_layout, n_src, L, h, P, k, K)
        t1 = timed(banded, src) / K * 1e3
        print(f"k={k}: shipped={t0:7.3f} ms   banded h={h} P={P}: "
              f"{t1:7.3f} ms (x{t0 / t1:5.1f}) band_ovf={ovfb}",
              flush=True)


def hsweep(n, K=50):
    spec, idx_np = _engine_trip(n)
    n_layout, L, n_src = spec.n_layout, spec.L, spec.n_src
    for k in (4, 8):
        src = jax.random.normal(jax.random.PRNGKey(0), (n_src, k),
                                jnp.float32)
        for h in (49_152, 65_536, 98_304, 131_072):
            if h >= n_layout:
                continue
            P = int(np.ceil(n_layout / (h - 16_384)))
            banded, ovfb = _banded_fn(idx_np, n_layout, n_src, L, h, P,
                                      k, K)
            t1 = timed(banded, src) / K * 1e3
            print(f"k={k} h={h:7d} P={P:2d}: {t1:7.3f} ms ovf={ovfb}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--real", type=int, default=0, metavar="N")
    ap.add_argument("--hsweep", type=int, default=0, metavar="N")
    ap.add_argument("--band", type=int, default=120_000)
    args = ap.parse_args()
    if args.synthetic:
        synthetic()
    if args.real:
        real(args.real, args.band)
    if args.hsweep:
        hsweep(args.hsweep)
    if not (args.synthetic or args.real or args.hsweep):
        synthetic()


if __name__ == "__main__":
    main()

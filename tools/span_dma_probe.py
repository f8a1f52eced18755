#!/usr/bin/env python3
"""DMA-issue cost of the 3-span megakernel fetch (round 5, VERDICT r4 #4).

The §2e ceiling (40.7M ps/s with redistribution deleted) makes a 3-span
megakernel *arithmetically* interesting: per query block, fetch rows
r-1/r/r+1's column windows as 3 separate DMAs (plus one static boundary
span) instead of the one merged-triple DMA.  That quadruples DMAs per
tile (16 blocks x 4 = 64 in flight vs 16) — the round-2 probes put the
healthy budget at "tens per tile", so this probe measures the issue-rate
wall directly before any physics is built on it:

  kernel A: per block, ONE cap-lane DMA from an (8, 2L) HBM source +
            one pass of representative VPU math over the fetched lanes
            (the shipped shape);
  kernel B: per block, FOUR 128-lane DMAs from the same source (disjoint
            starts) + the same VPU math over the same 512 fetched lanes.

Equal bytes, equal lanes-of-math at cap=512 vs 4x128; the wall-clock
difference isolates (DMA count + per-DMA fixed cost).  If B >> A at
equal work, the 3-span form is dead at the issue rate and the megakernel
verdict closes without building it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/span_dma_probe.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(w_s, w_s_n, q_ref, src_hbm, out_ref, stage, sem, *, nqb, qb,
            spans, span_cap, n_tiles):
    i = pl.program_id(0)
    ib = i % 8

    def addr(b, s, nxt):
        # next-tile starts cross into the w_s_n block at ib == 7 — the
        # same here/ahead SMEM pair as the production kernels (a
        # start/wait descriptor mismatch unbalances DMA semaphores)
        if nxt:
            a = jnp.where(ib == 7, w_s_n[0, b, s],
                          w_s[jnp.minimum(ib + 1, 7), b, s])
        else:
            a = w_s[ib, b, s]
        return pl.multiple_of(a, LANE)

    def issue(slot, nxt, op):
        for b in range(nqb):
            for s in range(spans):
                cp = pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(addr(b, s, nxt), span_cap)],
                    stage.at[slot, b, s], sem.at[slot, b, s])
                (cp.start if op == "start" else cp.wait)()

    slot = i % 2

    @pl.when(i == 0)
    def _():
        issue(slot, False, "start")

    @pl.when(i + 1 < n_tiles)
    def _():
        issue((i + 1) % 2, True, "start")

    issue(slot, False, "wait")

    for b in range(nqb):
        qx = q_ref[b * qb:(b + 1) * qb, 0].reshape(qb, 1)
        qy = q_ref[b * qb:(b + 1) * qb, 1].reshape(qb, 1)
        acc = jnp.zeros((qb, LANE), jnp.float32)
        for s in range(spans):
            for c in range(span_cap // LANE):
                lo = c * LANE
                cx = stage[slot, b, s, 0, lo:lo + LANE].reshape(1, LANE)
                cy = stage[slot, b, s, 1, lo:lo + LANE].reshape(1, LANE)
                cm = stage[slot, b, s, 2, lo:lo + LANE].reshape(1, LANE)
                dx = qx - cx
                dy = qy - cy
                r = jnp.sqrt(dx * dx + dy * dy)
                t1 = jnp.maximum(1.0 - r, 0.0)
                t1sq = t1 * t1
                acc = acc + (cm * (t1sq * t1sq)) * (1.0 + r)
        out_ref[b * qb:(b + 1) * qb, 0:1] = jnp.sum(acc, axis=1,
                                                    keepdims=True)


def run_variant(n_layout, L, spans, span_cap, tq=256, qb=16, reps=20):
    nqb = tq // qb
    n_tiles = n_layout // tq
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (8, 2 * L), jnp.float32)
    q = jax.random.normal(key, (n_layout, 8), jnp.float32)
    # random 128-aligned span starts, padded (+1 tile) for the prefetch
    ws = jax.random.randint(key, (n_tiles + 8, nqb, spans), 0,
                            (2 * L - span_cap) // LANE, jnp.int32) * LANE

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, nqb, spans), lambda i: (i // 8, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, nqb, spans), lambda i: (i // 8 + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tq, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nqb, spans, 8, span_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nqb, spans)),
        ],
    )
    kernel = functools.partial(_kernel, nqb=nqb, qb=qb, spans=spans,
                               span_cap=span_cap, n_tiles=n_tiles)
    f = jax.jit(lambda ws, q, src: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((n_layout, 1), jnp.float32),
        grid_spec=grid_spec)(ws, ws, q, src))
    out = f(ws, q, src)
    jax.block_until_ready(out)
    assert bool(jnp.any(out != 0.0)), "kernel produced all zeros"
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(ws, q, src)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-layout", type=int, default=101632 // 256 * 256)
    ap.add_argument("--L", type=int, default=234368)
    args = ap.parse_args()
    nl = args.n_layout // 256 * 256
    # A: the shipped shape — 1 DMA/block, 512 lanes in one span
    a = run_variant(nl, args.L, spans=1, span_cap=512)
    # B: the 3-span+boundary shape — 4 DMAs/block, 128 lanes each
    b = run_variant(nl, args.L, spans=4, span_cap=128)
    # C: 2 spans x 256 (a middle point)
    c = run_variant(nl, args.L, spans=2, span_cap=256)
    print(f"A 1x512: {a:7.3f} ms   B 4x128: {b:7.3f} ms   C 2x256: {c:7.3f} ms")
    print(f"equal lanes+bytes; B/A = {b/a:4.2f}x, C/A = {c/a:4.2f}x "
          f"(pure DMA-count cost)")


if __name__ == "__main__":
    main()

"""Fetch-length distribution probe (CPU, no hardware needed).

Question: can the window kernels run cap=128 (ONE 128-lane chunk per
query block — half the VPU work of the shipped cap=256) if the block
geometry is tightened?  The two knobs:

* qb (queries per block): smaller blocks span fewer cells, so the window
  [c_first-1, c_last+1] holds fewer candidates;
* plane shift: the dual-plane encoding bounds DMA-alignment waste to
  < 64 lanes; a quad-plane (32-shift) encoding bounds it to < 32.

flen = alignment waste + window length must stay <= cap for every block
(overflow is counted, and elastic recovery would rebuild at cap=256, so
a rare overrun is safe — but the win only exists if the flagship scenes
fit essentially always).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/flen_probe.py
"""

import math
import sys

import numpy as np
import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.ops.pallas.triple import LANE


def flen_stats(eng, packed, shift):
    """Block fetch lengths from the engine's own relayout, for a given
    plane-shift granularity (64 = shipped dual plane, 32 = a hypothetical
    quad plane, 0 = exact-start fetch, i.e. flen == w_len).

    NOTE (bug history): ctx.w_start is the *aligned fetch* block_windows
    returns (always 0 mod 128, plane-encoded), so alignment waste cannot be
    re-derived from it — the first version of this probe did exactly that
    and under-measured flen by the waste.  ctx.flen is the ground truth for
    the shipped shift-64 encoding; other shifts are derived from
    waste = flen - w_len (in [0, 64)), re-reduced modulo the finer shift."""
    pk, ctx, overflow = jax.jit(eng._relayout)(packed)
    w_len = np.asarray(ctx.w_len).reshape(-1)
    flen64 = np.asarray(ctx.flen).reshape(-1)
    live = w_len > 0
    waste = flen64 - w_len
    if shift == 0:
        flen = w_len[live]
    else:
        flen = (w_len + waste % shift)[live]
    return flen, int(overflow)


def report(tag, flen, cap):
    q = np.percentile(flen, [50, 90, 99, 99.9])
    over = int(np.sum(flen > cap))
    print(f"{tag:42s} blocks={flen.size:7d} mean={flen.mean():6.1f} "
          f"p50={q[0]:5.0f} p90={q[1]:5.0f} p99={q[2]:5.0f} "
          f"p99.9={q[3]:5.0f} max={flen.max():4d} >cap{cap}: {over}")
    return over


def main():
    target_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    r = math.sqrt(6.35 / target_n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    print(f"pool n={fluid.n} r={r:.5f} rows={cfg.n_cell_rows} cols={cfg.n_cell_cols}")

    if steps:
        # evolve with the jnp oracle so the distribution reflects a live
        # (settling) state, not just the t=0 lattice
        from pi_sph_fluid_tpu.models.simulation import make_multi_step, prime
        sim = prime(fluid, boundary, bgrid, (0.0, -9.81), cfg)
        multi = jax.jit(make_multi_step(cfg, boundary, bgrid))
        g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32), (steps, 2))
        sim, st = multi(sim, g)
        fluid = sim.fluid
        print(f"evolved {steps} oracle steps: "
              f"max_speed={float(jnp.max(jnp.sqrt(fluid.u**2 + fluid.v**2))):.3f} "
              f"rho_err={float(st.max_rho_error_pct[-1]):.3f}%")

    squeeze = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    if squeeze:
        # synthetic stress: compress the fluid toward the floor by `squeeze`
        # (e.g. 0.04 = 4%) to emulate worst-case hydrostatic settling without
        # paying thousands of CPU oracle steps — raises bottom-cell occupancy
        y0 = float(jnp.min(fluid.y))
        fluid = fluid._replace(y=y0 + (fluid.y - y0) * (1.0 - squeeze))
        print(f"squeezed y by {squeeze:.1%}")

    for qb, seg_q in [(16, 2), (8, 2), (8, 1), (16, 1)]:
        eng = WindowEngine(cfg, boundary, bgrid, fluid.n,
                           tq=256, qb=qb, cap=256, seg_q=seg_q,
                           interpret=True)
        packed = eng._initial_packed(fluid)
        for shift in (64, 32, 0):
            flen, ov = flen_stats(eng, packed, shift)
            report(f"qb={qb} seg_q={seg_q} shift={shift}", flen,
                   128 if shift < 64 or qb == 8 else 256)


if __name__ == "__main__":
    main()

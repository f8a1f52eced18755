"""Fused per-query-block window kernels over the row-triple candidate layout.

Round-2 replacements for pair_kernels.py's whole-tile span kernels.  Each
TQ-query tile is processed as NQB static blocks of QB queries; every block
fetches exactly one contiguous candidate window from the (8, L) triple array
(ops/pallas/triple.py) with one DMA, and runs **fully static** pair math:
CAP/128 unrolled chunks with compile-time lane offsets.  On-chip probing
(tools/kern_probe.py) showed DMA issue/wait is nearly free while dynamic
fori_loop bounds + SMEM scalar reads + dynamic VMEM slices cost ~1.4 ms per
kernel pass at 100k particles — so the only dynamic quantity left in the
kernel is each block's DMA source offset.

No per-lane masks and no length bookkeeping: a lane outside the true window
is a real particle >= 1 whole cell away in x, an inert segment pad
(x = -1e6), or — for empty windows — stale stage data against inert pad
queries; in every case the Wendland support clamp t1 = max(1 - q/2, 0)
and the pad queries' own x = -1e6 annihilate the contribution.  Self-pairs
need no exclusion: the density self-term IS the reference's explicit
m*W(0) (`pi_sph_fluid.c:274-275`), and force self-terms vanish (dx=dy=0).

Physics matches the reference pass-for-pass:
  density + Tait EOS           `pi_sph_fluid.c:263-301`
  symmetric pressure + Macklin artificial pressure + Monaghan viscosity
                               `pi_sph_fluid.c:303-373`
with the boundary asymmetries (fluid-only pressure, fluid-rho viscosity
denominator, `pi_sph_fluid.c:350,362`) folded into the per-candidate
constants a_j / rho_eff_j / c_press_j (see triple.py row order).

The p_j/rho_j^2 factor is computed once per particle in the density kernel
(output cols 2-3) instead of once per pair lane — the round-1 kernels paid
a divide per lane for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SPHConfig
from ...core.pair_terms import artificial_pressure_ref_w
from .triple import TripleSpec

X, Y, U, V, M = range(5)
AJ, CP, RE = 5, 6, 7
NFIELDS = 8
LANE = 128

__all__ = ["density_window_call", "forces_window_call"]


def _aligned(start):
    """128-lane aligned DMA start; leading lanes are support-killed."""
    return pl.multiple_of((start // LANE) * LANE, LANE)


def _unnorm_wref(cfg: SPHConfig) -> float:
    """W(0.2H)/norm — the artificial-pressure reference, unnormalized (the
    normalisations cancel in the W/W_ref ratio)."""
    return float(artificial_pressure_ref_w(cfg)) / float(cfg.kernel_norm)


def _start_windows(spec, streams, get_start, slot):
    for b in range(spec.nqb):
        a = _aligned(get_start(b))
        for hbm, stage, sem in streams:
            def _go(a=a, b=b, hbm=hbm, stage=stage, sem=sem):
                pltpu.make_async_copy(
                    hbm.at[:, pl.ds(a, spec.cap)], stage.at[slot, b], sem.at[slot, b]
                ).start()

            _go()


def _wait_windows(spec, streams, get_start, slot):
    for b in range(spec.nqb):
        a = _aligned(get_start(b))
        for hbm, stage, sem in streams:
            def _wait(a=a, b=b, hbm=hbm, stage=stage, sem=sem):
                pltpu.make_async_copy(
                    hbm.at[:, pl.ds(a, spec.cap)], stage.at[slot, b], sem.at[slot, b]
                ).wait()

            _wait()


def _doublebuffer(spec, interpret, n_tiles, i, ib, streams,
                  w_start, w_start_n):
    """Cross-tile double buffering (same scheme as round 1): tile 0 fetches
    its own windows, every tile prefetches tile i+1's, all unconditional."""
    cur = lambda b: w_start[ib, b]
    nxt = lambda b: jnp.where(ib == 7, w_start_n[0, b],
                              w_start[jnp.minimum(ib + 1, 7), b])
    if interpret:
        _start_windows(spec, streams, cur, 0)
        return 0, cur

    slot = i % 2

    @pl.when(i == 0)
    def _():
        _start_windows(spec, streams, cur, slot)

    @pl.when(i + 1 < n_tiles)
    def _():
        _start_windows(spec, streams, nxt, (i + 1) % 2)

    return slot, cur


def _pad8(arr):
    n = arr.shape[0]
    pad = (-n) % 8 + 8
    return jnp.pad(arr, ((0, pad), (0, 0)))


def _span_specs(spec):
    here = pl.BlockSpec((8, spec.nqb), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    ahead = pl.BlockSpec((8, spec.nqb), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    return here, ahead


# ---------------------------------------------------------------------------
# density + EOS
# ---------------------------------------------------------------------------


def _density_kernel(
    w_start, w_start_n,                   # (8, nqb) SMEM blocks (+ next-block)
    q_ref,                                # (tq, 8) queries
    trip_hbm,                             # (8, L) candidates
    out_ref,                              # (tq, 1): rho
    stage, sem,
    *, cfg: SPHConfig, spec: TripleSpec, n_tiles: int, interpret: bool,
):
    i = pl.program_id(0)
    ib = i % 8
    qb = spec.qb
    streams = [(trip_hbm, stage, sem)]
    slot, cur = _doublebuffer(spec, interpret, n_tiles, i, ib,
                              streams, w_start, w_start_n)
    _wait_windows(spec, streams, cur, slot)

    norm = jnp.float32(cfg.kernel_norm)
    inv_h = jnp.float32(1.0) / jnp.float32(cfg.h)

    # hoist query columns once per tile ((tq,1) extractions are sublane
    # relayouts; per-block (qb,1) extractions cost the same EACH)
    qx_t = q_ref[:, X].reshape(spec.tq, 1)
    qy_t = q_ref[:, Y].reshape(spec.tq, 1)

    for b in range(spec.nqb):
        qlo = b * qb
        qx = qx_t[qlo:qlo + qb]          # free static sub-slices
        qy = qy_t[qlo:qlo + qb]
        acc = jnp.zeros((qb, LANE), jnp.float32)
        for c in range(spec.cap // LANE):
            lo = c * LANE
            cx = stage[slot, b, X, lo:lo + LANE].reshape(1, LANE)
            cy = stage[slot, b, Y, lo:lo + LANE].reshape(1, LANE)
            cm = stage[slot, b, M, lo:lo + LANE].reshape(1, LANE)
            dx = qx - cx
            dy = qy - cy
            q = jnp.sqrt(dx * dx + dy * dy) * inv_h
            t1 = jnp.maximum(1.0 - 0.5 * q, 0.0)   # support clamp == q<2 mask
            t1sq = t1 * t1
            acc = acc + (cm * (t1sq * t1sq)) * (1.0 + 2.0 * q)
        # self term included; Tait EOS + p/rho^2 run in XLA on the output
        out_ref[qlo:qlo + qb, 0:1] = norm * jnp.sum(acc, axis=1, keepdims=True)


def density_window_call(q_packed, trip, ctx_start, cfg: SPHConfig,
                        spec: TripleSpec, interpret: bool = False):
    n_tiles = spec.n_tiles
    ws = _pad8(ctx_start)
    here, ahead = _span_specs(spec)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            here, ahead,
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((spec.tq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, spec.nqb, NFIELDS, spec.cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, spec.nqb)),
        ],
    )
    kernel = functools.partial(_density_kernel, cfg=cfg, spec=spec,
                               n_tiles=n_tiles, interpret=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((spec.n_layout, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, ws, q_packed, trip)


# ---------------------------------------------------------------------------
# forces
# ---------------------------------------------------------------------------


def _forces_kernel(
    w_start, w_start_n,
    g_ref,                                # (8, 2) SMEM gravity
    q_ref,                                # (tq, 8)
    d_ref,                                # (tq, 4) rho, p, cpress, rhoeff
    geo_hbm,                              # (8, L) x, y, u, v, m~, -, -, -
    rp_hbm,                               # (4, L) cpress, rhoeff, 0, 0
    out_ref,                              # (tq, 2): du_dt, dv_dt
    stage, stage_rp, sem, sem_rp,
    *, cfg: SPHConfig, spec: TripleSpec, n_tiles: int, interpret: bool,
):
    gx = g_ref[0, 0]
    gy = g_ref[0, 1]
    i = pl.program_id(0)
    ib = i % 8
    qb = spec.qb
    streams = [(geo_hbm, stage, sem), (rp_hbm, stage_rp, sem_rp)]
    slot, cur = _doublebuffer(spec, interpret, n_tiles, i, ib,
                              streams, w_start, w_start_n)
    _wait_windows(spec, streams, cur, slot)

    h = jnp.float32(cfg.h)
    inv_h = jnp.float32(1.0) / h
    eps_h2 = jnp.float32(cfg.eps_visc) * h * h
    neg_alpha_c = jnp.float32(-cfg.alpha_visc) * jnp.float32(cfg.c)
    inv_wref = jnp.float32(1.0) / jnp.float32(_unnorm_wref(cfg))
    k_ap = jnp.float32(cfg.k_artificial_pressure)
    # a = g - sum coef*grad_W; grad coefficient = norm*(-5)*t1^3/h^2 factored
    # out of the lane loop: a = g + (5*norm/h^2) * sum_raw
    gfac = jnp.float32(5.0) * jnp.float32(cfg.kernel_norm) / (h * h)

    # hoist query columns once per tile; per-block views are free sub-slices
    qx_t = q_ref[:, X].reshape(spec.tq, 1)
    qy_t = q_ref[:, Y].reshape(spec.tq, 1)
    qu_t = q_ref[:, U].reshape(spec.tq, 1)
    qv_t = q_ref[:, V].reshape(spec.tq, 1)
    qm_t = q_ref[:, M].reshape(spec.tq, 1)
    q_rho_t = d_ref[:, 0].reshape(spec.tq, 1)
    q_press_t = d_ref[:, 2].reshape(spec.tq, 1)  # p/rho^2, precomputed

    for b in range(spec.nqb):
        qlo = b * qb
        qx = qx_t[qlo:qlo + qb]
        qy = qy_t[qlo:qlo + qb]
        qu = qu_t[qlo:qlo + qb]
        qv = qv_t[qlo:qlo + qb]
        qm = qm_t[qlo:qlo + qb]
        q_rho = q_rho_t[qlo:qlo + qb]
        q_press = q_press_t[qlo:qlo + qb]

        ax = jnp.zeros((qb, LANE), jnp.float32)
        ay = jnp.zeros((qb, LANE), jnp.float32)
        for c in range(spec.cap // LANE):
            lo = c * LANE
            cx = stage[slot, b, X, lo:lo + LANE].reshape(1, LANE)
            cy = stage[slot, b, Y, lo:lo + LANE].reshape(1, LANE)
            cu = stage[slot, b, U, lo:lo + LANE].reshape(1, LANE)
            cv = stage[slot, b, V, lo:lo + LANE].reshape(1, LANE)
            cm = stage[slot, b, M, lo:lo + LANE].reshape(1, LANE)
            ccp = stage_rp[slot, b, 0, lo:lo + LANE].reshape(1, LANE)
            cre = stage_rp[slot, b, 1, lo:lo + LANE].reshape(1, LANE)

            dx = qx - cx
            dy = qy - cy
            du = qu - cu
            dv = qv - cv
            r2 = dx * dx + dy * dy
            q = jnp.sqrt(r2) * inv_h
            t1 = jnp.maximum(1.0 - 0.5 * q, 0.0)
            t1sq = t1 * t1
            t13 = t1sq * t1
            w_un = (t1sq * t1sq) * (1.0 + 2.0 * q)
            # symmetric pressure (`pi_sph_fluid.c:321`); c_press is 0 on
            # boundary lanes -> fluid-only term (`pi_sph_fluid.c:350`)
            press = q_press + ccp
            # Macklin artificial pressure (`pi_sph_fluid.c:325`)
            ap = w_un * inv_wref
            ap2 = ap * ap
            artif = k_ap * (ap2 * ap2)
            # Monaghan viscosity (`pi_sph_fluid.c:328-334`): pair-mean
            # density denominator for fluid (rho_eff_j = rho_j/2 > 0),
            # fluid-only rho for boundary (rho_eff_j = 0,
            # `pi_sph_fluid.c:362`)
            xy_uv = dx * du + dy * dv
            mu = (h * xy_uv) / (r2 + eps_h2)
            denom = jnp.where(cre > 0.0, 0.5 * q_rho + cre, q_rho)
            visc = jnp.where((xy_uv < 0.0) & (denom > 0.0),
                             neg_alpha_c * mu / denom, 0.0)
            coef = cm * (press + artif + visc) * t13
            ax = ax + coef * dx
            ay = ay + coef * dy

        sx = jnp.sum(ax, axis=1, keepdims=True)
        sy = jnp.sum(ay, axis=1, keepdims=True)
        q_valid = qm > 0.0
        out_ref[qlo:qlo + qb, 0:1] = jnp.where(q_valid, gx + gfac * sx, 0.0)
        out_ref[qlo:qlo + qb, 1:2] = jnp.where(q_valid, gy + gfac * sy, 0.0)


def forces_window_call(q_packed, dens_out, geo, rp, ctx_start, g,
                       cfg: SPHConfig, spec: TripleSpec, interpret: bool = False):
    n_tiles = spec.n_tiles
    ws = _pad8(ctx_start)
    here, ahead = _span_specs(spec)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            here, ahead,
            # gravity as (8, 2) SMEM: a (1, 2) block intermittently read
            # garbage on v5e (round-1 finding)
            pl.BlockSpec((8, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tq, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((spec.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, spec.nqb, NFIELDS, spec.cap), jnp.float32),
            pltpu.VMEM((2, spec.nqb, 4, spec.cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, spec.nqb)),
            pltpu.SemaphoreType.DMA((2, spec.nqb)),
        ],
    )
    kernel = functools.partial(_forces_kernel, cfg=cfg, spec=spec,
                               n_tiles=n_tiles, interpret=interpret)
    g2 = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (8, 2))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((spec.n_layout, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, ws, g2, q_packed, dens_out, geo, rp)

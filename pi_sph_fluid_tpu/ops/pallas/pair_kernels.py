"""Fused Pallas TPU kernels for the WCSPH pair passes.

These replace the jnp reference passes (ops/density.py, ops/forces.py) — the
TPU equivalent of the reference's OpenMP pair loops (`pi_sph_fluid.c:263-373`)
— with the memory system treated explicitly:

* particle state is **grid-sorted** and packed two ways: ``(n_pad, 8)`` for
  query tiles (fields on lanes, queries on sublanes -> zero-relayout
  ``(tq, 1)`` field slices) and ``(8, n_pad + cap)`` for candidates (fields
  on sublanes -> one strided DMA fetches a whole span of all fields as
  ``(8, cap)``, and ``(1, chunk)`` field rows broadcast against queries);
* each grid instance owns TQ consecutive layout slots; its candidates are
  exactly 3 contiguous spans (ops/pallas/spans.py) DMA'd HBM -> VMEM with
  cross-tile double buffering (every tile prefetches the next tile's spans),
  DMA starts 128-lane aligned (Mosaic tiling) with leading lanes masked;
* pair math runs on ``(tq, 128)`` VPU chunks inside a fori_loop bounded by
  the *actual* span length, so empty spans (most boundary spans, unused
  span slots) cost nothing and short spans cost proportionally — the work
  per tile tracks the true candidate count, not the static capacity;
* masks (lane in span, r < 2H, candidate != self) make the result exactly
  equal to the jnp oracle — tests assert it;
* density + Tait EOS fuse into one kernel; the force kernel additionally
  streams the freshly-computed ``(2, ...)`` rho/p candidate rows.

Field order in packed arrays: x, y, u, v, m, rho, p, (pad).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SPHConfig
from ...core.pair_terms import artificial_pressure_ref_w

X, Y, U, V, M, RHO, P = range(7)
NFIELDS = 8
LANE = 128

__all__ = ["PallasDims", "pack_queries", "pack_candidates", "density_eos_call", "forces_call"]


class PallasDims(NamedTuple):
    """Static kernel shape parameters."""

    tq: int = 128        # queries per tile (also the layout row alignment)
    nr: int = 3          # fluid span slots (row layout: exactly 3)
    cap: int = 512       # fluid candidates per span (incl. <=127 alignment lanes)
    nrb: int = 3         # boundary span slots
    capb: int = 256      # boundary candidates per span (incl. alignment lanes)
    row_slack: float = 1.35  # per-cell compression slack for rowcap (see spans.py)
    qb: int = 0          # query-block window size; 0 = whole-span (fastest measured:
                         # Mosaic's per-block scalar/slice overhead outweighs the ~2x
                         # lane reduction at qb=8..64 on v5e — kept as a tuning avenue)
    interpret: bool = False


def pack_queries(fields) -> jnp.ndarray:
    """7 x (n,) float32 -> (n, 8) query-major packed array."""
    n = fields[0].shape[0]
    cols = list(fields) + [jnp.zeros((n,), jnp.float32)]
    return jnp.stack(cols, axis=1)


def pack_candidates(fields, cap: int) -> jnp.ndarray:
    """7 x (n,) float32 -> (8, n + cap) candidate-major packed array.

    The +cap zero tail keeps fixed-size span DMAs in bounds without
    clamping span starts (clamping would break global-index self-exclusion).
    """
    n = fields[0].shape[0]
    rows = list(fields) + [jnp.zeros((n,), jnp.float32)]
    packed = jnp.stack(rows, axis=0)
    return jnp.pad(packed, ((0, 0), (0, cap)))


def _pad8(arr):
    """Pad a (n_tiles, nr) span array to a multiple of 8 rows plus one extra
    8-row group, so every tile's (16, nr) SMEM block window (own row +
    next-tile prefetch row) stays in bounds."""
    n = arr.shape[0]
    pad = (-n) % 8 + 8
    return jnp.pad(arr, ((0, pad), (0, 0)))


def _aligned_start(start):
    """TPU memrefs are lane-tiled: DMA slice offsets must be 128-divisible.
    Align the span start down and return (aligned, extra); the first
    ``extra`` lanes of the fetched window are masked out and caps are sized
    with 128 slack (see spans.py overflow accounting)."""
    a = pl.multiple_of((start // LANE) * LANE, LANE)
    return a, start - a


def _pair_w(dx, dy, cfg: SPHConfig):
    """Wendland C2 value + gradient coefficient on a pair chunk.

    grad_i W = gcoef * (dx, dy); both masked outside the support (see
    core/kernels.py for the derivation and the r=0 analysis)."""
    norm = jnp.float32(cfg.kernel_norm)
    h = jnp.float32(cfg.h)
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2)
    q = r / h
    inside = q < 2.0
    t1 = 1.0 - 0.5 * q
    t1sq = t1 * t1
    w = jnp.where(inside, norm * t1sq * t1sq * (1.0 + 2.0 * q), 0.0)
    gcoef = jnp.where(inside, norm * (-5.0) * (t1sq * t1) / (h * h), 0.0)
    return r, w, gcoef


# ---------------------------------------------------------------------------
# density + EOS kernel
# ---------------------------------------------------------------------------


def _density_kernel(
    # per-tile span scalars as (8, nr) SMEM blocks; the *_n refs are the
    # same arrays mapped one block ahead so the prefetch of tile i+1's spans
    # can cross the 8-row block boundary (row ib+1, or row 0 of next block)
    f_start, f_len, b_start, b_len,
    f_start_n, f_len_n, b_start_n, b_len_n,
    # inputs
    q_ref,            # (tq, 8) query tile
    fc_hbm,           # (8, n_pad + cap) fluid candidates
    bc_hbm,           # (8, nb_pad + capb) boundary candidates
    # output
    out_ref,          # (tq, 2): rho, p
    # scratch (leading 2: double buffer across grid steps)
    cf, cb, sem_f, sem_b,
    *, cfg: SPHConfig, dims: PallasDims, n_tiles: int,
):
    i = pl.program_id(0)
    ib = i % 8  # this tile's row within its span block
    tq, nr, cap, nrb, capb = dims.tq, dims.nr, dims.cap, dims.nrb, dims.capb
    support = jnp.float32(cfg.support_radius)

    def next_val(cur, ahead, s):
        # tile i+1's scalar: row ib+1 of this block, or row 0 of the next
        return jnp.where(ib == 7, ahead[0, s], cur[jnp.minimum(ib + 1, 7), s])

    def start_spans(get_f, get_b, slot):
        for s in range(nr):
            st, ln = get_f(s)
            a, _ = _aligned_start(st)

            def _go_f(a=a, s=s):
                pltpu.make_async_copy(
                    fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
                ).start()

            _go_f()
        for s in range(nrb):
            st, ln = get_b(s)
            a, _ = _aligned_start(st)

            def _go_b(a=a, s=s):
                pltpu.make_async_copy(
                    bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
                ).start()

            _go_b()

    cur_f = lambda s: (f_start[ib, s], f_len[ib, s])
    cur_b = lambda s: (b_start[ib, s], b_len[ib, s])
    nxt_f = lambda s: (next_val(f_start, f_start_n, s), next_val(f_len, f_len_n, s))
    nxt_b = lambda s: (next_val(b_start, b_start_n, s), next_val(b_len, b_len_n, s))

    if dims.interpret:
        slot = 0
        start_spans(cur_f, cur_b, 0)
    else:
        # double buffer: tile 0 fetches its own spans; every tile prefetches
        # the next tile's spans so compute never stalls on DMA issue latency
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            start_spans(cur_f, cur_b, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_spans(nxt_f, nxt_b, nxt)

    qx = q_ref[:, X].reshape(tq, 1)
    qy = q_ref[:, Y].reshape(tq, 1)
    qm = q_ref[:, M].reshape(tq, 1)
    q_global = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)

    rho = qm * jnp.float32(cfg.kernel_norm)  # self term (`pi_sph_fluid.c:274-275`)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    for s in range(nr):
        a, extra = _aligned_start(f_start[ib, s])
        length = f_len[ib, s]

        def _wait_f(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
            ).wait()

        _wait_f()
        total = jnp.minimum(extra + length, cap)
        n_chunks = (total + LANE - 1) // LANE

        def chunk(c, acc):
            off = pl.multiple_of(c * LANE, LANE)
            cx = cf[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cf[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cm = cf[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
            dx = qx - cx
            dy = qy - cy
            r, w, _ = _pair_w(dx, dy, cfg)
            lane_idx = off + lane
            mask = (
                (lane_idx >= extra) & (lane_idx < total)
                & (r < support) & (a + lane_idx != q_global)
            )
            return acc + jnp.sum(jnp.where(mask, cm * w, 0.0), axis=1, keepdims=True)

        rho = jax.lax.fori_loop(0, n_chunks, chunk, rho)

    for s in range(nrb):
        a, extra = _aligned_start(b_start[ib, s])
        length = b_len[ib, s]

        def _wait_b(a=a, s=s):
            pltpu.make_async_copy(
                bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
            ).wait()

        _wait_b()
        total = jnp.minimum(extra + length, capb)
        n_chunks = (total + LANE - 1) // LANE

        def chunk_b(c, acc):
            off = pl.multiple_of(c * LANE, LANE)
            cx = cb[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cb[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cm = cb[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
            dx = qx - cx
            dy = qy - cy
            r, w, _ = _pair_w(dx, dy, cfg)
            lane_idx = off + lane
            mask = (lane_idx >= extra) & (lane_idx < total) & (r < support)
            return acc + jnp.sum(jnp.where(mask, cm * w, 0.0), axis=1, keepdims=True)

        rho = jax.lax.fori_loop(0, n_chunks, chunk_b, rho)

    # Tait EOS with negative clamp (`pi_sph_fluid.c:294-301`), fused
    ratio = rho / jnp.float32(cfg.rho_0)
    r2 = ratio * ratio
    r4 = r2 * r2
    p = jnp.maximum(jnp.float32(cfg.tait_b) * (r4 * r2 * ratio - 1.0), 0.0)

    out_ref[:, 0:1] = rho
    out_ref[:, 1:2] = p


# ---------------------------------------------------------------------------
# query-block windowed kernels (PallasDims.qb > 0): each block of qb queries
# computes only its own [qc0-1, qc1+1] column window of each span — ~2x fewer
# pair lanes at tq=128, but measured SLOWER on v5e (35 vs 10 ms/step at 100k)
# because the per-block dynamic slices, SMEM scalar reads and loop control
# cost more than the saved lanes.  Correctness-validated (interpret mode
# matches the oracle); kept as a tuning avenue for hardware where the
# tradeoff differs.
# ---------------------------------------------------------------------------


def _density_kernel_qb(
    f_start, f_len, b_start, b_len,
    f_start_n, f_len_n, b_start_n, b_len_n,
    w_lo, w_hi,       # (8, 3*nqb) SMEM: per-qb fluid windows (abs layout coords)
    q_ref, fc_hbm, bc_hbm,
    out_ref,
    cf, cb, sem_f, sem_b,
    *, cfg: SPHConfig, dims: PallasDims, n_tiles: int,
):
    i = pl.program_id(0)
    ib = i % 8
    tq, nr, cap, nrb, capb = dims.tq, dims.nr, dims.cap, dims.nrb, dims.capb
    qb = dims.qb
    nqb = tq // qb
    support = jnp.float32(cfg.support_radius)

    def next_val(cur, ahead, s):
        return jnp.where(ib == 7, ahead[0, s], cur[jnp.minimum(ib + 1, 7), s])

    def start_spans(get_f, get_b, slot):
        for s in range(nr):
            st, ln = get_f(s)
            a, _ = _aligned_start(st)

            def _go_f(a=a, s=s):
                pltpu.make_async_copy(
                    fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
                ).start()

            _go_f()
        for s in range(nrb):
            st, ln = get_b(s)
            a, _ = _aligned_start(st)

            def _go_b(a=a, s=s):
                pltpu.make_async_copy(
                    bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
                ).start()

            _go_b()

    cur_f = lambda s: (f_start[ib, s], f_len[ib, s])
    cur_b = lambda s: (b_start[ib, s], b_len[ib, s])
    nxt_f = lambda s: (next_val(f_start, f_start_n, s), next_val(f_len, f_len_n, s))
    nxt_b = lambda s: (next_val(b_start, b_start_n, s), next_val(b_len, b_len_n, s))

    if dims.interpret:
        slot = 0
        start_spans(cur_f, cur_b, 0)
    else:
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            start_spans(cur_f, cur_b, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_spans(nxt_f, nxt_b, nxt)

    # wait all fluid + boundary spans upfront (prefetched last iteration)
    for s in range(nr):
        a, _ = _aligned_start(f_start[ib, s])

        def _wait_f(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
            ).wait()

        _wait_f()
    for s in range(nrb):
        a, _ = _aligned_start(b_start[ib, s])

        def _wait_b(a=a, s=s):
            pltpu.make_async_copy(
                bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
            ).wait()

        _wait_b()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    norm = jnp.float32(cfg.kernel_norm)

    # boundary contribution for the whole tile (boundary spans are almost
    # always empty; whole-span chunking is already proportional)
    qx_t = q_ref[:, X].reshape(tq, 1)
    qy_t = q_ref[:, Y].reshape(tq, 1)
    rho_b = jnp.zeros((tq, 1), jnp.float32)
    for s in range(nrb):
        a, extra = _aligned_start(b_start[ib, s])
        length = b_len[ib, s]
        total = jnp.minimum(extra + length, capb)
        n_chunks = (total + LANE - 1) // LANE

        def chunk_b(c, acc):
            off = pl.multiple_of(c * LANE, LANE)
            cx = cb[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cb[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cm = cb[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
            dx = qx_t - cx
            dy = qy_t - cy
            r, w, _ = _pair_w(dx, dy, cfg)
            lane_idx = off + lane
            mask = (lane_idx >= extra) & (lane_idx < total) & (r < support)
            return acc + jnp.sum(jnp.where(mask, cm * w, 0.0), axis=1, keepdims=True)

        rho_b = jax.lax.fori_loop(0, n_chunks, chunk_b, rho_b)

    # stage the boundary sums through out_ref: Mosaic cannot lower
    # dynamic_slice on values, but refs slice dynamically just fine
    out_ref[:, 0:1] = rho_b

    # fluid contribution per query block, windowed
    def qb_body(k, _):
        qoff = pl.multiple_of(k * qb, qb)
        qx = q_ref[pl.ds(qoff, qb), X].reshape(qb, 1)
        qy = q_ref[pl.ds(qoff, qb), Y].reshape(qb, 1)
        qm = q_ref[pl.ds(qoff, qb), M].reshape(qb, 1)
        q_global = i * tq + qoff + jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
        rho = qm * norm  # self term

        for s in range(nr):
            a, _ = _aligned_start(f_start[ib, s])
            rel_lo = jnp.maximum(w_lo[ib, s * nqb + k] - a, 0)
            rel_hi = jnp.minimum(w_hi[ib, s * nqb + k] - a, cap)
            cstart = pl.multiple_of((rel_lo // LANE) * LANE, LANE)
            n_ch = jnp.maximum((rel_hi - cstart + LANE - 1) // LANE, 0)

            def chunk(c, acc, s=s, a=a, rel_lo=rel_lo, rel_hi=rel_hi, cstart=cstart,
                      qx=qx, qy=qy, q_global=q_global):
                off = pl.multiple_of(cstart + c * LANE, LANE)
                cx = cf[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
                cy = cf[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
                cm = cf[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
                dx = qx - cx
                dy = qy - cy
                r, w, _ = _pair_w(dx, dy, cfg)
                lane_idx = off + lane
                mask = (
                    (lane_idx >= rel_lo) & (lane_idx < rel_hi)
                    & (r < support) & (a + lane_idx != q_global)
                )
                return acc + jnp.sum(jnp.where(mask, cm * w, 0.0), axis=1, keepdims=True)

            rho = jax.lax.fori_loop(0, n_ch, chunk, rho)

        rho = rho + out_ref[pl.ds(qoff, qb), 0].reshape(qb, 1)
        ratio = rho / jnp.float32(cfg.rho_0)
        r2 = ratio * ratio
        r4 = r2 * r2
        pres = jnp.maximum(jnp.float32(cfg.tait_b) * (r4 * r2 * ratio - 1.0), 0.0)
        out_ref[pl.ds(qoff, qb), 0:1] = rho
        out_ref[pl.ds(qoff, qb), 1:2] = pres
        return 0

    jax.lax.fori_loop(0, nqb, qb_body, 0)


def _forces_kernel_qb(
    f_start, f_len, b_start, b_len,
    f_start_n, f_len_n, b_start_n, b_len_n,
    w_lo, w_hi, g_ref,
    q_ref, qrp_ref, fc_hbm, rp_hbm, bc_hbm,
    out_ref,
    cf, crp, cb, sem_f, sem_rp, sem_b,
    *, cfg: SPHConfig, dims: PallasDims, n_tiles: int,
):
    gx = g_ref[0, 0]
    gy = g_ref[0, 1]
    i = pl.program_id(0)
    ib = i % 8
    tq, nr, cap, nrb, capb = dims.tq, dims.nr, dims.cap, dims.nrb, dims.capb
    qb = dims.qb
    nqb = tq // qb
    support = jnp.float32(cfg.support_radius)

    def next_val(cur, ahead, s):
        return jnp.where(ib == 7, ahead[0, s], cur[jnp.minimum(ib + 1, 7), s])

    def start_spans(get_f, get_b, slot):
        for s in range(nr):
            st, ln = get_f(s)
            a, _ = _aligned_start(st)

            def _go_f(a=a, s=s):
                pltpu.make_async_copy(
                    fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
                ).start()
                pltpu.make_async_copy(
                    rp_hbm.at[:, pl.ds(a, cap)], crp.at[slot, s], sem_rp.at[slot, s]
                ).start()

            _go_f()
        for s in range(nrb):
            st, ln = get_b(s)
            a, _ = _aligned_start(st)

            def _go_b(a=a, s=s):
                pltpu.make_async_copy(
                    bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
                ).start()

            _go_b()

    cur_f = lambda s: (f_start[ib, s], f_len[ib, s])
    cur_b = lambda s: (b_start[ib, s], b_len[ib, s])
    nxt_f = lambda s: (next_val(f_start, f_start_n, s), next_val(f_len, f_len_n, s))
    nxt_b = lambda s: (next_val(b_start, b_start_n, s), next_val(b_len, b_len_n, s))

    if dims.interpret:
        slot = 0
        start_spans(cur_f, cur_b, 0)
    else:
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            start_spans(cur_f, cur_b, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_spans(nxt_f, nxt_b, nxt)

    for s in range(nr):
        a, _ = _aligned_start(f_start[ib, s])

        def _wait_f(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
            ).wait()
            pltpu.make_async_copy(
                rp_hbm.at[:, pl.ds(a, cap)], crp.at[slot, s], sem_rp.at[slot, s]
            ).wait()

        _wait_f()
    for s in range(nrb):
        a, _ = _aligned_start(b_start[ib, s])

        def _wait_b(a=a, s=s):
            pltpu.make_async_copy(
                bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
            ).wait()

        _wait_b()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    h = jnp.float32(cfg.h)
    c_sound = jnp.float32(cfg.c)
    alpha = jnp.float32(cfg.alpha_visc)
    eps_h2 = jnp.float32(cfg.eps_visc) * h * h
    inv_w_ref = jnp.float32(1.0) / jnp.float32(artificial_pressure_ref_w(cfg))
    k_ap = jnp.float32(cfg.k_artificial_pressure)

    # boundary sums for the whole tile
    qx_t = q_ref[:, X].reshape(tq, 1)
    qy_t = q_ref[:, Y].reshape(tq, 1)
    qu_t = q_ref[:, U].reshape(tq, 1)
    qv_t = q_ref[:, V].reshape(tq, 1)
    q_rho_t = qrp_ref[:, 0].reshape(tq, 1)
    q_p_t = qrp_ref[:, 1].reshape(tq, 1)
    q_press_t = jnp.where(q_rho_t > 0.0, q_p_t / (q_rho_t * q_rho_t), 0.0)
    sum_bx = jnp.zeros((tq, 1), jnp.float32)
    sum_by = jnp.zeros((tq, 1), jnp.float32)
    for s in range(nrb):
        a, extra = _aligned_start(b_start[ib, s])
        length = b_len[ib, s]
        total = jnp.minimum(extra + length, capb)
        n_chunks = (total + LANE - 1) // LANE

        def chunk_b(c, acc, s=s, a=a, extra=extra, total=total):
            sx, sy = acc
            off = pl.multiple_of(c * LANE, LANE)
            cx = cb[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cb[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cu = cb[slot, s, U, pl.ds(off, LANE)].reshape(1, LANE)
            cv = cb[slot, s, V, pl.ds(off, LANE)].reshape(1, LANE)
            cpsi = cb[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
            dx = qx_t - cx
            dy = qy_t - cy
            du = qu_t - cu
            dv = qv_t - cv
            r, w, gcoef = _pair_w(dx, dy, cfg)
            ap_ratio = w * inv_w_ref
            ap2 = ap_ratio * ap_ratio
            artif = k_ap * (ap2 * ap2)
            xy_uv = dx * du + dy * dv
            xy_xy = dx * dx + dy * dy
            mu = h * xy_uv / (xy_xy + eps_h2)
            visc = jnp.where((xy_uv < 0.0) & (q_rho_t > 0.0),
                             -alpha * c_sound * mu / q_rho_t, 0.0)
            term = q_press_t + artif + visc
            lane_idx = off + lane
            mask = (lane_idx >= extra) & (lane_idx < total) & (r < support)
            coef = jnp.where(mask, cpsi * term, 0.0)
            return (sx + jnp.sum(coef * (gcoef * dx), axis=1, keepdims=True),
                    sy + jnp.sum(coef * (gcoef * dy), axis=1, keepdims=True))

        sum_bx, sum_by = jax.lax.fori_loop(0, n_chunks, chunk_b, (sum_bx, sum_by))

    # stage the boundary sums through out_ref (no dynamic_slice on values
    # in Mosaic); each qb overwrites its rows after reading them back
    out_ref[:, 0:1] = sum_bx
    out_ref[:, 1:2] = sum_by

    # fluid sums per query block, windowed
    def qb_body(k, _):
        qoff = pl.multiple_of(k * qb, qb)
        qx = q_ref[pl.ds(qoff, qb), X].reshape(qb, 1)
        qy = q_ref[pl.ds(qoff, qb), Y].reshape(qb, 1)
        qu = q_ref[pl.ds(qoff, qb), U].reshape(qb, 1)
        qv = q_ref[pl.ds(qoff, qb), V].reshape(qb, 1)
        qm = q_ref[pl.ds(qoff, qb), M].reshape(qb, 1)
        q_rho = qrp_ref[pl.ds(qoff, qb), 0].reshape(qb, 1)
        q_p = qrp_ref[pl.ds(qoff, qb), 1].reshape(qb, 1)
        q_press = jnp.where(q_rho > 0.0, q_p / (q_rho * q_rho), 0.0)
        q_global = i * tq + qoff + jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)

        sum_x = jnp.zeros((qb, 1), jnp.float32)
        sum_y = jnp.zeros((qb, 1), jnp.float32)
        for s in range(nr):
            a, _ = _aligned_start(f_start[ib, s])
            rel_lo = jnp.maximum(w_lo[ib, s * nqb + k] - a, 0)
            rel_hi = jnp.minimum(w_hi[ib, s * nqb + k] - a, cap)
            cstart = pl.multiple_of((rel_lo // LANE) * LANE, LANE)
            n_ch = jnp.maximum((rel_hi - cstart + LANE - 1) // LANE, 0)

            def chunk(c, acc, s=s, a=a, rel_lo=rel_lo, rel_hi=rel_hi, cstart=cstart,
                      qx=qx, qy=qy, qu=qu, qv=qv, q_rho=q_rho, q_press=q_press,
                      q_global=q_global):
                sx, sy = acc
                off = pl.multiple_of(cstart + c * LANE, LANE)
                cx = cf[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
                cy = cf[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
                cu = cf[slot, s, U, pl.ds(off, LANE)].reshape(1, LANE)
                cv = cf[slot, s, V, pl.ds(off, LANE)].reshape(1, LANE)
                cm = cf[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
                c_rho = crp[slot, s, 0, pl.ds(off, LANE)].reshape(1, LANE)
                c_p = crp[slot, s, 1, pl.ds(off, LANE)].reshape(1, LANE)
                dx = qx - cx
                dy = qy - cy
                du = qu - cu
                dv = qv - cv
                r, w, gcoef = _pair_w(dx, dy, cfg)
                pressure = q_press + jnp.where(c_rho > 0.0, c_p / (c_rho * c_rho), 0.0)
                ap_ratio = w * inv_w_ref
                ap2 = ap_ratio * ap_ratio
                artif = k_ap * (ap2 * ap2)
                xy_uv = dx * du + dy * dv
                xy_xy = dx * dx + dy * dy
                mu = h * xy_uv / (xy_xy + eps_h2)
                mean_rho = (q_rho + c_rho) * 0.5
                visc = jnp.where((xy_uv < 0.0) & (mean_rho > 0.0),
                                 -alpha * c_sound * mu / mean_rho, 0.0)
                term = pressure + artif + visc
                lane_idx = off + lane
                mask = (
                    (lane_idx >= rel_lo) & (lane_idx < rel_hi)
                    & (r < support) & (a + lane_idx != q_global)
                )
                coef = jnp.where(mask, cm * term, 0.0)
                return (sx + jnp.sum(coef * (gcoef * dx), axis=1, keepdims=True),
                        sy + jnp.sum(coef * (gcoef * dy), axis=1, keepdims=True))

            sum_x, sum_y = jax.lax.fori_loop(0, n_ch, chunk, (sum_x, sum_y))

        sum_x = sum_x + out_ref[pl.ds(qoff, qb), 0].reshape(qb, 1)
        sum_y = sum_y + out_ref[pl.ds(qoff, qb), 1].reshape(qb, 1)
        q_valid = qm > 0.0
        out_ref[pl.ds(qoff, qb), 0:1] = jnp.where(q_valid, gx - sum_x, 0.0)
        out_ref[pl.ds(qoff, qb), 1:2] = jnp.where(q_valid, gy - sum_y, 0.0)
        return 0

    jax.lax.fori_loop(0, nqb, qb_body, 0)


def density_eos_call(
    q_packed,        # (n_pad, 8)
    fc_packed,       # (8, n_pad + cap)
    bc_packed,       # (8, nb_pad + capb)
    f_spans, b_spans,  # TileSpans
    cfg: SPHConfig,
    dims: PallasDims,
    windows=None,    # (w_lo, w_hi) per-qb fluid windows; enables the qb path
):
    n_pad = q_packed.shape[0]
    n_tiles = n_pad // dims.tq
    # spans ride as (8, nr) SMEM blocks (one row per tile): full scalar
    # prefetch would put all n_tiles*nr ints in the 1MB SMEM at once, which
    # overflows beyond ~500k particles
    f_span_spec = pl.BlockSpec((8, dims.nr), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    b_span_spec = pl.BlockSpec((8, dims.nrb), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    f_span_ahead = pl.BlockSpec((8, dims.nr), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    b_span_ahead = pl.BlockSpec((8, dims.nrb), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            f_span_spec, f_span_spec, b_span_spec, b_span_spec,
            f_span_ahead, f_span_ahead, b_span_ahead, b_span_ahead,
            pl.BlockSpec((dims.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((dims.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, dims.nr, NFIELDS, dims.cap), jnp.float32),
            pltpu.VMEM((2, dims.nrb, NFIELDS, dims.capb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, dims.nr)),
            pltpu.SemaphoreType.DMA((2, dims.nrb)),
        ],
    )
    kernel = functools.partial(_density_kernel, cfg=cfg, dims=dims, n_tiles=n_tiles)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=dims.interpret,
    )
    fs, fl = _pad8(f_spans.start), _pad8(f_spans.length)
    bs, bl = _pad8(b_spans.start), _pad8(b_spans.length)
    if windows is None:
        return call(fs, fl, bs, bl, fs, fl, bs, bl, q_packed, fc_packed, bc_packed)
    nqb3 = 3 * (dims.tq // dims.qb)
    win_spec = pl.BlockSpec((8, nqb3), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    grid_spec_qb = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=list(grid_spec.in_specs[:8]) + [win_spec, win_spec]
        + list(grid_spec.in_specs[8:]),
        out_specs=grid_spec.out_specs,
        scratch_shapes=grid_spec.scratch_shapes,
    )
    kernel_qb = functools.partial(_density_kernel_qb, cfg=cfg, dims=dims, n_tiles=n_tiles)
    call_qb = pl.pallas_call(
        kernel_qb,
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        grid_spec=grid_spec_qb,
        interpret=dims.interpret,
    )
    return call_qb(fs, fl, bs, bl, fs, fl, bs, bl,
                   _pad8(windows[0]), _pad8(windows[1]),
                   q_packed, fc_packed, bc_packed)


# ---------------------------------------------------------------------------
# force kernel
# ---------------------------------------------------------------------------


def _forces_kernel(
    f_start, f_len, b_start, b_len,
    f_start_n, f_len_n, b_start_n, b_len_n,
    g_ref,
    q_ref,            # (tq, 8)
    qrp_ref,          # (tq, 2) fresh rho/p of queries
    fc_hbm,           # (8, n_pad + cap) positions/velocities/masses
    rp_hbm,           # (2, n_pad + cap) fresh rho/p candidate rows
    bc_hbm,           # (8, nb_pad + capb)
    out_ref,          # (tq, 2): du_dt, dv_dt
    cf, crp, cb, sem_f, sem_rp, sem_b,
    *, cfg: SPHConfig, dims: PallasDims, n_tiles: int,
):
    gx = g_ref[0, 0]
    gy = g_ref[0, 1]
    i = pl.program_id(0)
    ib = i % 8  # this tile's row within its (16, nr) span block
    tq, nr, cap, nrb, capb = dims.tq, dims.nr, dims.cap, dims.nrb, dims.capb
    support = jnp.float32(cfg.support_radius)

    def next_val(cur, ahead, s):
        return jnp.where(ib == 7, ahead[0, s], cur[jnp.minimum(ib + 1, 7), s])

    def start_spans(get_f, get_b, slot):
        for s in range(nr):
            st, ln = get_f(s)
            a, _ = _aligned_start(st)

            def _go_f(a=a, s=s):
                pltpu.make_async_copy(
                    fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
                ).start()
                pltpu.make_async_copy(
                    rp_hbm.at[:, pl.ds(a, cap)], crp.at[slot, s], sem_rp.at[slot, s]
                ).start()

            _go_f()
        for s in range(nrb):
            st, ln = get_b(s)
            a, _ = _aligned_start(st)

            def _go_b(a=a, s=s):
                pltpu.make_async_copy(
                    bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
                ).start()

            _go_b()

    cur_f = lambda s: (f_start[ib, s], f_len[ib, s])
    cur_b = lambda s: (b_start[ib, s], b_len[ib, s])
    nxt_f = lambda s: (next_val(f_start, f_start_n, s), next_val(f_len, f_len_n, s))
    nxt_b = lambda s: (next_val(b_start, b_start_n, s), next_val(b_len, b_len_n, s))

    if dims.interpret:
        slot = 0
        start_spans(cur_f, cur_b, 0)
    else:
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            start_spans(cur_f, cur_b, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_spans(nxt_f, nxt_b, nxt)

    qx = q_ref[:, X].reshape(tq, 1)
    qy = q_ref[:, Y].reshape(tq, 1)
    qu = q_ref[:, U].reshape(tq, 1)
    qv = q_ref[:, V].reshape(tq, 1)
    qm = q_ref[:, M].reshape(tq, 1)
    q_rho = qrp_ref[:, 0].reshape(tq, 1)
    q_p = qrp_ref[:, 1].reshape(tq, 1)
    q_global = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)

    # p_i/rho_i^2, guarded for pad slots where rho may be 0
    q_press = jnp.where(q_rho > 0.0, q_p / (q_rho * q_rho), 0.0)

    h = jnp.float32(cfg.h)
    c_sound = jnp.float32(cfg.c)
    alpha = jnp.float32(cfg.alpha_visc)
    eps_h2 = jnp.float32(cfg.eps_visc) * h * h
    inv_w_ref = jnp.float32(1.0) / jnp.float32(artificial_pressure_ref_w(cfg))
    k_ap = jnp.float32(cfg.k_artificial_pressure)

    sum_x = jnp.zeros((tq, 1), jnp.float32)
    sum_y = jnp.zeros((tq, 1), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    for s in range(nr):
        a, extra = _aligned_start(f_start[ib, s])
        length = f_len[ib, s]

        def _wait_f(a=a, s=s):
            pltpu.make_async_copy(
                fc_hbm.at[:, pl.ds(a, cap)], cf.at[slot, s], sem_f.at[slot, s]
            ).wait()
            pltpu.make_async_copy(
                rp_hbm.at[:, pl.ds(a, cap)], crp.at[slot, s], sem_rp.at[slot, s]
            ).wait()

        _wait_f()
        total = jnp.minimum(extra + length, cap)
        n_chunks = (total + LANE - 1) // LANE

        def chunk(c, acc):
            sx, sy = acc
            off = pl.multiple_of(c * LANE, LANE)
            cx = cf[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cf[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cu = cf[slot, s, U, pl.ds(off, LANE)].reshape(1, LANE)
            cv = cf[slot, s, V, pl.ds(off, LANE)].reshape(1, LANE)
            cm = cf[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)
            c_rho = crp[slot, s, 0, pl.ds(off, LANE)].reshape(1, LANE)
            c_p = crp[slot, s, 1, pl.ds(off, LANE)].reshape(1, LANE)

            dx = qx - cx
            dy = qy - cy
            du = qu - cu
            dv = qv - cv
            r, w, gcoef = _pair_w(dx, dy, cfg)

            # symmetric pressure (`pi_sph_fluid.c:321`)
            pressure = q_press + jnp.where(c_rho > 0.0, c_p / (c_rho * c_rho), 0.0)
            # Macklin artificial pressure (`pi_sph_fluid.c:325`)
            ap_ratio = w * inv_w_ref
            ap2 = ap_ratio * ap_ratio
            artif = k_ap * (ap2 * ap2)
            # Monaghan viscosity, pair-mean density (`pi_sph_fluid.c:328-334`)
            xy_uv = dx * du + dy * dv
            xy_xy = dx * dx + dy * dy
            mu = h * xy_uv / (xy_xy + eps_h2)
            mean_rho = (q_rho + c_rho) * 0.5
            visc = jnp.where(
                (xy_uv < 0.0) & (mean_rho > 0.0),
                -alpha * c_sound * mu / mean_rho, 0.0,
            )

            term = pressure + artif + visc
            lane_idx = off + lane
            mask = (
                (lane_idx >= extra) & (lane_idx < total)
                & (r < support) & (a + lane_idx != q_global)
            )
            coef = jnp.where(mask, cm * term, 0.0)
            return (sx + jnp.sum(coef * (gcoef * dx), axis=1, keepdims=True),
                    sy + jnp.sum(coef * (gcoef * dy), axis=1, keepdims=True))

        sum_x, sum_y = jax.lax.fori_loop(0, n_chunks, chunk, (sum_x, sum_y))

    for s in range(nrb):
        a, extra = _aligned_start(b_start[ib, s])
        length = b_len[ib, s]

        def _wait_b(a=a, s=s):
            pltpu.make_async_copy(
                bc_hbm.at[:, pl.ds(a, capb)], cb.at[slot, s], sem_b.at[slot, s]
            ).wait()

        _wait_b()
        total = jnp.minimum(extra + length, capb)
        n_chunks = (total + LANE - 1) // LANE

        def chunk_b(c, acc):
            sx, sy = acc
            off = pl.multiple_of(c * LANE, LANE)
            cx = cb[slot, s, X, pl.ds(off, LANE)].reshape(1, LANE)
            cy = cb[slot, s, Y, pl.ds(off, LANE)].reshape(1, LANE)
            cu = cb[slot, s, U, pl.ds(off, LANE)].reshape(1, LANE)
            cv = cb[slot, s, V, pl.ds(off, LANE)].reshape(1, LANE)
            cpsi = cb[slot, s, M, pl.ds(off, LANE)].reshape(1, LANE)

            dx = qx - cx
            dy = qy - cy
            du = qu - cu
            dv = qv - cv
            r, w, gcoef = _pair_w(dx, dy, cfg)

            # boundary variant: fluid-only pressure + fluid-density viscosity
            # (`pi_sph_fluid.c:350,362`)
            ap_ratio = w * inv_w_ref
            ap2 = ap_ratio * ap_ratio
            artif = k_ap * (ap2 * ap2)
            xy_uv = dx * du + dy * dv
            xy_xy = dx * dx + dy * dy
            mu = h * xy_uv / (xy_xy + eps_h2)
            visc = jnp.where(
                (xy_uv < 0.0) & (q_rho > 0.0),
                -alpha * c_sound * mu / q_rho, 0.0,
            )
            term = q_press + artif + visc
            lane_idx = off + lane
            mask = (lane_idx >= extra) & (lane_idx < total) & (r < support)
            coef = jnp.where(mask, cpsi * term, 0.0)
            return (sx + jnp.sum(coef * (gcoef * dx), axis=1, keepdims=True),
                    sy + jnp.sum(coef * (gcoef * dy), axis=1, keepdims=True))

        sum_x, sum_y = jax.lax.fori_loop(0, n_chunks, chunk_b, (sum_x, sum_y))

    q_valid = qm > 0.0  # pads carry zero mass (spans.py layout contract)
    out_ref[:, 0:1] = jnp.where(q_valid, gx - sum_x, 0.0)
    out_ref[:, 1:2] = jnp.where(q_valid, gy - sum_y, 0.0)


def forces_call(
    q_packed,        # (n_pad, 8)
    q_rhop,          # (n_pad, 2) fresh rho/p (density kernel output)
    fc_packed,       # (8, n_pad + cap)
    rp_packed,       # (2, n_pad + cap)
    bc_packed,       # (8, nb_pad + capb)
    f_spans, b_spans,
    g,               # (2,) gravity — traced, rides the scalar-prefetch path
    cfg: SPHConfig,
    dims: PallasDims,
    windows=None,    # (w_lo, w_hi) per-qb fluid windows; enables the qb path
):
    n_pad = q_packed.shape[0]
    n_tiles = n_pad // dims.tq
    f_span_spec = pl.BlockSpec((8, dims.nr), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    b_span_spec = pl.BlockSpec((8, dims.nrb), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    f_span_ahead = pl.BlockSpec((8, dims.nr), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    b_span_ahead = pl.BlockSpec((8, dims.nrb), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            f_span_spec, f_span_spec, b_span_spec, b_span_spec,
            f_span_ahead, f_span_ahead, b_span_ahead, b_span_ahead,
            # gravity as an (8, 2) SMEM block: a (1, 2) block (sublane dim 1)
            # intermittently read garbage for a subset of tiles on v5e
            pl.BlockSpec((8, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((dims.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dims.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((dims.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, dims.nr, NFIELDS, dims.cap), jnp.float32),
            pltpu.VMEM((2, dims.nr, 2, dims.cap), jnp.float32),
            pltpu.VMEM((2, dims.nrb, NFIELDS, dims.capb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, dims.nr)),
            pltpu.SemaphoreType.DMA((2, dims.nr)),
            pltpu.SemaphoreType.DMA((2, dims.nrb)),
        ],
    )
    kernel = functools.partial(_forces_kernel, cfg=cfg, dims=dims, n_tiles=n_tiles)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=dims.interpret,
    )
    fs, fl = _pad8(f_spans.start), _pad8(f_spans.length)
    bs, bl = _pad8(b_spans.start), _pad8(b_spans.length)
    g2 = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (8, 2))
    if windows is None:
        return call(fs, fl, bs, bl, fs, fl, bs, bl, g2,
                    q_packed, q_rhop, fc_packed, rp_packed, bc_packed)
    nqb3 = 3 * (dims.tq // dims.qb)
    win_spec = pl.BlockSpec((8, nqb3), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    grid_spec_qb = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=list(grid_spec.in_specs[:8]) + [win_spec, win_spec]
        + list(grid_spec.in_specs[8:]),
        out_specs=grid_spec.out_specs,
        scratch_shapes=grid_spec.scratch_shapes,
    )
    kernel_qb = functools.partial(_forces_kernel_qb, cfg=cfg, dims=dims, n_tiles=n_tiles)
    call_qb = pl.pallas_call(
        kernel_qb,
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        grid_spec=grid_spec_qb,
        interpret=dims.interpret,
    )
    return call_qb(fs, fl, bs, bl, fs, fl, bs, bl,
                   _pad8(windows[0]), _pad8(windows[1]), g2,
                   q_packed, q_rhop, fc_packed, rp_packed, bc_packed)

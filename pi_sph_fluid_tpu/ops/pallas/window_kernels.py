"""Fused per-query-block window kernels over the row-triple candidate layout.

Round-3 revision.  The round-3 probes (tools/gather_probe.py,
tools/skip_probe.py, tools/knockout_probe.py, all measured on the attached
v5e) pinned the cost model and killed two of the planned levers:

* XLA row-gather cost is **per gather op** (~0.7-0.8 ms in-graph for the
  bench-scale trip_src at any row width 2-16, f32 or bf16) — so bf16
  candidate planes and narrow cp/re planes buy nothing, elementwise
  carried-tick candidate refresh costs the same as re-gathering (it still
  needs an au/av gather plus a cp/re gather per tick), and merging the
  density geometry into the force array is a net LOSS (the density pass
  then DMAs 8 rows instead of 4 and the dual build doubles: measured
  ~+0.7 ms/tick).  The two-gather-per-tick dataflow — slim (L, 4) density
  geometry before the density pass, full (L, 8) force candidates after the
  EOS — is the measured floor.
* **Per-block ``pl.when`` chunk dispatch is strongly negative**: computing
  only ceil(flen/128) of the cap/128 chunks costs ~+275 ns per block-branch
  on v5e (+3.5 ms/tick at 100k, measured with dispatch on vs off), far more
  than the skipped VPU work saves.  ``_chunk_dispatch`` is kept as the
  documented dead lever with the always-full default.

What round 3 did keep:

* the per-candidate viscosity-denominator weight ``a`` (0.5 fluid, 1.0
  boundary) rides in force-candidate row 7, turning the reference's
  boundary asymmetry (`pi_sph_fluid.c:362`) into one fma:
  denom = a_j*rho_i + re_j (replacing a compare+select per lane; exact:
  x0.5 and rho/2 are exact f32 scalings);
* the ``denom > 0`` guard is dropped from the viscosity predicate: denom
  can only be 0 for pad queries (rho_i = 0 with re_j = 0), whose outputs
  are zeroed by the final q_valid select — a NaN/Inf produced on a pad
  query's lanes never escapes a select, and real queries always have
  denom >= a_j*rho_i > 0.

Round-2 foundations unchanged: fully static chunk structure (dynamic
fori_loop bounds + SMEM scalar reads in the math path measured
~1.4 ms/pass), no per-lane masks (out-of-window lanes are support-killed
by construction; the density self-term IS the reference's explicit m*W(0),
`pi_sph_fluid.c:274-275`; force self-terms vanish at dx = dy = 0),
dual-plane 64-lane-shifted fetch encoding, cross-tile double buffering
with unconditional DMA pairs (predicated start/wait pairs unbalance DMA
semaphores — the round-1 hardware NaN bug).

Physics matches the reference pass-for-pass:
  density + Tait EOS           `pi_sph_fluid.c:263-301`
  symmetric pressure + Macklin artificial pressure + Monaghan viscosity
                               `pi_sph_fluid.c:303-373`
with the boundary asymmetries (fluid-only pressure, fluid-rho viscosity
denominator, `pi_sph_fluid.c:350,362`) folded into per-candidate values
c_press_j (p/rho^2 fluid, 0 boundary), re_j (rho/2 fluid, 0 boundary) and
a_j; all computed once per particle, not once per pair lane.  The two
viscosity divides fuse into one: mu/denom = h*xy_uv /
((r^2 + eps*h^2) * denom).
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
CP, RE, A = 5, 6, 7      # force-candidate rows: c_press, rho_eff, denom weight
DX, DY, DM = 0, 1, 2     # slim density-array rows
NFIELDS = 8
LANE = 128

__all__ = ["density_window_call", "forces_window_call"]

# Measured dead lever (see module docstring): per-block pl.when dispatch on
# the true fetch length costs ~+275 ns/block on v5e — far more than the
# skipped chunks save.  Kept switchable for future hardware probes only.
CHUNK_DISPATCH = False


def _unnorm_wref(cfg: SPHConfig) -> float:
    """W(0.2H)/norm — the artificial-pressure reference, unnormalized (the
    normalisations cancel in the W/W_ref ratio)."""
    return float(artificial_pressure_ref_w(cfg)) / float(cfg.kernel_norm)


def _start_windows(spec, pairs, get_start, slot):
    """Issue one DMA per (block, candidate array).  pairs: list of
    (hbm_ref, stage_ref, sem_ref); each copy moves ALL rows of its array —
    Mosaic requires HBM row slices to be 8-aligned, so sub-row DMAs are
    not expressible (keep candidate arrays exactly as tall as needed).

    Dual-plane specs guarantee 128-aligned starts (block_windows) — assert
    that to the compiler; exact-start specs (planes == 1) fetch at the
    window's true lane offset."""
    for b in range(spec.nqb):
        a = get_start(b)
        if spec.planes != 1:
            a = pl.multiple_of(a, LANE)

        def _go(a=a, b=b):
            for hbm, stage, sem in pairs:
                pltpu.make_async_copy(
                    hbm.at[:, pl.ds(a, spec.cap)],
                    stage.at[slot, b], sem.at[slot, b],
                ).start()

        _go()


def _wait_windows(spec, pairs, get_start, slot):
    for b in range(spec.nqb):
        a = get_start(b)
        if spec.planes != 1:
            a = pl.multiple_of(a, LANE)

        def _wait(a=a, b=b):
            for hbm, stage, sem in pairs:
                pltpu.make_async_copy(
                    hbm.at[:, pl.ds(a, spec.cap)],
                    stage.at[slot, b], sem.at[slot, b],
                ).wait()

        _wait()


def _doublebuffer(spec, interpret, n_tiles, i, ib, pairs, w_start, w_start_n):
    """Cross-tile double buffering: tile 0 fetches its own windows, every
    tile prefetches tile i+1's, all unconditional (predicated start/wait
    pairs unbalance DMA semaphores — the round-1 hardware NaN bug)."""
    cur = lambda b: w_start[ib, b]
    nxt = lambda b: jnp.where(ib == 7, w_start_n[0, b],
                              w_start[jnp.minimum(ib + 1, 7), b])
    if interpret:
        _start_windows(spec, pairs, cur, 0)
        return 0, cur

    slot = i % 2

    @pl.when(i == 0)
    def _():
        _start_windows(spec, pairs, cur, slot)

    @pl.when(i + 1 < n_tiles)
    def _():
        _start_windows(spec, pairs, nxt, (i + 1) % 2)

    return slot, cur


def _chunk_dispatch(flen_b, n_chunks, body):
    """Chunk-count dispatch point.  Default (CHUNK_DISPATCH=False): always
    compute every chunk — the branch-per-block form measured ~+275 ns/block
    on v5e (tools/skip_probe.py), losing far more than the skipped VPU work
    saves.  The adaptive form is kept only for probing other hardware."""
    if not CHUNK_DISPATCH or n_chunks == 1:
        body(n_chunks)
        return
    for k in range(1, n_chunks + 1):
        if k == 1:
            cond = flen_b <= LANE
        elif k < n_chunks:
            cond = (flen_b > (k - 1) * LANE) & (flen_b <= k * LANE)
        else:
            cond = flen_b > (k - 1) * LANE

        @pl.when(cond)
        def _(k=k):
            body(k)


def _pad8(arr):
    n = arr.shape[0]
    pad = (-n) % 8 + 8
    return jnp.pad(arr, ((0, pad), (0, 0)))


def _span_specs(spec):
    here = pl.BlockSpec((8, spec.nqb), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    ahead = pl.BlockSpec((8, spec.nqb), lambda i: (i // 8 + 1, 0), memory_space=pltpu.SMEM)
    return here, ahead


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------


def _density_kernel(
    w_start, w_start_n,                   # (8, nqb) SMEM blocks (+ next-tile)
    flen_s,                               # (8, nqb) SMEM true fetch lengths
    q_ref,                                # (tq, 8) queries
    geo_hbm,                              # (4, 2L) x, y, m~, 0 (dual-plane)
    geo8_ref,                             # (tq, 8): x,y,u,v,m,cp,re,a=0.5 —
                                          # the fluid force-candidate rows
    rp_ref,                               # (tq, 2): rho, p (the state update)
    stage, sem,
    *, cfg: SPHConfig, spec: TripleSpec, n_tiles: int, interpret: bool,
):
    i = pl.program_id(0)
    ib = i % 8
    qb = spec.qb
    pairs = [(geo_hbm, stage, sem)]
    slot, cur = _doublebuffer(spec, interpret, n_tiles, i, ib,
                              pairs, w_start, w_start_n)
    _wait_windows(spec, pairs, cur, slot)

    norm = jnp.float32(cfg.kernel_norm)
    two_inv_h = jnp.float32(2.0) / jnp.float32(cfg.h)
    half_inv_h = jnp.float32(0.5) / jnp.float32(cfg.h)
    inv_rho0 = jnp.float32(1.0 / cfg.rho_0)
    tait_b = jnp.float32(cfg.tait_b)

    # The kernel assembles the FLUID force-candidate rows itself (round 4):
    # geo8 = [x, y, u, v, m, cp, re, a=0.5] is exactly what the force gather
    # redistributes, so XLA's per-tick column-concat of packed[:, 0:5] with
    # the EOS outputs (and its broadcast/layout copies — ~0.3 ms/tick in the
    # round-4 trace) is replaced by one whole-tile VMEM copy here.  Cols 5-7
    # (stale rho/p and the float id) are overwritten below before the tile
    # ends: cp/re per block, the constant a-weight per tile.
    geo8_ref[:, :] = q_ref[:, :]
    geo8_ref[:, A:A + 1] = jnp.full((spec.tq, 1), 0.5, jnp.float32)

    # hoist query columns once per tile ((tq,1) extractions are sublane
    # relayouts; per-block (qb,1) extractions would cost the same EACH)
    qx_t = q_ref[:, X].reshape(spec.tq, 1)
    qy_t = q_ref[:, Y].reshape(spec.tq, 1)

    n_chunks = spec.cap // LANE
    for b in range(spec.nqb):
        qlo = b * qb
        qx = qx_t[qlo:qlo + qb]          # free static sub-slices
        qy = qy_t[qlo:qlo + qb]

        def body(used, b=b, qx=qx, qy=qy, qlo=qlo):
            acc = jnp.zeros((qb, LANE), jnp.float32)
            for c in range(used):
                lo = c * LANE
                cx = stage[slot, b, DX, lo:lo + LANE].reshape(1, LANE)
                cy = stage[slot, b, DY, lo:lo + LANE].reshape(1, LANE)
                cm = stage[slot, b, DM, lo:lo + LANE].reshape(1, LANE)
                dx = qx - cx
                dy = qy - cy
                r = jnp.sqrt(dx * dx + dy * dy)
                t1 = jnp.maximum(1.0 - half_inv_h * r, 0.0)  # support == q<2
                t1sq = t1 * t1
                acc = acc + (cm * (t1sq * t1sq)) * (1.0 + two_inv_h * r)
            # self term included.  Tait EOS + the per-particle force inputs
            # p/rho^2 and rho/2 run IN-KERNEL on the reduced (qb, 1) column
            # (`pi_sph_fluid.c:294-301`): the round-4 device trace showed the
            # XLA epilogue (squeeze -> EOS fusion -> 4-column stack) costing
            # ~0.3-0.4 ms/tick in T(1024)<->T(8,128) layout copies alone —
            # a dozen VPU ops on the already-resident column are ~free here.
            rho = norm * jnp.sum(acc, axis=1, keepdims=True)
            ratio = rho * inv_rho0
            rr2 = ratio * ratio
            rr4 = rr2 * rr2
            p = jnp.maximum(tait_b * (rr4 * rr2 * ratio - 1.0), 0.0)
            # no rho > 0 guard divide: pad queries (rho = 0) give p = 0 and
            # 0/0 = NaN, killed by the select (NaN never escapes a select on
            # TPU — same argument as the viscosity denominator)
            cpress = jnp.where(rho > 0.0, p / (rho * rho), 0.0)
            geo8_ref[qlo:qlo + qb, CP:CP + 1] = cpress
            geo8_ref[qlo:qlo + qb, RE:RE + 1] = 0.5 * rho
            rp_ref[qlo:qlo + qb, 0:1] = rho
            rp_ref[qlo:qlo + qb, 1:2] = p

        _chunk_dispatch(flen_s[ib, b], n_chunks, body)


def density_window_call(q_packed, geo_d, ctx_start, ctx_flen, cfg: SPHConfig,
                        spec: TripleSpec, interpret: bool = False):
    """Returns (geo8, rp): the (n_layout, 8) fluid force-candidate rows
    [x, y, u, v, m, cp, re, a=0.5] ready for the force gather, and the
    (n_layout, 2) [rho, p] state-update columns."""
    n_tiles = spec.n_tiles
    ws = _pad8(ctx_start)
    fl = _pad8(ctx_flen)
    here, ahead = _span_specs(spec)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            here, ahead, here,
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, spec.nqb, 4, spec.cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, spec.nqb)),
        ],
    )
    kernel = functools.partial(_density_kernel, cfg=cfg, spec=spec,
                               n_tiles=n_tiles, interpret=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((spec.n_layout, NFIELDS), jnp.float32),
            jax.ShapeDtypeStruct((spec.n_layout, 2), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, ws, fl, q_packed, geo_d)


# ---------------------------------------------------------------------------
# forces
# ---------------------------------------------------------------------------


def _forces_kernel(
    w_start, w_start_n,
    flen_s,                               # (8, nqb) SMEM true fetch lengths
    g_ref,                                # (8, 2) SMEM gravity
    q_ref,                                # (tq, 8)
    d_ref,                                # (tq, 8) geo8: x,y,u,v,m,cp,re,a
    rp_ref,                               # (tq, 2) rho, p (density output)
    geo_hbm,                              # (8, 2L) x,y,u,v,m~,cp,re,a (dual)
    pk_ref,                               # (tq, 8): the FINISHED next state
                                          # [x, y, u2, v2, m, rho, p, id]
    out_ref,                              # (tq, 2): du_dt, dv_dt
    stage, sem,
    *, cfg: SPHConfig, spec: TripleSpec, n_tiles: int, interpret: bool,
    half_dt: float, damp: float,
):
    gx = g_ref[0, 0]
    gy = g_ref[0, 1]
    i = pl.program_id(0)
    ib = i % 8
    qb = spec.qb
    pairs = [(geo_hbm, stage, sem)]
    slot, cur = _doublebuffer(spec, interpret, n_tiles, i, ib,
                              pairs, w_start, w_start_n)
    _wait_windows(spec, pairs, cur, slot)

    # trailing half-kick fused in-epilogue (round 4): the kernel emits the
    # finished packed state [x, y, (u + half_dt*au)*damp, ..., m, rho, p,
    # id] so XLA's per-tick _finish concat + acc column extracts die.  x,
    # y, m, id ride the whole-tile copy; rho/p come from the density
    # output; u2/v2 are written per block below.  half_dt = 0, damp = 1
    # reproduces the priming pass (u unchanged) bitwise.
    pk_ref[:, :] = q_ref[:, :]
    pk_ref[:, 5:6] = rp_ref[:, 0:1]
    pk_ref[:, 6:7] = rp_ref[:, 1:2]
    half_f = jnp.float32(half_dt)
    damp_f = jnp.float32(damp)

    h = jnp.float32(cfg.h)
    half_inv_h = jnp.float32(0.5) / h
    two_inv_h = jnp.float32(2.0) / h
    eps_h2 = jnp.float32(cfg.eps_visc) * h * h
    # -alpha*C*h, with the h of mu folded in (`pi_sph_fluid.c:328-334`)
    nach = jnp.float32(-cfg.alpha_visc) * jnp.float32(cfg.c) * h
    inv_wref4 = (jnp.float32(1.0) / jnp.float32(_unnorm_wref(cfg))) ** 4
    k_ap4 = jnp.float32(cfg.k_artificial_pressure) * inv_wref4
    # a = g - sum coef*grad_W; grad coefficient = norm*(-5)*t1^3/h^2 factored
    # out of the lane loop: a = g + (5*norm/h^2) * sum_raw
    gfac = jnp.float32(5.0) * jnp.float32(cfg.kernel_norm) / (h * h)

    # hoist query columns once per tile; per-block views are free sub-slices
    qx_t = q_ref[:, X].reshape(spec.tq, 1)
    qy_t = q_ref[:, Y].reshape(spec.tq, 1)
    qu_t = q_ref[:, U].reshape(spec.tq, 1)
    qv_t = q_ref[:, V].reshape(spec.tq, 1)
    qm_t = q_ref[:, M].reshape(spec.tq, 1)
    # per-query rho/cp from the density pass's geo8 rows: rho = 2*re is
    # exact (re = rho/2 is an exact f32 halving and rho ~ 1e3 is never
    # denormal), cp = p/rho^2 precomputed in the density epilogue
    q_rho_t = (2.0 * d_ref[:, RE]).reshape(spec.tq, 1)
    q_press_t = d_ref[:, CP].reshape(spec.tq, 1)

    n_chunks = spec.cap // LANE
    for b in range(spec.nqb):
        qlo = b * qb
        qx = qx_t[qlo:qlo + qb]
        qy = qy_t[qlo:qlo + qb]
        qu = qu_t[qlo:qlo + qb]
        qv = qv_t[qlo:qlo + qb]
        qm = qm_t[qlo:qlo + qb]
        q_rho = q_rho_t[qlo:qlo + qb]
        q_press = q_press_t[qlo:qlo + qb]

        def body(used, b=b, qx=qx, qy=qy, qu=qu, qv=qv, qm=qm,
                 q_rho=q_rho, q_press=q_press, qlo=qlo):
            ax = jnp.zeros((qb, LANE), jnp.float32)
            ay = jnp.zeros((qb, LANE), jnp.float32)
            for c in range(used):
                lo = c * LANE
                cx = stage[slot, b, X, lo:lo + LANE].reshape(1, LANE)
                cy = stage[slot, b, Y, lo:lo + LANE].reshape(1, LANE)
                cu = stage[slot, b, U, lo:lo + LANE].reshape(1, LANE)
                cv = stage[slot, b, V, lo:lo + LANE].reshape(1, LANE)
                cm = stage[slot, b, M, lo:lo + LANE].reshape(1, LANE)
                ccp = stage[slot, b, CP, lo:lo + LANE].reshape(1, LANE)
                cre = stage[slot, b, RE, lo:lo + LANE].reshape(1, LANE)
                ca = stage[slot, b, A, lo:lo + LANE].reshape(1, LANE)

                dx = qx - cx
                dy = qy - cy
                du = qu - cu
                dv = qv - cv
                r2 = dx * dx + dy * dy
                r = jnp.sqrt(r2)
                t1 = jnp.maximum(1.0 - half_inv_h * r, 0.0)
                t1sq = t1 * t1
                t13 = t1sq * t1
                w_un = (t1sq * t1sq) * (1.0 + two_inv_h * r)
                # symmetric pressure (`pi_sph_fluid.c:321`); c_press is 0 on
                # boundary lanes -> fluid-only term (`pi_sph_fluid.c:350`)
                press = q_press + ccp
                # Macklin artificial pressure (`pi_sph_fluid.c:325`)
                w2 = w_un * w_un
                artif = k_ap4 * (w2 * w2)
                # Monaghan viscosity, both divides fused into one; the
                # pair-mean vs fluid-only denominator asymmetry
                # (`pi_sph_fluid.c:333,362`) is the per-candidate weight a:
                # denom = 0.5*rho_i + rho_j/2 fluid, rho_i boundary.
                # No denom > 0 guard: denom = 0 only for pad queries
                # (rho_i = 0), whose lanes are zeroed by the q_valid select
                # below — NaN/Inf cannot escape a select on TPU
                xy_uv = dx * du + dy * dv
                denom = ca * q_rho + cre
                den = (r2 + eps_h2) * denom
                # min() replaces the compare+select gate bitwise-exactly:
                # approaching pairs (xy_uv < 0) keep nach*xy_uv/den, others
                # get 0/den = 0 (den > 0 for every real-query lane)
                visc = (nach * jnp.minimum(xy_uv, 0.0)) / den
                coef = cm * (press + artif + visc) * t13
                ax = ax + coef * dx
                ay = ay + coef * dy

            sx = jnp.sum(ax, axis=1, keepdims=True)
            sy = jnp.sum(ay, axis=1, keepdims=True)
            q_valid = qm > 0.0
            au = jnp.where(q_valid, gx + gfac * sx, 0.0)
            av = jnp.where(q_valid, gy + gfac * sy, 0.0)
            out_ref[qlo:qlo + qb, 0:1] = au
            out_ref[qlo:qlo + qb, 1:2] = av
            pk_ref[qlo:qlo + qb, 2:3] = (qu + half_f * au) * damp_f
            pk_ref[qlo:qlo + qb, 3:4] = (qv + half_f * av) * damp_f

        _chunk_dispatch(flen_s[ib, b], n_chunks, body)


def forces_window_call(q_packed, geo8, rp, geo_f, ctx_start, ctx_flen, g,
                       cfg: SPHConfig, spec: TripleSpec,
                       half_dt: float = 0.0, damp: float = 1.0,
                       interpret: bool = False):
    """``geo8``/``rp`` are the density pass's outputs — the kernel reads
    per-query cp/re from geo8 and rho/p from rp.  Returns (pk_next, acc):
    the finished packed state after the trailing half-kick (u2 =
    (u + half_dt*au)*damp; the defaults reproduce the priming pass, u
    unchanged) and the accelerations for the next tick's leading kick."""
    n_tiles = spec.n_tiles
    ws = _pad8(ctx_start)
    fl = _pad8(ctx_flen)
    here, ahead = _span_specs(spec)
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            here, ahead, here,
            # gravity as (8, 2) SMEM: a (1, 2) block intermittently read
            # garbage on v5e (round-1 finding)
            pl.BlockSpec((8, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((spec.tq, NFIELDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tq, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, spec.nqb, NFIELDS, spec.cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, spec.nqb)),
        ],
    )
    kernel = functools.partial(_forces_kernel, cfg=cfg, spec=spec,
                               n_tiles=n_tiles, interpret=interpret,
                               half_dt=float(half_dt), damp=float(damp))
    g2 = jnp.broadcast_to(jnp.asarray(g, jnp.float32), (8, 2))
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((spec.n_layout, NFIELDS), jnp.float32),
            jax.ShapeDtypeStruct((spec.n_layout, 2), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, ws, fl, g2, q_packed, geo8, rp, geo_f)

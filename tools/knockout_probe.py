"""Knockout attribution of the merged-gather tick at 100k (round 3).

Each variant runs 30 carried ticks (fixed ctx — no relayout) in one
lax.scan; deltas vs the full tick attribute stage costs without dispatch
noise.  A separate scan times the relayout.
"""
import math
import os
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.ops.pallas.window_kernels import (
    density_window_call, forces_window_call)

N = 100_000
K = 30
r = math.sqrt(6.35 / N)
cfg = sph.SPHConfig(r=r)
fluid, braw = sph.build_pool_scene(cfg)
boundary, bgrid = sph.prepare_boundary(braw, cfg)
g = jnp.asarray((0.0, -9.81), jnp.float32)
# engine geometry via env (same knobs as tools/perf_v3.py flags)
_kw = dict(qb=int(os.environ.get("QB", 16)),
           cap=int(os.environ.get("CAP", 256)),
           seg_q=int(os.environ.get("SEG_Q", 2)),
           planes=int(os.environ.get("PLANES", 2)))
print("engine", _kw)
eng = WindowEngine(cfg, boundary, bgrid, fluid.n, **_kw)
sim = eng.prime(fluid, (0.0, -9.81))
pk0, ctx, ovf = jax.jit(eng._relayout)(sim.packed)
print("overflow", int(ovf))
spec = eng.spec


def tick_variant(no_force=False, no_density=False, no_geo=False,
                 no_cpre=False, no_eos=False):
    """no_geo knocks out the density gather; no_cpre the force gather."""
    const_geo_d = jnp.zeros((4, spec.planes * spec.L), jnp.float32)
    const_geo_f = jnp.zeros((8, spec.planes * spec.L), jnp.float32)

    def tick(pk, _):
        n = pk.shape[0]
        zcol = jnp.zeros((n, 1), jnp.float32)
        half_col = jnp.full((n, 1), 0.5, jnp.float32)
        if no_geo:
            geo_d = const_geo_d
        else:
            geo_d_src = jnp.concatenate([
                jnp.concatenate([pk[:, 0:2], pk[:, 4:5], zcol], axis=1),
                eng.b_geo_d, eng.inert_row_d], axis=0)
            geo_d = eng._expand(geo_d_src[ctx.trip_src].T)
        if no_density:
            # knocked-out density: rebuild geo8/rp from the carried rho via
            # the jnp EOS so the stage attribution still includes an EOS +
            # row assembly (the kernel does both in-epilogue since round 4)
            e = eng._eos(pk[:, 5:6])
            geo8 = jnp.concatenate([pk[:, 0:5], e[:, 2:4], half_col], axis=1)
            rp = e[:, 0:2]
        else:
            geo8, rp = density_window_call(pk, geo_d, ctx.w_start, ctx.flen,
                                           cfg, spec)
        if no_eos:
            geo8 = jnp.concatenate(
                [geo8[:, 0:5], rp[:, 0:1], rp[:, 0:1], half_col], axis=1)
        if no_cpre:
            geo_f = const_geo_f
        else:
            geo_f_src = jnp.concatenate([geo8, eng.b_geo, eng.inert_row],
                                        axis=0)
            geo_f = eng._expand(geo_f_src[ctx.trip_src].T)
        if no_force:
            acc = rp
            pk = jnp.concatenate([pk[:, 0:5], rp, pk[:, 7:8]], axis=1)
        else:
            # the forces kernel emits the finished state (trailing
            # half-kick fused in-epilogue since round 4)
            pk, acc = forces_window_call(pk, geo8, rp, geo_f, ctx.w_start,
                                         ctx.flen, g, cfg, spec,
                                         half_dt=0.5 * float(cfg.dt) * 1e-6)
        # keep every stage live across scan iterations (the 1e-6-scaled
        # half-kick above perturbs u/v negligibly but defeats CSE)
        return pk, ()

    @jax.jit
    def run(pk):
        out, _ = jax.lax.scan(tick, pk, None, length=K)
        return out

    return run


def timed(name, fn):
    out = jax.block_until_ready(fn(pk0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(pk0))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:28s} {dt:7.3f} ms/tick")
    return dt


full = timed("full tick", tick_variant())
nf = timed("no force kernel", tick_variant(no_force=True))
nd = timed("no density kernel", tick_variant(no_density=True))
ng = timed("no geo gather", tick_variant(no_geo=True))
nc = timed("no cpre gather", tick_variant(no_cpre=True))
ngc = timed("no gathers at all", tick_variant(no_geo=True, no_cpre=True))
nk = timed("no kernels (gathers only)",
           tick_variant(no_force=True, no_density=True))
print(f"\nforce kernel   ~ {full-nf:6.3f} ms")
print(f"density kernel ~ {full-nd:6.3f} ms")
print(f"geo gather+dual~ {full-ng:6.3f} ms")
print(f"cpre gather    ~ {full-nc:6.3f} ms")

# relayout in-scan
@jax.jit
def run_relayout(pk):
    def body(pk, _):
        pk2, ctx2, _ = eng._relayout(pk)
        return pk2, ()
    out, _ = jax.lax.scan(body, pk, None, length=K)
    return out

out = jax.block_until_ready(run_relayout(pk0))
t0 = time.perf_counter()
out = jax.block_until_ready(run_relayout(pk0))
print(f"\nrelayout (in-scan)           {(time.perf_counter()-t0)/K*1e3:7.3f} ms")

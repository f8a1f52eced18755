"""Relayout stage attribution at 100k (in-scan knockouts).

The relayout (sort + hist + frame build + layout gather + windows) costs
~3 ms — 1/3 of an exact-mode step.  This probe attributes its pieces to
see whether any is worth attacking.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/relayout_probe.py
"""
import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine, _INERT_ROW
from pi_sph_fluid_tpu.ops.grid import cell_ids
from pi_sph_fluid_tpu.ops.pallas.triple import block_windows, build_frame

N = 100_000
K = 30
r = math.sqrt(6.35 / N)
cfg = sph.SPHConfig(r=r)
fluid, braw = sph.build_pool_scene(cfg)
boundary, bgrid = sph.prepare_boundary(braw, cfg)
eng = WindowEngine(cfg, boundary, bgrid, fluid.n)
sim = eng.prime(fluid, (0.0, -9.81))
pk0 = sim.packed
spec = eng.spec


def variant(do=("sort", "hist", "frame", "lgather", "windows")):
    def body(pk, _):
        x, y, m = pk[:, 0], pk[:, 1], pk[:, 4]
        keys = jnp.where(m > 0, cell_ids(x, y, cfg), cfg.n_cells)
        if "sort" in do:
            order = jnp.argsort(keys, stable=True).astype(jnp.int32)
        else:
            order = jnp.arange(spec.n_layout, dtype=jnp.int32)
        if "hist" in do:
            counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
            cell_starts = jnp.cumsum(counts, dtype=jnp.int32)
        else:
            cell_starts = jnp.zeros(cfg.n_cells + 2, jnp.int32) + order[0]
        if "frame" in do:
            layout_src, trip_src, T = build_frame(
                spec, cfg, cell_starts, eng.b_cell_starts)
        else:
            layout_src = jnp.minimum(order, spec.n_layout)
            T = jnp.zeros((cfg.n_cells + 1, 8), jnp.int32) + cell_starts[0]
        if "lgather" in do:
            srt = jnp.concatenate(
                [pk[order], jnp.asarray(_INERT_ROW)[None, :]], axis=0)
            pk2 = srt[layout_src]
        else:
            pk2 = pk + layout_src[0].astype(jnp.float32) * 0
        if "windows" in do:
            cells = jnp.where(pk2[:, 4] > 0,
                              cell_ids(pk2[:, 0], pk2[:, 1], cfg), cfg.n_cells)
            ws, wl, fl, ov = block_windows(spec, cfg, cells, T)
            pk2 = pk2 + (ov + ws[0, 0]).astype(jnp.float32) * 0
        return pk2, ()

    @jax.jit
    def run(pk):
        out, _ = jax.lax.scan(body, pk, None, length=K)
        return out

    return run


def timed(name, fn):
    out = jax.block_until_ready(fn(pk0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(pk0))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:28s} {dt:7.3f} ms")
    return dt


full = timed("full relayout", variant())
timed("no argsort", variant(("hist", "frame", "lgather", "windows")))
timed("no frame build", variant(("sort", "hist", "lgather", "windows")))
timed("no layout gather", variant(("sort", "hist", "frame", "windows")))
timed("no windows", variant(("sort", "hist", "frame", "lgather")))

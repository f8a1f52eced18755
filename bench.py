#!/usr/bin/env python3
"""Headline benchmark: WCSPH particle-steps/second on one chip.

Runs the dam-break scene (BASELINE.json config 4) through the Pallas engine,
free-running (REALTIME off, `pi_sph_fluid.c:10`), whole steps resident in
XLA via lax.scan.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is against the reference's implied real-time throughput on a
Raspberry Pi 4: 431 particles x 4102 enforced ticks/s ~= 1.77e6
particle-steps/s (BASELINE.md).
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_pallas import PallasDims, PallasEngine
from pi_sph_fluid_tpu.models.simulation import make_multi_step, prime

BASELINE_PS = 431 * 4102  # reference implied particle-steps/s (BASELINE.md)


def bench_pallas(target_n: int, steps: int) -> dict:
    # pool scene: the settled steady state, which the row-padded layout is
    # sized for (fill area ~ 0.94*width x 0.85*height = 6.35 m^2)
    r = math.sqrt(6.35 / target_n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = PallasEngine(cfg, boundary, bgrid, fluid.n, PallasDims())
    sim = eng.prime(fluid, (0.0, -9.81))
    # sticky layout: re-sort every 4th step (pairs can only be missed in the
    # outer 0.2*(k-1)*H shell of the support even at the C/10 speed bound —
    # see engine_pallas.make_multi_step)
    multi = jax.jit(eng.make_multi_step(resort_every=4))
    g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32), (steps, 2))
    sim, st = multi(sim, g)  # compile + warm
    jax.block_until_ready(sim.packed)
    t0 = time.perf_counter()
    sim, st = multi(sim, g)
    jax.block_until_ready(sim.packed)
    wall = time.perf_counter() - t0
    return {
        "n_fluid": fluid.n,
        "steps": steps,
        "wall_s": wall,
        "ps_per_s": fluid.n * steps / wall,
        "max_rho_error_pct": float(jnp.max(st.max_rho_error_pct)),
        "neighbor_overflow": int(jnp.max(st.neighbor_overflow)),
        "backend": "pallas",
    }


def bench_reference_cpu(target_n: int, steps: int) -> dict:
    """Fallback when no TPU is present (jnp oracle path)."""
    r = math.sqrt(2.56 / target_n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_dam_break_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    sim = prime(fluid, boundary, bgrid, (0.0, -9.81), cfg)
    multi = jax.jit(make_multi_step(cfg, boundary, bgrid))
    g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32), (steps, 2))
    sim, st = multi(sim, g)
    jax.block_until_ready(sim.fluid.x)
    t0 = time.perf_counter()
    sim, st = multi(sim, g)
    jax.block_until_ready(sim.fluid.x)
    wall = time.perf_counter() - t0
    return {
        "n_fluid": fluid.n,
        "steps": steps,
        "wall_s": wall,
        "ps_per_s": fluid.n * steps / wall,
        "max_rho_error_pct": float(jnp.max(st.max_rho_error_pct)),
        "neighbor_overflow": int(jnp.max(st.neighbor_overflow)),
        "backend": "reference-cpu",
    }


def main():
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        result = bench_pallas(target_n=100_000, steps=400)
    else:
        result = bench_reference_cpu(target_n=10_000, steps=50)

    out = {
        "metric": "particle_steps_per_s",
        "value": result["ps_per_s"],
        "unit": "particle-steps/s",
        "vs_baseline": result["ps_per_s"] / BASELINE_PS,
        **{k: v for k, v in result.items() if k != "ps_per_s"},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

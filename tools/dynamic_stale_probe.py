"""Does the guarded sticky layout hold on a DYNAMIC scene? (round 4)

The bench headline rides guarded resort=16 on the settled pool, where
drift is tiny and the 0.3*H staleness guard reads 0.  This probe runs
the violent scene — the 100k dam-break collapse — at several resort
periods and reports throughput + the total guard count, answering "is
r16 a settled-pool artifact or a real default?" with a measurement:

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/dynamic_stale_probe.py

A nonzero stale count here is not an error: it is the guard doing its
job (SimRunner's elastic downgrade would react); what we want to know
is WHERE the envelope sits on real motion.

``--backend pallas-dd --slabs 1`` runs the same surge through the
WindowDomain sticky path (round 5, VERDICT r4 #6): the dd guard has the
same 0.3*H margin but materially different plumbing (carried-halo
ppermutes, ghost drift counts too), and before this probe its stale=0
claim was certified only on a settled slab.  One slab on the one real
chip exercises the full machinery (self-edge ppermutes).
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--settle", type=int, default=1024,
                    help="damped pre-roll steps (first-contact shock)")
    ap.add_argument("--preroll-s", type=float, default=0.10,
                    help="UNdamped sim-seconds into the collapse surge "
                         "before measuring (the guard's worst case)")
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--dt-factor", type=float, default=0.4,
                    help="CFL dt (the fine-resolution recipe, STATUS)")
    ap.add_argument("--resorts", type=str, default="4,8,16,32")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "pallas-dd"])
    ap.add_argument("--slabs", type=int, default=1,
                    help="pallas-dd: device slabs (1 = full machinery with "
                         "self-edge ppermutes on the one real chip)")
    args = ap.parse_args()

    r = math.sqrt(2.56 / args.n)   # dam-break fill area
    cfg = sph.SPHConfig(r=r, dt_factor=args.dt_factor)
    fluid, braw = sph.build_dam_break_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    if args.backend == "pallas-dd":
        return main_dd(args, cfg, fluid, braw)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, cap=args.cap)
    sim = eng.prime(fluid, (0.0, -9.81))
    print(f"n={fluid.n} dam-break r={r:.4g} dt={cfg.dt:.3e} cap={args.cap}")

    # short damped pre-roll so the measured window is the mid-collapse
    # surge, not the first-contact shock (mirrors --settle-seconds)
    g1 = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                          (args.settle, 2))
    damped = jax.jit(eng.make_multi_step(damping=0.995, resort_every=4))
    sim, _ = damped(sim, g1)
    # chunked dispatches: one >60 s device-time dispatch crashes the axon
    # tunnel's RPC watchdog (the cfl_probe finding — observed again here)
    n_pre = -(-int(args.preroll_s / float(cfg.dt)) // 2048) * 2048
    gp = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                          (2048, 2))
    free = jax.jit(eng.make_multi_step(resort_every=4))
    for _ in range(n_pre // 2048):
        sim, stp = free(sim, gp)
    print(f"pre-roll to t={n_pre*float(cfg.dt):.3f} sim-s: "
          f"max_speed={float(jnp.max(stp.max_speed)):.2f} m/s "
          f"overflow={int(jnp.max(stp.neighbor_overflow))} (surge state)")

    for k in (int(s) for s in args.resorts.split(",")):
        steps = -(-args.steps // k) * k
        g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                             (steps, 2))
        multi = jax.jit(eng.make_multi_step(resort_every=k))
        s2, st = multi(sim, g)           # compile + warm (same start state)
        jax.block_until_ready(s2.packed)
        t0 = time.perf_counter()
        s2, st = multi(sim, g)
        jax.block_until_ready(s2.packed)
        wall = time.perf_counter() - t0
        stale = int(jnp.sum(st.stale)) if st.stale is not None else 0
        ovf = int(jnp.max(st.neighbor_overflow))
        spd = float(jnp.max(st.max_speed))
        print(f"resort={k:3d}: {fluid.n*steps/wall/1e6:8.2f} M ps/s  "
              f"({wall/steps*1e3:6.3f} ms/step)  stale={stale}  "
              f"overflow={ovf}  max_speed={spd:.1f}")


def main_dd(args, cfg, fluid, braw):
    """The dd sticky path on the same surge (VERDICT r4 #6): damped settle
    -> undamped pre-roll into the collapse -> measure each resort period,
    reading the dd stats' own ``stale`` channel."""
    import numpy as np
    from jax.sharding import Mesh

    from pi_sph_fluid_tpu.parallel.domain_window import WindowDomain

    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    mesh = Mesh(np.asarray(jax.devices()[: args.slabs]), ("x",))
    dd = WindowDomain(cfg, boundary, bgrid, fluid.n, mesh, cap=args.cap)
    state = dd.init(fluid)
    print(f"n={fluid.n} dam-break dd slabs={args.slabs} "
          f"dt={cfg.dt:.3e} cap={args.cap}")

    g1 = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                          (args.settle, 2))
    damped = jax.jit(dd.make_multi_step(damping=0.995, resort_every=4))
    state, _ = damped(state, g1)
    n_pre = -(-int(args.preroll_s / float(cfg.dt)) // 2048) * 2048
    gp = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32), (2048, 2))
    free = jax.jit(dd.make_multi_step(resort_every=4))
    for _ in range(n_pre // 2048):
        state, stp = free(state, gp)
    print(f"pre-roll to t={n_pre * float(cfg.dt):.3f} sim-s: "
          f"max_speed={float(jnp.max(stp['max_speed'])):.2f} m/s "
          f"overflow={int(jnp.max(stp['overflow']))} "
          f"n_valid={int(np.asarray(stp['n_valid'])[-1])} (surge state)")

    for k in (int(s) for s in args.resorts.split(",")):
        steps = -(-args.steps // k) * k
        g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                             (steps, 2))
        multi = jax.jit(dd.make_multi_step(resort_every=k))
        s2, st = multi(state, g)         # compile + warm (same start state)
        jax.block_until_ready(s2.fluid.x)
        t0 = time.perf_counter()
        s2, st = multi(state, g)
        jax.block_until_ready(s2.fluid.x)
        wall = time.perf_counter() - t0
        stale = int(np.sum(np.asarray(st["stale"]))) if "stale" in st else 0
        ovf = int(np.max(np.asarray(st["overflow"])))
        spd = float(jnp.max(st["max_speed"]))
        nv = int(np.asarray(st["n_valid"])[-1])
        print(f"resort={k:3d}: {fluid.n*steps/wall/1e6:8.2f} M ps/s  "
              f"({wall/steps*1e3:6.3f} ms/step)  stale={stale}  "
              f"overflow={ovf}  max_speed={spd:.1f}  n_valid={nv}")


if __name__ == "__main__":
    main()

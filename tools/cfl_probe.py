#!/usr/bin/env python3
"""CFL probe for the fine-resolution sloshing-growth question (round-3
known gap #4 / VERDICT r3 #6).

At 100k particles (r=0.008) with ADEQUATE window capacity, max speed
still climbs toward the C/10 = 40 m/s design bound over ~10k-step
horizons.  The reference's own comment says CFL stability wants
DT = 0.4*H/C while it ships DT = H/C (`pi_sph_fluid.c:19`); this probe
runs the same scene at dt_factor 1.0 vs 0.4 over the same SIM time and
records the max-speed trajectory from SimRunner's 0.1-sim-s reports —
one measured answer to "is the growth a dt artifact or physics".

Usage (on hardware):
    python tools/cfl_probe.py --n 100000 --seconds 0.6 --settle 0.3
"""

import argparse
import io
import math
import re
import sys

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.io.gravity import ConstantGravity
from pi_sph_fluid_tpu.io.host_loop import SimRunner

REPORT = re.compile(
    r"sim time: ([0-9.]+).*?max rho error: ([0-9.]+)%"
    r".*?max speed: ([0-9.]+) m/s")


def run_one(dt_factor: float, n: int, seconds: float, settle: float,
            cap: int, resort: int) -> list:
    r = math.sqrt(6.35 / n)
    cfg = sph.SPHConfig(r=r, dt_factor=dt_factor)
    fluid, braw = sph.build_pool_scene(cfg)
    print(f"dt_factor={dt_factor}: dt={cfg.dt:.3e}  "
          f"steps={int(seconds / cfg.dt)}", flush=True)
    runner = SimRunner(cfg, fluid, braw, backend="pallas",
                       engine_opts=dict(cap=cap), render=False,
                       resort_every=resort, max_cap=2048)
    buf = io.StringIO()

    class Tee:
        def write(self, s):
            buf.write(s)
            sys.stdout.write(s)

        def flush(self):
            sys.stdout.flush()

    # bound the dispatch: the headless default batches a whole 0.1 sim-s
    # report interval, which at dt_factor=0.4 is ~9.7k steps ≈ 60 s of
    # device time — long enough to trip the axon tunnel's RPC watchdog
    # (observed twice: "TPU worker process crashed or restarted" mid-settle)
    res = runner.run(ConstantGravity(cfg), None, sim_seconds=seconds,
                     settle_seconds=settle, steps_per_dispatch=2048,
                     report_stream=Tee())
    rows = [(float(t), float(rho), float(spd))
            for t, rho, spd in REPORT.findall(buf.getvalue())]
    print(f"  -> {res.steps} steps, {res.particle_steps_per_s/1e6:.2f}M ps/s, "
          f"overflow {res.reporter.total_overflow}, "
          f"{res.recoveries} recoveries", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--seconds", type=float, default=0.6)
    ap.add_argument("--settle", type=float, default=0.3)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--resort", type=int, default=4)
    ap.add_argument("--factors", type=str, default="1.0,0.4")
    args = ap.parse_args()

    results = {}
    for f in (float(s) for s in args.factors.split(",")):
        results[f] = run_one(f, args.n, args.seconds, args.settle,
                             args.cap, args.resort)

    print("\n=== max-speed trajectories (t, rho_err%, max_speed) ===")
    for f, rows in results.items():
        print(f"dt_factor={f}:")
        for t, rho, spd in rows:
            print(f"  t={t:6.2f}  rho={rho:6.3f}%  speed={spd:7.2f}")
        if rows:
            peak = max(r[2] for r in rows)
            end = rows[-1][2]
            print(f"  peak={peak:.2f} m/s  final={end:.2f} m/s "
                  f"(C/10 bound = 40)")


if __name__ == "__main__":
    main()

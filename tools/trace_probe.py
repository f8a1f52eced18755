#!/usr/bin/env python3
"""Trace-confirm the roofline (VERDICT r3 #7).

Captures one jax.profiler device trace of the 100k multi-step tick and
aggregates per-op device time from the exported Perfetto/TensorBoard
trace, so ROOFLINE §3's gap decomposition (kernel lanes / gathers /
relayout / glue) is profiled, not derived from knockout probes.

The trace.json.gz event names carry the XLA op names (pallas kernels
surface as custom-calls named after the kernel, the candidate
redistribution as gather fusions, the relayout argsort as sort) — the
aggregation below buckets them and prints ms/tick next to the knockout
numbers from `tools/knockout_probe.py` (ROOFLINE §1).

Usage (on hardware):
    PYTHONPATH=/root/repo python tools/trace_probe.py --n 100000 --resort 8
"""

import argparse
import collections
import glob
import gzip
import json
import math
import os
import shutil
import time

import jax
import jax.numpy as jnp

import pi_sph_fluid_tpu as sph
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.utils.profiling import trace


def _load_trace_events(root: str) -> list:
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def _device_pids(events) -> set:
    """Process ids whose metadata names look like a TPU/accelerator —
    host threads are excluded so only device-lane op durations count."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if any(k in name.lower() for k in ("tpu", "device", "xla", "/device")):
                if "host" not in name.lower():
                    pids.add(e.get("pid"))
    return pids


BUCKETS = (
    ("force kernel", ("forces", "force_kernel", "_forces")),
    ("density kernel", ("density", "_density")),
    ("render kernel", ("field", "metaball")),
    ("gather/redistribute", ("gather", "dynamic-gather")),
    ("sort (relayout)", ("sort",)),
    ("scatter (hist)", ("scatter",)),
)


def bucket_of(name: str) -> str:
    low = name.lower()
    for label, keys in BUCKETS:
        if any(k in low for k in keys):
            return label
    return "other (fusions/glue)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--resort", type=int, default=8)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--out", default="/tmp/sph_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    r = math.sqrt(6.35 / args.n)
    cfg = sph.SPHConfig(r=r)
    fluid, braw = sph.build_pool_scene(cfg)
    boundary, bgrid = sph.prepare_boundary(braw, cfg)
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, cap=args.cap)
    sim = eng.prime(fluid, (0.0, -9.81))
    multi = jax.jit(eng.make_multi_step(resort_every=args.resort))
    g = jnp.broadcast_to(jnp.asarray((0.0, -9.81), jnp.float32),
                         (args.steps, 2))
    sim2, st = multi(sim, g)                    # compile + warm
    jax.block_until_ready(sim2.packed)
    t0 = time.perf_counter()
    sim2, st = multi(sim, g)
    jax.block_until_ready(sim2.packed)
    wall = time.perf_counter() - t0
    print(f"n={fluid.n} steps={args.steps} resort={args.resort}: "
          f"{wall / args.steps * 1e3:.3f} ms/tick "
          f"({fluid.n * args.steps / wall / 1e6:.2f}M ps/s)")

    shutil.rmtree(args.out, ignore_errors=True)
    with trace(args.out):
        sim2, st = multi(sim, g)
        jax.block_until_ready(sim2.packed)

    events = _load_trace_events(args.out)
    if not events:
        print(f"NO trace events found under {args.out} — the axon tunnel "
              f"may not export device traces; record this as the probe's "
              f"measured answer.")
        return
    dev_pids = _device_pids(events)
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        per_op[name] += e["dur"]          # microseconds
        per_bucket[bucket_of(name)] += e["dur"]

    total_us = sum(per_bucket.values())
    print(f"\ndevice total {total_us / 1e3:.2f} ms over {args.steps} steps "
          f"= {total_us / 1e3 / args.steps:.3f} ms/tick attributed")
    print("\n=== bucket ms/tick ===")
    for label, us in per_bucket.most_common():
        print(f"  {label:28s} {us / 1e3 / args.steps:7.3f} ms "
              f"({us / max(total_us, 1) * 100:5.1f}%)")
    print(f"\n=== top {args.top} ops (ms per {args.steps}-step dispatch) ===")
    for name, us in per_op.most_common(args.top):
        print(f"  {us / 1e3:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()

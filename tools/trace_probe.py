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


def bucket_of(name: str, category: str, long_name: str) -> str:
    """Bucket a device op by its HLO category + signature.

    The pallas kernels surface as custom-calls whose output shape
    distinguishes them (density returns the (geo8, rp) TUPLE since the
    round-4 epilogue fusion; forces a single [n_layout, 2]); the
    candidate redistributions are the 'custom fusion' gathers producing
    [L, cols]; 'data formatting' is the layout-transpose copies XLA
    inserts between the gather output and the kernel's expected
    (VMEM-pinned, minor-dim-0) layout."""
    if category == "custom-call":
        # both kernels return (n,8)+(n,2) tuples since the round-4 epilogue
        # fusions; the density call is the one consuming the slim 4-row
        # candidate plane (f32[4, 2L]), forces the 8-row plane + gravity
        if "f32[4," in long_name:
            return "density kernel (pallas)"
        return "forces kernel (pallas)"
    if category == "custom fusion":
        return "candidate gather (redistribute)"
    if category in ("data formatting", "copy-done", "copy-start",
                    "async-done", "async-start"):
        return "layout copies / DMA"
    if category == "sort":
        return "sort (relayout)"
    if category in ("loop fusion", "input fusion", "output fusion",
                    "non-fusion elementwise", "reduce", "reduce-window"):
        return "elementwise/reduce glue (EOS, integrate, stats)"
    return f"other ({category})"


def self_times(events, dev_pids):
    """Per-op SELF time on the device op track: each track's events are
    interval-nested (module span > while spans > op spans); an op's self
    time is its duration minus its direct children's, so container spans
    (jit_*, while.*) attribute ~0 and the per-op sum matches the module
    wall.  Module-level spans (name starts with 'jit_') are skipped —
    they live on their own track and would double-count everything."""
    tracks = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        if e.get("name", "").startswith("jit_"):
            continue
        tracks[(e.get("pid"), e.get("tid"))].append(e)
    rows = []   # (name, category, long_name, self_us)
    for es in tracks.values():
        es.sort(key=lambda e: (e["ts"], -e["dur"]))
        child = collections.defaultdict(float)
        stack = []
        for i, e in enumerate(es):
            ts, dur = e["ts"], e["dur"]
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                child[stack[-1][1]] += dur
            stack.append((ts + dur, i))
        for i, e in enumerate(es):
            args = e.get("args", {})
            rows.append((e.get("name", "?"),
                         args.get("hlo_category", "?"),
                         args.get("long_name", ""),
                         max(e["dur"] - child.get(i, 0.0), 0.0)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--resort", type=int, default=8)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--out", default="/tmp/sph_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--aggregate-only", action="store_true",
                    help="skip the device run; re-aggregate an existing "
                         "--out trace directory")
    args = ap.parse_args()

    if not args.aggregate_only:
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
    rows = self_times(events, dev_pids)
    per_op = collections.Counter()
    op_count = collections.Counter()
    op_long = {}
    per_bucket = collections.Counter()
    for name, category, long_name, us in rows:
        per_op[name] += us
        op_count[name] += 1
        op_long.setdefault(name, long_name)
        per_bucket[bucket_of(name, category, long_name)] += us

    total_us = sum(per_bucket.values())
    print(f"\ndevice op-track total {total_us / 1e3:.2f} ms over "
          f"{args.steps} steps = {total_us / 1e3 / args.steps:.3f} ms/tick "
          f"attributed (gap to wall = host dispatch + launch skew)")
    print("\n=== bucket ms/tick (self time) ===")
    for label, us in per_bucket.most_common():
        print(f"  {label:48s} {us / 1e3 / args.steps:7.3f} ms "
              f"({us / max(total_us, 1) * 100:5.1f}%)")
    print(f"\n=== top {args.top} ops by self time "
          f"(ms/tick over the {args.steps}-step dispatch) ===")
    for name, us in per_op.most_common(args.top):
        print(f"  {us / 1e3 / args.steps:7.3f} ms x{op_count[name]:4d}  "
              f"{name:28s} {op_long[name][:80]}")


if __name__ == "__main__":
    main()

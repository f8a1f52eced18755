#!/bin/bash
# Round-4 hardware battery (VERDICT r3 #6, #7, #3a + headline refresh).
# The exact-start lever (#1) and guarded resort=8 (#2) were measured in the
# first round-4 session (Mosaic rejects lane-unaligned DMA starts; guarded
# k=8 headline 18.18M) — this battery covers the rest:
#   - trace_probe: per-op device trace so ROOFLINE §3 is profiled, not derived
#   - cfl_probe:   dt_factor 1.0 vs 0.4 sloshing-growth answer (known gap #4)
#   - bench.py:    the driver-visible JSON with the new dd + 1M rows
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash tools/hw_session_r4.sh
set -u
LOG=${LOG:-/tmp/hw_r4.log}
PY="python -u"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1750 $PY "$@" 2>&1 | tee -a "$LOG"
}

echo "### hw_session_r4 $(date)" | tee -a "$LOG"

# 0. same-session baseline pin (chip-day drift makes cross-session deltas lie)
run tools/perf_v3.py --n 100000 --resorts 1,4,8

# 1. roofline trace confirmation (VERDICT #7)
run tools/trace_probe.py --n 100000 --resort 8

# 2. CFL probe (VERDICT #6): same sim time at dt_factor 1.0 vs 0.4
run tools/cfl_probe.py --n 100000 --seconds 0.6 --settle 0.3

# 3. the driver bench (headline + 1M + dd rows)
run bench.py

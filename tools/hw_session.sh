#!/bin/bash
# Round-3 continuation hardware battery — fire when the axon tunnel is up.
# Runs the seg_q/cap A/B the CPU flen probe motivated (tools/flen_probe.py:
# at qb=16/seg_q=1 every block window fits ONE 128-lane chunk at the bench
# operating point, halving per-block VPU chunk work for +50% gather length),
# then refreshes the headline numbers.  Everything logs to $LOG.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash tools/hw_session.sh
set -u
LOG=${LOG:-/tmp/hw_r3b.log}
PY="python -u"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1750 $PY "$@" 2>&1 | tee -a "$LOG"
}

echo "### hw_session $(date)" | tee -a "$LOG"

# -1. the decisive question first: are lane-unaligned window DMAs legal?
# (kills dual planes + alignment waste => one-chunk cap=128 configs fit)
run tools/unaligned_probe.py

# 0. baseline re-pin (chip-day drift): shipped config, same session
run tools/perf_v3.py --n 100000 --resorts 1,4,8

# 1. the A/B (valid only if the unaligned probe passed): exact-start fetch
# with one-chunk windows — CPU-validated bitwise vs the shipped engine at
# overflow 0 (tools/flen_probe.py + the planes=1 interpret parity runs)
run tools/perf_v3.py --n 100000 --seg-q 1 --cap 128 --planes 1 --resorts 1,4,8
run tools/perf_v3.py --n 100000 --qb 8 --seg-q 1 --cap 128 --planes 1 --resorts 4,8
# exact-start fetch alone (kills the dual build, keeps geometry): isolates
# the unaligned-DMA cost inside the real kernels
run tools/perf_v3.py --n 100000 --planes 1 --resorts 4,8

# 2. if the A/B wins, the 1M point decides the bench flip
run tools/perf_v3.py --n 1000000 --seg-q 1 --cap 128 --planes 1 --resorts 4,8 --steps 50
run tools/perf_v3.py --n 1000000 --resorts 4,8 --steps 50

echo "### done $(date)" | tee -a "$LOG"

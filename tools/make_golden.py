#!/usr/bin/env python3
"""Generate golden drop-test fixtures by running the C reference headlessly.

Copies /root/reference/pi_sph_fluid.c to a build dir, applies a minimal
harness patch (all patch code is authored here, none enters the framework):

* stub out the ssd1306 display driver (the submodule isn't vendored),
* disable the REALTIME spin-wait so the loop free-runs,
* bound the main loop and dump the raw fluid state (+ framebuffer) every
  K steps to a binary file,
* draw metaballs every step instead of on a wall-clock timer.

Compiled single-threaded at -O2 (IEEE float32, no -Ofast reassociation) so
the golden run is deterministic and bit-stable; parity tolerances in
tests/test_parity.py absorb the remaining fused-op differences.

Usage: python tools/make_golden.py [--steps N] [--dump-every K] [--out F.npz]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REFERENCE = "/root/reference/pi_sph_fluid.c"

STUB_DISPLAY = """\
#include <unistd.h>
static void ssd1306_128x64_i2c_init(void){}
static void ssd1306_drawBufferFast(int x, int y, int w, int h, unsigned char *b){
    (void)x; (void)y; (void)w; (void)h; (void)b; usleep(100000);
}
"""

HARNESS = """\
/* ---- test-fixture harness (not part of the reference) ---- */
#include <stdint.h>
static int harness_step = 0;
static int harness_max_steps = 2000;
static int harness_dump_every = 10;
static FILE *harness_file = NULL;
static int harness_tick(struct particle *fluid, int n_fluid, unsigned char *draw_buffer){
    if(!harness_file){
        const char *path = getenv("HARNESS_OUT");
        harness_file = fopen(path ? path : "golden.bin", "wb");
        const char *ms = getenv("HARNESS_STEPS"); if(ms) harness_max_steps = atoi(ms);
        const char *de = getenv("HARNESS_DUMP_EVERY"); if(de) harness_dump_every = atoi(de);
        int32_t n = (int32_t)n_fluid; fwrite(&n, 4, 1, harness_file);
    }
    if(harness_step % harness_dump_every == 0){
        int32_t s = (int32_t)harness_step;
        fwrite(&s, 4, 1, harness_file);
        fwrite(fluid, sizeof(struct particle), n_fluid, harness_file);
        fwrite(draw_buffer, 1, 1024, harness_file);
    }
    if(harness_step++ >= harness_max_steps){ fclose(harness_file); exit(0); }
    return 1;
}
"""

PATCHES = [
    # display stubs instead of the absent ssd1306 library
    ("#include <ssd1306.h>", STUB_DISPLAY),
    # free-run (benchmark mode): the reference's own documented switch
    ("#define REALTIME  ", "// #define REALTIME  "),
    # inject the harness after the data-model definitions
    (
        "typedef struct { float x, y; } float2;",
        "typedef struct { float x, y; } float2;\n" + HARNESS,
    ),
    # bound the loop + dump; drop the omp parallel region (built single-thread)
    (
        "    #pragma omp parallel num_threads(4)\n    while(1){",
        "    while(harness_tick(fluid, n_fluid, draw_buffer)){",
    ),
    # draw deterministically every step instead of on a wall-clock timer
    (
        "if((now.tv_sec-last_drew.tv_sec)*1000000000 + (now.tv_nsec-last_drew.tv_nsec) > 1000000000/60){",
        "if(1){",
    ),
]


def build_harness(build_dir: str, r: float | None = None) -> str:
    src = open(REFERENCE).read()
    patches = list(PATCHES)
    if r is not None:
        # rescale the scene: everything else (H, DT, V, cell size) derives
        # from R in the reference (pi_sph_fluid.c:11-20), so one constant
        # swap produces the finer-resolution golden (e.g. the ~3k-particle
        # drop of BASELINE.md's parity target at R=0.0226)
        patches.append(("#define R 0.0750f", f"#define R {r:.6f}f"))
    for old, new in patches:
        if old not in src:
            sys.exit(f"patch anchor not found in reference: {old[:60]!r}")
        src = src.replace(old, new, 1)
    c_path = os.path.join(build_dir, "harness.c")
    open(c_path, "w").write(src)
    exe = os.path.join(build_dir, "harness")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, c_path, "-lm", "-lpthread"],
        check=True,
    )
    return exe


def run_harness(exe: str, steps: int, dump_every: int, out_bin: str) -> None:
    env = dict(os.environ, HARNESS_OUT=out_bin, HARNESS_STEPS=str(steps),
               HARNESS_DUMP_EVERY=str(dump_every))
    subprocess.run([exe], check=True, env=env, cwd=os.path.dirname(exe),
                   stdout=subprocess.DEVNULL)


def parse_dump(path: str, steps: int, dump_every: int):
    """struct particle layout: 7 floats x,y,u,v,m,rho,p (pi_sph_fluid.c:26-31)."""
    raw = open(path, "rb").read()
    n = int(np.frombuffer(raw[:4], np.int32)[0])
    rec = 4 + n * 7 * 4 + 1024
    body = raw[4:]
    n_dumps = len(body) // rec
    steps_out, states, framebuffers = [], [], []
    for k in range(n_dumps):
        chunk = body[k * rec:(k + 1) * rec]
        steps_out.append(int(np.frombuffer(chunk[:4], np.int32)[0]))
        parts = np.frombuffer(chunk[4:4 + n * 28], np.float32).reshape(n, 7)
        states.append(parts.copy())
        framebuffers.append(np.frombuffer(chunk[4 + n * 28:], np.uint8).copy())
    return n, np.asarray(steps_out), np.asarray(states), np.asarray(framebuffers)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dump-every", type=int, default=10)
    ap.add_argument("--r", type=float, default=None,
                    help="override the reference's R=0.075 particle spacing "
                         "(0.0226 -> the ~3k-particle BASELINE parity drop)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                  "tests", "fixtures", "golden_drop.npz"))
    args = ap.parse_args()

    build_dir = tempfile.mkdtemp(prefix="sph_golden_")
    try:
        exe = build_harness(build_dir, r=args.r)
        out_bin = os.path.join(build_dir, "golden.bin")
        run_harness(exe, args.steps, args.dump_every, out_bin)
        n, steps, states, fbs = parse_dump(out_bin, args.steps, args.dump_every)
        np.savez_compressed(
            args.out, n_fluid=n, steps=steps, states=states, framebuffers=fbs,
            fields=np.asarray(["x", "y", "u", "v", "m", "rho", "p"]),
            r=np.float64(args.r if args.r is not None else 0.075),
        )
        print(f"golden: n_fluid={n}, {len(steps)} dumps (every {args.dump_every} of "
              f"{args.steps} steps) -> {os.path.abspath(args.out)}")
    finally:
        shutil.rmtree(build_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

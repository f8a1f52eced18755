"""Does Mosaic/v5e support lane-UNALIGNED dynamic-start HBM->VMEM DMAs?

The window kernels currently pay for 128-alignment twice: the dual-plane
candidate encoding (a second 64-shifted copy: +0.3 ms/array/tick to build,
2x HBM) and up to 63 lanes of alignment waste per block window — waste that
is exactly what keeps the one-chunk cap=128 configuration (half the VPU
work; see tools/flen_probe.py) from fitting.  If a DMA may start at an
arbitrary lane offset, both costs vanish: fetch the window at its true
start, flen == w_len.

This probe runs a minimal per-block window-copy kernel twice over the same
data — once from 128-aligned starts, once from odd offsets — checks the
copied bytes against the plain-XLA slice, and times both forms.

Run on hardware: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/unaligned_probe.py
(off-TPU it runs in interpret mode, which validates only the index math).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
K = 8          # candidate rows
CAP = 128      # lanes copied per block
NB = 16        # blocks per tile


def _kernel(starts_s, hbm, out_ref, stage, sem, *, aligned: bool):
    i = pl.program_id(0)
    ib = i % 8
    for b in range(NB):
        a = starts_s[ib, b]
        if aligned:
            a = pl.multiple_of(a, LANE)
        pltpu.make_async_copy(hbm.at[:, pl.ds(a, CAP)], stage.at[b],
                              sem.at[b]).start()
    for b in range(NB):
        a = starts_s[ib, b]
        if aligned:
            a = pl.multiple_of(a, LANE)
        pltpu.make_async_copy(hbm.at[:, pl.ds(a, CAP)], stage.at[b],
                              sem.at[b]).wait()
    for b in range(NB):
        out_ref[0, b] = stage[b]


def window_copy(starts_pad, hbm, n_tiles, aligned, interpret):
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, NB), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, NB, K, CAP), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NB, K, CAP), jnp.float32),
            pltpu.SemaphoreType.DMA((NB,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, aligned=aligned),
        out_shape=jax.ShapeDtypeStruct((n_tiles, NB, K, CAP), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_pad, hbm)


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    rng = np.random.default_rng(0)
    L = 1 << 18
    n_tiles = 64
    hbm = jnp.asarray(rng.standard_normal((K, L)), jnp.float32)

    starts_al = rng.integers(0, (L - 2 * LANE) // LANE,
                             size=(n_tiles, NB)) * LANE
    starts_un = starts_al + rng.integers(1, 127, size=starts_al.shape)
    for tag, starts, aligned in [("aligned", starts_al, True),
                                 ("unaligned", starts_un, False)]:
        pad = (-n_tiles) % 8 + 8
        st_pad = jnp.asarray(np.pad(starts, ((0, pad), (0, 0))), jnp.int32)
        try:
            fn = jax.jit(lambda s, h: window_copy(s, h, n_tiles, aligned,
                                                  interpret))
            out = fn(st_pad, hbm)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{tag}: FAILED to compile/run: {type(e).__name__}: {e}")
            continue
        out_np = np.asarray(out)
        hb = np.asarray(hbm)
        ok = all(
            np.array_equal(out_np[t, b], hb[:, starts[t, b]:starts[t, b] + CAP])
            for t in range(0, n_tiles, 7) for b in range(NB)
        )
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(st_pad, hbm)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{tag}: ok={ok}  {dt:.3f} ms for {n_tiles}x{NB} window copies")


if __name__ == "__main__":
    main()

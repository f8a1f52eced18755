"""Exact-start (planes=1) fetch encoding vs the shipped dual-plane engine.

The dual-plane encoding keeps every window DMA 128-aligned at the cost of
up to 63 waste lanes per block and a second shifted candidate copy per
tick.  planes=1 fetches each window at its true lane offset: flen == w_len,
no plane build.  tools/flen_probe.py shows the one-chunk configuration
(seg_q=1, cap=128) then fits the pool geometry that cap=256 needed before
— half the per-block VPU chunk work.  These tests pin, in interpret mode:

* planes=1 reproduces the shipped engine bitwise in positions (the pair
  sums see the same candidates in the same lane order within the window;
  only stage-internal offsets change, which alters no within-window
  summation grouping that survives to f32 — empirically bitwise in x/y,
  <= 1 ulp in u/v);
* the one-chunk seg_q=1/cap=128 config runs overflow-free at pool
  geometry (window lengths: max 128 at qb=16, 104 at qb=8 — flen_probe);
* the same config under the dual-plane encoding overflows (alignment
  waste pushes flen past cap) and is *counted* — the waste is why
  planes=1 exists.

Hardware legality of lane-unaligned DMA starts is probed separately
(tools/unaligned_probe.py); off-TPU these run the interpreter like every
other kernel test.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.models.scene import build_pool_scene

G = (0.0, -9.81)
STEPS = 12


@pytest.fixture(scope="module")
def scene():
    cfg = SPHConfig(r=math.sqrt(6.35 / 2000))   # ~2k pool: bench geometry
    fluid, braw = build_pool_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    return cfg, fluid, boundary, bgrid


def _run(scene, steps=STEPS, resort=4, **kw):
    cfg, fluid, boundary, bgrid = scene
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, interpret=True, **kw)
    sim = eng.prime(fluid, G)
    multi = jax.jit(eng.make_multi_step(resort_every=resort))
    g = jnp.broadcast_to(jnp.asarray(G, jnp.float32), (steps, 2))
    sim, st = multi(sim, g)
    return eng.unpad(sim), int(jnp.max(st.neighbor_overflow))


@pytest.fixture(scope="module")
def reference(scene):
    return _run(scene, tq=256, qb=16, cap=256, seg_q=2, planes=2)


@pytest.mark.parametrize("kw", [
    dict(tq=256, qb=16, cap=256, seg_q=2, planes=1),   # geometry unchanged
    dict(tq=256, qb=16, cap=128, seg_q=1, planes=1),   # one-chunk windows
    dict(tq=256, qb=8, cap=128, seg_q=1, planes=1),    # one-chunk, headroom
])
def test_planes1_matches_shipped_engine(scene, reference, kw):
    ref, ref_ov = reference
    assert ref_ov == 0
    fl, ov = _run(scene, **kw)
    assert ov == 0, f"planes=1 config overflowed: {ov}"
    np.testing.assert_array_equal(np.asarray(fl.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(fl.y), np.asarray(ref.y))
    np.testing.assert_allclose(np.asarray(fl.u), np.asarray(ref.u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(fl.v), np.asarray(ref.v), atol=1e-7)


def test_dual_plane_waste_is_counted_at_cap128(scene):
    """Why planes=1 exists: under the dual-plane encoding the same
    one-chunk config overflows (w_len <= 128 but alignment waste pushes
    flen over cap) — and the overflow is counted, never silent."""
    cfg, fluid, boundary, bgrid = scene
    eng = WindowEngine(cfg, boundary, bgrid, fluid.n,
                       tq=256, qb=16, cap=128, seg_q=1, planes=2,
                       interpret=True)
    packed = eng._initial_packed(fluid)
    _, ctx, overflow = jax.jit(eng._relayout)(packed)
    assert int(overflow) > 0
    # same relayout, exact-start fetch: every window fits
    eng1 = WindowEngine(cfg, boundary, bgrid, fluid.n,
                        tq=256, qb=16, cap=128, seg_q=1, planes=1,
                        interpret=True)
    _, _, overflow1 = jax.jit(eng1._relayout)(packed)
    assert int(overflow1) == 0


def test_window_domain_planes1_matches_planes2():
    """The exact-start encoding inside shard_map: a 2-slab WindowDomain
    with planes=1 must reproduce the dual-plane domain bitwise (same
    windows, same candidates — only the fetch encoding differs)."""
    from jax.sharding import Mesh
    from pi_sph_fluid_tpu.models.scene import build_dam_break_scene
    from pi_sph_fluid_tpu.parallel.domain_window import WindowDomain

    cfg = SPHConfig()
    fluid, braw = build_dam_break_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    devs = jax.devices()
    assert len(devs) >= 2
    mesh = Mesh(np.asarray(devs[:2]), ("x",))
    g = jnp.asarray(G, jnp.float32)

    outs = []
    for planes in (2, 1):
        dd = WindowDomain(cfg, boundary, bgrid, fluid.n, mesh,
                          tq=32, qb=8, cap=256, seg_q=2, planes=planes,
                          interpret=True)
        state = dd.init(fluid)
        step = jax.jit(dd.make_step())
        for _ in range(6):
            state, st = step(state, g)
        assert int(st["n_valid"]) == fluid.n
        assert int(st["overflow"]) == 0
        outs.append(dd.gather(state))
    np.testing.assert_array_equal(np.asarray(outs[0].x), np.asarray(outs[1].x))
    np.testing.assert_array_equal(np.asarray(outs[0].y), np.asarray(outs[1].y))

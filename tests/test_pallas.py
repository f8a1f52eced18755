"""Pallas engine vs the jnp oracle: identical physics, different machine.

Runs the fused kernels in interpreter mode on CPU (the Pallas analog of the
reference's compile-time backend substitution, SURVEY.md §4) and checks the
whole pipeline — prime, single step, multi-step trajectory — against
models/simulation.py on the same scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.engine_pallas import PallasDims, PallasEngine
from pi_sph_fluid_tpu.models.scene import build_dam_break_scene, build_drop_scene
from pi_sph_fluid_tpu.models.simulation import make_step, prime

G = (0.0, -9.81)
DIMS = PallasDims(tq=32, cap=256, capb=128, interpret=True)


def _by_id_oracle(sim):
    inv = np.argsort(np.asarray(sim.ids))
    return {f: np.asarray(getattr(sim.fluid, f))[inv] for f in sim.fluid._fields}


def _by_id_engine(eng, sim):
    fl = eng.unpad(sim)
    return {f: np.asarray(getattr(fl, f)) for f in fl._fields}


@pytest.fixture(scope="module")
def scene():
    cfg = SPHConfig()  # default drop scene, 441-particle dam would also work
    fluid, braw = build_dam_break_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    return cfg, fluid, boundary, bgrid


@pytest.fixture(scope="module")
def engine(scene):
    cfg, fluid, boundary, bgrid = scene
    return PallasEngine(cfg, boundary, bgrid, fluid.n, DIMS)


def test_pallas_prime_matches_oracle(scene, engine):
    cfg, fluid, boundary, bgrid = scene
    psim = engine.prime(fluid, G)
    osim = prime(fluid, boundary, bgrid, G, cfg)
    p = _by_id_engine(engine, psim)
    o = _by_id_oracle(osim)
    assert np.isfinite(np.asarray(psim.au)).all()
    np.testing.assert_allclose(p["rho"], o["rho"], rtol=1e-6)
    np.testing.assert_allclose(p["p"], o["p"], rtol=1e-4, atol=0.05)

    # accelerations through both permutations
    ids_p = np.asarray(psim.ids)
    sel = np.nonzero(ids_p >= 0)[0]
    pinv = sel[np.argsort(ids_p[sel])]
    oinv = np.argsort(np.asarray(osim.ids))
    np.testing.assert_allclose(np.asarray(psim.au)[pinv], np.asarray(osim.au)[oinv],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(psim.av)[pinv], np.asarray(osim.av)[oinv],
                               rtol=1e-4, atol=1e-3)


def test_pallas_trajectory_matches_oracle(scene, engine):
    cfg, fluid, boundary, bgrid = scene
    sim = engine.prime(fluid, G)
    step = engine.make_step()
    overflow = 0
    for _ in range(20):
        sim, st = step(sim, jnp.asarray(G, jnp.float32))
        overflow += int(st.neighbor_overflow)
    assert overflow == 0

    osim = prime(fluid, boundary, bgrid, G, cfg)
    ostep = jax.jit(make_step(cfg, boundary, bgrid))
    for _ in range(20):
        osim, _ = ostep(osim, jnp.asarray(G, jnp.float32))

    p = _by_id_engine(engine, sim)
    o = _by_id_oracle(osim)
    np.testing.assert_allclose(p["x"], o["x"], atol=2e-6)
    np.testing.assert_allclose(p["y"], o["y"], atol=2e-6)
    np.testing.assert_allclose(p["u"], o["u"], atol=2e-4)
    np.testing.assert_allclose(p["v"], o["v"], atol=2e-4)


def test_pallas_pads_stay_inert(scene, engine):
    cfg, fluid, boundary, bgrid = scene
    assert engine.n_layout > fluid.n  # layout must actually contain pads
    sim = engine.prime(fluid, G)
    step = engine.make_step()
    for _ in range(3):
        sim, _ = step(sim, jnp.asarray(G, jnp.float32))
    pads = np.asarray(sim.ids) < 0
    assert pads.sum() == engine.n_layout - fluid.n
    assert np.all(np.asarray(sim.fluid.m)[pads] == 0.0)
    assert np.all(np.asarray(sim.au)[pads] == 0.0)
    assert np.all(np.asarray(sim.fluid.u)[pads] == 0.0)
    assert np.isfinite(np.asarray(sim.fluid.x)[~pads]).all()
    # no particle lost or duplicated
    ids = np.asarray(sim.ids)[~pads]
    assert sorted(ids) == list(range(fluid.n))


def test_drop_scene_matches_oracle():
    """The 269-particle reference drop scene through the Pallas engine."""
    cfg = SPHConfig()
    fluid, braw = build_drop_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    eng = PallasEngine(cfg, boundary, bgrid, fluid.n, DIMS)
    sim = eng.prime(fluid, G)
    osim = prime(fluid, boundary, bgrid, G, cfg)
    p = _by_id_engine(eng, sim)
    o = _by_id_oracle(osim)
    np.testing.assert_allclose(p["rho"], o["rho"], rtol=1e-6)


def test_span_overflow_reported_not_silent(scene):
    """Capacity losses must be counted: shrink the span cap below the real
    span lengths and assert the spans module reports the loss (the engine
    sums exactly these counters into StepStats.neighbor_overflow)."""
    import jax.numpy as jnp2
    from pi_sph_fluid_tpu.ops.grid import cell_ids
    from pi_sph_fluid_tpu.ops.pallas.spans import (
        build_row_layout, layout_size, layout_spans,
    )

    cfg, fluid, boundary, bgrid = scene
    tq = 64
    rowcap, n_layout = layout_size(cfg, fluid.n, tq, 1.35)
    keys = cell_ids(fluid.x, fluid.y, cfg)
    order = jnp2.argsort(keys, stable=True)
    counts = jnp2.zeros(cfg.n_cells + 2, jnp2.int32).at[keys + 1].add(1)
    cell_starts = jnp2.cumsum(counts, dtype=jnp2.int32)
    layout = build_row_layout(n_layout, cell_starts, cfg, rowcap)
    cells = jnp2.where(layout.valid, keys[order][jnp2.minimum(layout.src, fluid.n - 1)],
                       cfg.n_cells)
    big = layout_spans(layout, cells, cell_starts, cell_starts, cfg,
                       rowcap, tq, cap=4096, target_rowcap=rowcap)
    assert int(big.overflow) == 0
    max_need = int(jnp2.max(big.start % 128 + big.length))
    small = layout_spans(layout, cells, cell_starts, cell_starts, cfg,
                         rowcap, tq, cap=max_need - 1, target_rowcap=rowcap)
    assert int(small.overflow) > 0


def test_row_capacity_loss_reported(scene):
    """Particles beyond a row's capacity are counted as lost, never silent."""
    from pi_sph_fluid_tpu.ops.grid import cell_ids
    from pi_sph_fluid_tpu.ops.pallas.spans import build_row_layout

    cfg, fluid, boundary, bgrid = scene
    keys = cell_ids(fluid.x, fluid.y, cfg)
    counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
    cell_starts = jnp.cumsum(counts, dtype=jnp.int32)
    tiny_rowcap = 8
    layout = build_row_layout(fluid.n, cell_starts, cfg, tiny_rowcap)
    assert int(layout.lost) > 0
    assert int(layout.lost) == fluid.n - int(jnp.sum(layout.valid))


def test_pallas_renderer_matches_jnp(scene, engine):
    """The span-kernel renderer equals the jnp gather renderer pixel-exactly
    (interpret mode; validated on hardware at 10k/1M in round-1 drives)."""
    from pi_sph_fluid_tpu.ops.grid import build_grid
    from pi_sph_fluid_tpu.render.metaballs import make_renderer, unpack_framebuffer
    from pi_sph_fluid_tpu.render.metaballs_pallas import PallasRenderer

    cfg, fluid, boundary, bgrid = scene
    sim = engine.prime(fluid, G)
    pren = PallasRenderer(engine, interpret=True)
    fb_pallas = np.asarray(pren.render(sim))

    fl = engine.unpad(sim)
    g0 = build_grid(fl.x, fl.y, cfg)
    fls = fl.permute(g0.order)
    fb_jnp = np.asarray(make_renderer(cfg, cap=256)(fls))
    np.testing.assert_array_equal(unpack_framebuffer(fb_pallas), unpack_framebuffer(fb_jnp))


def test_sticky_layout_matches_exact(scene, engine):
    """resort_every > 1 reuses carried spans; at pool speeds the result is
    bit-identical in positions (missed pairs live only at the support fringe
    where the Wendland weight vanishes)."""
    cfg, fluid, boundary, bgrid = scene
    sim0 = engine.prime(fluid, G)
    g = jnp.broadcast_to(jnp.asarray(G, jnp.float32), (8, 2))
    exact = engine.make_multi_step(resort_every=1)
    sticky = engine.make_multi_step(resort_every=4)
    a, sa = exact(sim0, g)
    b, sb = sticky(sim0, g)
    fa = engine.unpad(a)
    fb = engine.unpad(b)
    np.testing.assert_allclose(np.asarray(fa.x), np.asarray(fb.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fa.u), np.asarray(fb.u), atol=1e-5)
    assert sb.max_speed.shape == (8,)

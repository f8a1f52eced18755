"""Drop-test trajectory parity vs the C reference at the ~3k-particle scale.

BASELINE.md's parity target is "~3k particles, bit-comparable density/
position trajectories" — an 11x finer drop than the reference's shipped
R=0.075 scene (269 fluid).  The golden fixture is the reference itself
recompiled at R=0.0226 (tools/make_golden.py --r 0.0226 --steps 2000
--dump-every 100): 3021 fluid + 532 boundary particles, everything else
(H, DT, V, grid) deriving from R exactly as in `pi_sph_fluid.c:11-20`.

Measured parity of the float32 jnp path against that run (all 2000 steps
pre-impact: the blob free-falls ~15 cm of its 30 cm drop, with live
pressure/viscosity dynamics from the deficient-density surface):

    scene:      positions/masses bitwise identical (3021 particles)
    step 500:   |dpos| <= 2.4e-7 (one ulp of the domain coordinate)
    step 2000:  |dpos| <= 4.9e-6, max rho rel err <= 3.1e-5

Tolerances below pin that with ~10x headroom against platform FP variation
(fma fusion etc.), same policy as tests/test_parity.py.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.scene import build_drop_scene
from pi_sph_fluid_tpu.models.simulation import make_multi_step, prime

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_drop_3k.npz"
CFG = SPHConfig(r=0.0226)
G = (0.0, -9.81)

pytestmark = pytest.mark.skipif(not FIXTURE.exists(), reason="golden fixture missing")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def trajectory(golden):
    """Run the framework to step 2000, capturing state at each golden dump."""
    fluid, braw = build_drop_scene(CFG)
    boundary, bgrid = prepare_boundary(braw, CFG)
    sim = prime(fluid, boundary, bgrid, G, CFG)
    multi = jax.jit(make_multi_step(CFG, boundary, bgrid))
    g100 = jnp.broadcast_to(jnp.asarray(G, jnp.float32), (100, 2))

    captured = {0: sim}
    step = 0
    while step < 2000:
        sim, _ = multi(sim, g100)
        step += 100
        captured[step] = sim
    return captured


def unsorted(sim):
    inv = np.argsort(np.asarray(sim.ids))
    return {f: np.asarray(getattr(sim.fluid, f))[inv] for f in sim.fluid._fields}


def test_scene_is_bitwise_identical_at_3k(golden):
    fluid, braw = build_drop_scene(CFG)
    assert fluid.n == int(golden["n_fluid"]) == 3021
    gs = golden["states"][0]
    np.testing.assert_array_equal(np.asarray(fluid.x), gs[:, 0])
    np.testing.assert_array_equal(np.asarray(fluid.y), gs[:, 1])
    np.testing.assert_array_equal(np.asarray(fluid.m), gs[:, 4])


def test_primed_density_and_pressure_at_3k(golden, trajectory):
    gs = golden["states"][0]
    ours = unsorted(trajectory[0])
    np.testing.assert_allclose(ours["rho"], gs[:, 5], rtol=3e-6)
    np.testing.assert_allclose(ours["p"], gs[:, 6], rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("step,pos_tol,vel_tol", [
    (500, 3e-6, 5e-4),
    (1000, 1e-5, 5e-4),
    (2000, 5e-5, 2e-3),
])
def test_trajectory_parity_at_3k(golden, trajectory, step, pos_tol, vel_tol):
    dump = int(step) // 100
    assert int(golden["steps"][dump]) == step
    gs = golden["states"][dump]
    ours = unsorted(trajectory[step])
    np.testing.assert_allclose(ours["x"], gs[:, 0], atol=pos_tol)
    np.testing.assert_allclose(ours["y"], gs[:, 1], atol=pos_tol)
    np.testing.assert_allclose(ours["u"], gs[:, 2], atol=vel_tol)
    np.testing.assert_allclose(ours["v"], gs[:, 3], atol=vel_tol)


def test_density_parity_at_3k_2000(golden, trajectory):
    gs = golden["states"][20]
    ours = unsorted(trajectory[2000])
    np.testing.assert_allclose(ours["rho"], gs[:, 5], rtol=3e-4)


def test_window_engine_trajectory_parity_at_3k(golden):
    """The PRODUCTION engine (WindowEngine, interpret mode) vs the C
    golden at 3k — the FULL 2000-step fixture with the same per-step
    gates as the oracle's test_trajectory_parity_at_3k (round 5 extended
    this from step 500: warm interpret steps cost ~10 ms each, so the
    whole fixture is ~20 s of stepping — VERDICT r4 #7a).  Round 3's
    parity chain went engine~=oracle and oracle~=C; this gates the
    shipping engine against the C trajectory end-to-end.  Reference: the
    drop loop `pi_sph_fluid.c:604-644`."""
    from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine

    fluid, braw = build_drop_scene(CFG)
    boundary, bgrid = prepare_boundary(braw, CFG)
    # cap=384: the 256 default overflows by 16 lanes late in this fine-
    # resolution fall (sparse free-surface blocks — the CLI run default is
    # 384 for exactly this, and elastic recovery would grow it); parity
    # needs the window cap clear of the physics
    eng = WindowEngine(CFG, boundary, bgrid, fluid.n, cap=384,
                       interpret=True)
    sim = eng.prime(fluid, G)
    multi = jax.jit(eng.make_multi_step())
    g100 = jnp.broadcast_to(jnp.asarray(G, jnp.float32), (100, 2))
    gates = {500: (3e-6, 5e-4), 1000: (1e-5, 5e-4), 2000: (5e-5, 2e-3)}
    worst_ov = 0
    for k in range(1, 21):
        sim, st = multi(sim, g100)
        worst_ov = max(worst_ov, int(jnp.max(st.neighbor_overflow)))
        step = k * 100
        if step not in gates:
            continue
        pos_tol, vel_tol = gates[step]
        ours = eng.unpad(sim)      # id order — the golden's ordering
        gs = golden["states"][k]
        assert int(golden["steps"][k]) == step
        np.testing.assert_allclose(np.asarray(ours.x), gs[:, 0], atol=pos_tol)
        np.testing.assert_allclose(np.asarray(ours.y), gs[:, 1], atol=pos_tol)
        np.testing.assert_allclose(np.asarray(ours.u), gs[:, 2], atol=vel_tol)
        np.testing.assert_allclose(np.asarray(ours.v), gs[:, 3], atol=vel_tol)
        np.testing.assert_allclose(np.asarray(ours.rho), gs[:, 5], rtol=3e-4)
    assert worst_ov == 0


def test_dd_trajectory_parity_at_3k(golden):
    """The DISTRIBUTED backend (WindowDomain, 4 virtual slabs, interpret)
    directly vs the C golden — 200 steps.  Before round 5, dd parity was
    transitive (dd == single-engine at small scenes, engine == C here);
    this gates the dd pipeline — migration, halo exchange, per-slab
    relayout, ghost densities — against the C trajectory itself (VERDICT
    r4 #7b).  Reference: the drop loop `pi_sph_fluid.c:604-644` + the
    parallelism row `pi_sph_fluid.c:610`.

    Measured divergence (2026-08-19, this exact configuration): step 100
    pos <= 9.1e-6 / vel <= 1.2e-3 / rho rel <= 2.9e-4; step 200 pos <=
    1.7e-5 / vel <= 8.7e-4 / rho rel <= 3.8e-4.  dd drifts from the C sum
    order faster than the single-chip engine (which gates 3e-6 at step
    500): ghost densities are *recomputed locally* at slab borders and
    per-slab windows reorder the pair sums, an ulp-scale perturbation the
    dynamics amplify per step exactly like any FP reassociation.  Gates
    carry ~3x headroom over the measured values, same policy as
    test_parity.py."""
    from jax.sharding import Mesh

    from pi_sph_fluid_tpu.parallel.domain_window import WindowDomain

    fluid, braw = build_drop_scene(CFG)
    boundary, bgrid = prepare_boundary(braw, CFG)
    devs = jax.devices()
    assert len(devs) >= 4, "conftest provides 8 virtual CPU devices"
    dd = WindowDomain(CFG, boundary, bgrid, fluid.n,
                      Mesh(np.asarray(devs[:4]), ("x",)), interpret=True)
    state = dd.init(fluid)
    multi = jax.jit(dd.make_multi_step())
    g100 = jnp.broadcast_to(jnp.asarray(G, jnp.float32), (100, 2))
    for _ in range(2):
        state, st = multi(state, g100)
        assert int(np.max(np.asarray(st["overflow"]))) == 0
        assert int(np.asarray(st["n_valid"])[-1]) == fluid.n
    ours = dd.gather(state)        # id order — the golden's ordering
    gs = golden["states"][2]
    assert int(golden["steps"][2]) == 200
    np.testing.assert_allclose(np.asarray(ours.x), gs[:, 0], atol=5e-5)
    np.testing.assert_allclose(np.asarray(ours.y), gs[:, 1], atol=5e-5)
    np.testing.assert_allclose(np.asarray(ours.u), gs[:, 2], atol=3e-3)
    np.testing.assert_allclose(np.asarray(ours.v), gs[:, 3], atol=3e-3)
    np.testing.assert_allclose(np.asarray(ours.rho), gs[:, 5], rtol=1e-3)


def test_framebuffer_parity_at_3k(golden):
    """Render from the golden C positions at 3k (11x the shipped particle
    count on the same 128x64 raster) and compare to the C framebuffer —
    same policy as test_render.py: >=99.5% agreement, exact away from the
    threshold."""
    from pi_sph_fluid_tpu.models.scene import pixel_centers
    from pi_sph_fluid_tpu.ops.grid import build_grid
    from pi_sph_fluid_tpu.render.metaballs import metaball_field, unpack_framebuffer

    px, py = pixel_centers(CFG)
    px, py = jnp.asarray(px), jnp.asarray(py)
    for dump in (10, 20):  # steps 1000, 2000
        gs = golden["states"][dump]
        gbuf = golden["framebuffers"][dump]
        x = jnp.asarray(gs[:, 0])
        y = jnp.asarray(gs[:, 1])
        grid = build_grid(x, y, CFG)
        xs, ys = x[grid.order], y[grid.order]
        grid2 = build_grid(xs, ys, CFG)
        field = np.asarray(metaball_field(px, py, xs, ys, grid2, CFG, cap=128))
        ours = field >= 1.0
        theirs = unpack_framebuffer(gbuf).ravel()
        agree = (ours == theirs).mean()
        assert agree > 0.995, f"dump {dump}: framebuffer agreement {agree:.4f}"
        confident = np.abs(field - 1.0) > 1e-3
        np.testing.assert_array_equal(ours[confident], theirs[confident])

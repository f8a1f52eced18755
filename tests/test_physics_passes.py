"""Pass-level validation of density / pseudo-mass / forces against the
independent float64 brute-force oracle (tests/oracle.py)."""

import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.scene import build_drop_scene
from pi_sph_fluid_tpu.models.simulation import prime
from pi_sph_fluid_tpu.ops.density import density_pass
from pi_sph_fluid_tpu.ops.forces import acceleration_pass
from pi_sph_fluid_tpu.ops.grid import build_grid
from pi_sph_fluid_tpu.ops.neighbors import gather_candidates
from pi_sph_fluid_tpu.core.eos import tait_pressure

from oracle import Oracle

CFG = SPHConfig()


@pytest.fixture(scope="module")
def scene():
    fluid, boundary_raw = build_drop_scene(CFG)
    boundary, bgrid = prepare_boundary(boundary_raw, CFG)
    return fluid, boundary_raw, boundary, bgrid


@pytest.fixture(scope="module")
def oracle():
    return Oracle(CFG)


def test_boundary_pseudo_mass_matches_oracle(scene, oracle):
    _, boundary_raw, boundary, _ = scene
    bx = np.asarray(boundary_raw.x, np.float64)
    by = np.asarray(boundary_raw.y, np.float64)
    psi_oracle = oracle.boundary_psi(bx, by, CFG.rho_0)
    # boundary is grid-sorted; compare as sorted multisets of values per position
    got = {}
    for x, y, m in zip(np.asarray(boundary.x), np.asarray(boundary.y), np.asarray(boundary.m)):
        got[(float(x), float(y))] = float(m)
    for x, y, psi in zip(bx, by, psi_oracle):
        assert got[(float(np.float32(x)), float(np.float32(y)))] == pytest.approx(psi, rel=1e-4)


def _sorted_state_and_candidates(fluid, boundary, bgrid):
    grid = build_grid(fluid.x, fluid.y, CFG)
    fs = fluid.permute(grid.order)
    cand_ff = gather_candidates(fs.x, fs.y, grid, CFG)
    cand_fb = gather_candidates(fs.x, fs.y, bgrid, CFG)
    return fs, grid, cand_ff, cand_fb


def test_density_matches_oracle(scene, oracle):
    fluid, boundary_raw, boundary, bgrid = scene
    fs, grid, cand_ff, cand_fb = _sorted_state_and_candidates(fluid, boundary, bgrid)
    rho = np.asarray(density_pass(fs, boundary, cand_ff, cand_fb, CFG))

    psi = oracle.boundary_psi(np.asarray(boundary.x, np.float64), np.asarray(boundary.y, np.float64), CFG.rho_0)
    rho_oracle = oracle.density(
        np.asarray(fs.x, np.float64), np.asarray(fs.y, np.float64), np.asarray(fs.m, np.float64),
        np.asarray(boundary.x, np.float64), np.asarray(boundary.y, np.float64), psi,
    )
    np.testing.assert_allclose(rho, rho_oracle, rtol=2e-5)


def test_accelerations_match_oracle(scene, oracle):
    fluid, boundary_raw, boundary, bgrid = scene
    fs, grid, cand_ff, cand_fb = _sorted_state_and_candidates(fluid, boundary, bgrid)
    rho = density_pass(fs, boundary, cand_ff, cand_fb, CFG)
    p = tait_pressure(rho, CFG)
    fs = fs._replace(rho=rho, p=p)
    # give particles some velocity so viscosity terms activate
    rng = np.random.default_rng(1)
    u = rng.normal(0, 1.0, fs.n).astype(np.float32)
    v = rng.normal(0, 1.0, fs.n).astype(np.float32)
    fs = fs._replace(u=u, v=v)

    au, av = acceleration_pass(fs, boundary, cand_ff, cand_fb, 0.3, -9.81, CFG)

    psi = np.asarray(boundary.m, np.float64)
    au_o, av_o = oracle.accelerations(
        np.asarray(fs.x, np.float64), np.asarray(fs.y, np.float64),
        u.astype(np.float64), v.astype(np.float64),
        np.asarray(fs.m, np.float64), np.asarray(fs.rho, np.float64), np.asarray(fs.p, np.float64),
        np.asarray(boundary.x, np.float64), np.asarray(boundary.y, np.float64), psi,
        0.3, -9.81,
    )
    scale = np.maximum(np.abs(au_o), 1.0)
    np.testing.assert_allclose(np.asarray(au) / scale, au_o / scale, atol=2e-3)
    scale = np.maximum(np.abs(av_o), 1.0)
    np.testing.assert_allclose(np.asarray(av) / scale, av_o / scale, atol=2e-3)


def test_prime_matches_manual_pipeline(scene):
    fluid, _, boundary, bgrid = scene
    sim = prime(fluid, boundary, bgrid, (0.0, -9.81), CFG)
    fs, grid, cand_ff, cand_fb = _sorted_state_and_candidates(fluid, boundary, bgrid)
    rho = density_pass(fs, boundary, cand_ff, cand_fb, CFG)
    np.testing.assert_allclose(np.asarray(sim.fluid.rho), np.asarray(rho), rtol=1e-6)
    # ids invert the sort
    ids = np.asarray(sim.ids)
    assert sorted(ids) == list(range(fluid.n))

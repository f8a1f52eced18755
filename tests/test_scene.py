"""Scene builder tests: exact reference counts and float32 lattice semantics
(`pi_sph_fluid.c:484-540`, SURVEY.md §2 #12: 269 fluid + 162 boundary)."""

import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.scene import (
    build_box_boundary,
    build_dam_break_scene,
    build_drop_scene,
    float32_lattice,
    pixel_centers,
)

CFG = SPHConfig()


def test_lattice_is_float32_accumulation():
    xs = float32_lattice(4.0, 0.075)
    # C accumulates in float: xs[k] != k*R exactly for large k
    assert xs.dtype == np.float32
    a = np.float32(0.0)
    for v in xs:
        assert v == a
        a = np.float32(a + np.float32(0.075))
    assert xs[-1] < np.float32(4.0)


def test_reference_particle_counts():
    fluid, boundary = build_drop_scene(CFG)
    assert fluid.n == 269
    assert boundary.n == 162


def test_fluid_init_values():
    fluid, _ = build_drop_scene(CFG)
    assert np.allclose(np.asarray(fluid.u), 0.0)
    assert np.allclose(np.asarray(fluid.v), 0.0)
    # m = RHO_0 * 0.57 * H^2 (`pi_sph_fluid.c:20,502`)
    assert float(fluid.m[0]) == pytest.approx(1000.0 * 0.57 * CFG.h**2, rel=1e-5)
    assert np.allclose(np.asarray(fluid.rho), 1000.0)
    # all inside the 0.70 m circle at (2, 1)
    d = np.hypot(np.asarray(fluid.x) - 2.0, np.asarray(fluid.y) - 1.0)
    assert d.max() < 0.70


def test_boundary_on_walls():
    b = build_box_boundary(CFG)
    x, y = np.asarray(b.x), np.asarray(b.y)
    on_wall = (x == 0.0) | (np.isclose(x, 4.0)) | (y == 0.0) | (np.isclose(y, 2.0))
    assert on_wall.all()
    assert np.allclose(np.asarray(b.rho), 1000.0)


def test_dam_break_scene():
    fluid, boundary = build_dam_break_scene(CFG)
    x = np.asarray(fluid.x)
    y = np.asarray(fluid.y)
    assert fluid.n > 0
    assert x.max() < 0.4 * CFG.width
    assert y.max() < 0.8 * CFG.height


def test_dam_break_scales_with_spacing():
    # the 2R wall standoff shrinks with r, so the filled area (and count)
    # grows slightly faster than 1/r^2
    small = SPHConfig(r=0.075 / 4)
    fluid, _ = build_dam_break_scene(small)
    base, _ = build_dam_break_scene(CFG)
    assert fluid.n == pytest.approx(base.n * 16, rel=0.15)
    assert fluid.n >= base.n * 16


def test_pixel_centers_match_reference_formula():
    px, py = pixel_centers(CFG)
    assert px.shape == (64 * 128,)
    # pixel (i=0, j=0): x = 0.5*4/128, y = (64-0.5)*2/64  (`pi_sph_fluid.c:573`)
    assert px[0] == pytest.approx(0.5 * 4.0 / 128)
    assert py[0] == pytest.approx(63.5 * 2.0 / 64)
    # pixel (i=63, j=127)
    ij = 63 * 128 + 127
    assert px[ij] == pytest.approx(127.5 * 4.0 / 128)
    assert py[ij] == pytest.approx(0.5 * 2.0 / 64)

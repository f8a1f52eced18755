"""Tait EOS unit tests (`pi_sph_fluid.c:294-301`)."""

import jax.numpy as jnp
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.core.eos import tait_pressure

CFG = SPHConfig()
B = CFG.c**2 * CFG.rho_0 / 7.0


def test_b_constant():
    assert CFG.tait_b == pytest.approx(2.2857143e7, rel=1e-6)


def test_pressure_at_reference_density_is_zero():
    assert float(tait_pressure(jnp.float32(CFG.rho_0), CFG)) == pytest.approx(0.0, abs=1.0)


def test_pressure_compressed():
    rho = 1.01 * CFG.rho_0
    expected = B * (1.01**7 - 1)
    assert float(tait_pressure(jnp.float32(rho), CFG)) == pytest.approx(expected, rel=1e-4)


def test_negative_pressure_clamped():
    # the reference's explicit "hack" (`pi_sph_fluid.c:299`)
    assert float(tait_pressure(jnp.float32(0.95 * CFG.rho_0), CFG)) == 0.0


def test_vectorised():
    rho = jnp.asarray([900.0, 1000.0, 1020.0], jnp.float32)
    p = tait_pressure(rho, CFG)
    assert p.shape == (3,)
    assert float(p[0]) == 0.0
    assert float(p[2]) > 0.0

"""Unit tests for the Wendland C2 kernel against closed forms.

Reference math: `pi_sph_fluid.c:45-62` / README.md:65-88 — W(q) =
7/(4 pi H^2) (1-q/2)^4 (1+2q) on q<2, dW/dq = -(35/(4 pi H^2)) q (1-q/2)^3.
Expected values here are computed independently in float64.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.core.kernels import kernel_grad_w, kernel_w, kernel_w_scalar, w_at_q, w_self

CFG = SPHConfig()
H = CFG.h
NORM = 7.0 / (4.0 * math.pi * H * H)


def w_closed_form(r):
    q = r / H
    if q >= 2.0:
        return 0.0
    return NORM * (1 - 0.5 * q) ** 4 * (1 + 2 * q)


def test_w_at_zero_is_norm():
    assert float(w_at_q(0.0, CFG)) == pytest.approx(NORM, rel=1e-6)
    assert w_self(CFG) == pytest.approx(NORM, rel=1e-6)


@pytest.mark.parametrize("q", [0.0, 0.1, 0.2, 0.5, 1.0, 1.5, 1.999])
def test_w_matches_closed_form(q):
    r = q * H
    assert float(kernel_w_scalar(r, CFG)) == pytest.approx(w_closed_form(r), rel=1e-5)


@pytest.mark.parametrize("q", [2.0, 2.5, 10.0])
def test_w_compact_support(q):
    # the C code omits this branch; callers pre-filter. Vectorised form masks.
    assert float(kernel_w_scalar(q * H, CFG)) == 0.0


def test_w_from_coordinates():
    dx, dy = 0.03, -0.04  # r = 0.05
    assert float(kernel_w(dx, dy, CFG)) == pytest.approx(w_closed_form(0.05), rel=1e-5)


@pytest.mark.parametrize("angle", [0.0, 0.7, 2.1])
@pytest.mark.parametrize("q", [0.05, 0.3, 1.0, 1.8])
def test_grad_w_matches_finite_difference(q, angle):
    r = q * H
    dx, dy = r * math.cos(angle), r * math.sin(angle)
    eps = 1e-4
    gx, gy = kernel_grad_w(dx, dy, CFG)
    num_gx = (w_closed_form(math.hypot(dx + eps, dy)) - w_closed_form(math.hypot(dx - eps, dy))) / (2 * eps)
    num_gy = (w_closed_form(math.hypot(dx, dy + eps)) - w_closed_form(math.hypot(dx, dy - eps))) / (2 * eps)
    assert float(gx) == pytest.approx(num_gx, rel=2e-3, abs=1e-3)
    assert float(gy) == pytest.approx(num_gy, rel=2e-3, abs=1e-3)


def test_grad_w_closed_form_direction():
    # grad at (dx, 0) is (dW/dq / H, 0)
    q = 0.8
    dx = q * H
    gx, gy = kernel_grad_w(dx, 0.0, CFG)
    dw_dq = NORM * (-5.0) * q * (1 - 0.5 * q) ** 3
    assert float(gx) == pytest.approx(dw_dq / H, rel=1e-5)
    assert float(gy) == 0.0


def test_grad_w_zero_at_coincident_pair():
    # reference divides by r (NaN at r=0, `pi_sph_fluid.c:58-59`); our
    # reformulation is exact and finite: grad -> 0 as r -> 0.
    gx, gy = kernel_grad_w(0.0, 0.0, CFG)
    assert float(gx) == 0.0 and float(gy) == 0.0
    assert not np.isnan(float(gx))


def test_grad_w_masked_outside_support():
    gx, gy = kernel_grad_w(2.5 * H, 0.0, CFG)
    assert float(gx) == 0.0 and float(gy) == 0.0


def test_vectorised_shapes():
    r = jnp.linspace(0.0, 3 * H, 64).reshape(8, 8)
    assert kernel_w_scalar(r, CFG).shape == (8, 8)
    gx, gy = kernel_grad_w(r, r, CFG)
    assert gx.shape == (8, 8)

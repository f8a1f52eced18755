"""Wendland C2 smoothing kernel and its gradient (pure jnp, float32).

Mirrors the math of `pi_sph_fluid.c:45-62` with two deliberate departures the
vectorised formulation requires (SURVEY.md #3):

* **explicit compact-support mask** — the C code never evaluates the kernel at
  q >= 2 because callers pre-filter pairs with ``dist < 2H``
  (`pi_sph_fluid.c:144`).  A vectorised kernel evaluates *every* padded lane,
  so ``W``/``grad_w`` here clamp contributions to zero outside the support.
* **r = 0 guard in the gradient** — the C gradient divides by the pair
  distance with no epsilon (`pi_sph_fluid.c:58-59`), which is NaN for a
  coincident pair.  Self-pairs are excluded by the C neighbor search; our
  padded lanes can alias the query particle, so the gradient masks r == 0
  (the analytic limit of grad W at r -> 0 is 0 anyway: dW/dq ~ -5q).

Everything is computed in float32 to track the C build.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SPHConfig

__all__ = ["kernel_w", "kernel_w_scalar", "kernel_grad_w", "w_self", "w_at_q"]


def w_at_q(q, cfg: SPHConfig):
    """W as a function of the normalised distance q = r/H.

    Wendland C2, 2-D: W(q) = 7/(4 pi H^2) * (1 - q/2)^4 * (1 + 2q) for q < 2,
    else 0.  Matches `pi_sph_fluid.c:45-50` (which omits the q >= 2 branch).
    """
    q = jnp.asarray(q, jnp.float32)
    tmp_1 = 1.0 - 0.5 * q
    tmp_2 = 1.0 + 2.0 * q
    w = jnp.float32(cfg.kernel_norm) * (tmp_1 * tmp_1) * (tmp_1 * tmp_1) * tmp_2
    return jnp.where(q < 2.0, w, 0.0)


def kernel_w_scalar(r, cfg: SPHConfig):
    """W as a function of the pair distance r (any shape, elementwise)."""
    return w_at_q(jnp.asarray(r, jnp.float32) / jnp.float32(cfg.h), cfg)


def kernel_w(dx, dy, cfg: SPHConfig):
    """W from coordinate differences dx = x_i - x_j, dy = y_i - y_j."""
    r = jnp.sqrt(dx * dx + dy * dy)
    return kernel_w_scalar(r, cfg)


def w_self(cfg: SPHConfig) -> float:
    """W(0) = the normalisation constant — the density self-term factor
    (`pi_sph_fluid.c:274`)."""
    return cfg.kernel_norm


def kernel_grad_w(dx, dy, cfg: SPHConfig):
    """grad_i W(|x_i - x_j|/H) as (gx, gy).

    dW/dq = 7/(4 pi H^2) * (-5) * q * (1 - q/2)^3   (`pi_sph_fluid.c:56`)
    grad  = dW/dq * (x_i - x_j) / (r * H)           (`pi_sph_fluid.c:58-61`)

    Substituting q = r/H, the r in dW/dq's leading q cancels the 1/r of the
    direction vector, so the formulation below never divides by r:
        grad = norm * (-5) * (1 - q/2)^3 / H^2 * (dx, dy)
    which is exact (not an epsilon hack) and finite at r = 0, where it
    correctly evaluates to 0.  Zero outside the support q >= 2.
    """
    dx = jnp.asarray(dx, jnp.float32)
    dy = jnp.asarray(dy, jnp.float32)
    h = jnp.float32(cfg.h)
    r = jnp.sqrt(dx * dx + dy * dy)
    q = r / h
    tmp = 1.0 - 0.5 * q
    coeff = jnp.float32(cfg.kernel_norm) * (-5.0) * (tmp * tmp * tmp) / (h * h)
    coeff = jnp.where(q < 2.0, coeff, 0.0)
    return coeff * dx, coeff * dy

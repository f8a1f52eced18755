"""Multi-chip slab decomposition vs the single-device oracle, on the 8-device
virtual CPU mesh (conftest.py) — the JAX analog of the reference's
compile-time backend substitution (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.scene import build_dam_break_scene
from pi_sph_fluid_tpu.models.simulation import make_step, prime
from pi_sph_fluid_tpu.parallel.domain import DomainDecomposition

G = (0.0, -9.81)


@pytest.fixture(scope="module")
def setup():
    cfg = SPHConfig(r=0.032)
    fluid, braw = build_dam_break_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    return cfg, fluid, boundary, bgrid


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("x",))


# 4/8 slabs put boundaries inside the dam column, so migration and
# halo exchange are genuinely active (2 slabs would leave them idle)
@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_step_matches_oracle(setup, n_dev):
    cfg, fluid, boundary, bgrid = setup
    mesh = _mesh(n_dev)
    dd = DomainDecomposition(cfg, boundary, bgrid, fluid.n, mesh)
    state = dd.init(fluid)

    ostep = jax.jit(make_step(cfg, boundary, bgrid))
    step = jax.jit(dd.make_step())
    g = jnp.asarray(G, jnp.float32)
    # both start from the same zero-acceleration state (DomainState has no
    # prime; the first kick is a no-op and density/forces are recomputed
    # inside the step, so initial rho/p values are irrelevant)
    from pi_sph_fluid_tpu.models.simulation import SimState
    zsim = SimState(fluid=fluid, ids=jnp.arange(fluid.n, dtype=jnp.int32),
                    au=jnp.zeros_like(fluid.u), av=jnp.zeros_like(fluid.v))

    n_steps = 10
    for _ in range(n_steps):
        state, st = step(state, g)
    for _ in range(n_steps):
        zsim, _ = ostep(zsim, g)

    assert int(st["overflow"]) == 0
    assert int(st["n_valid"]) == fluid.n

    got = dd.gather(state)
    inv = np.argsort(np.asarray(zsim.ids))
    for field, atol, rtol in (("x", 2e-5, 0), ("y", 2e-5, 0), ("u", 2e-5, 0),
                              ("v", 2e-5, 0), ("rho", 0, 1e-6)):
        ours = np.asarray(getattr(got, field))
        ref = np.asarray(getattr(zsim.fluid, field))[inv]
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol,
                                   err_msg=f"{field} mismatch at D={n_dev}")


def test_migration_across_slabs(setup):
    """Particles crossing slab boundaries keep their identity and count."""
    cfg, fluid, boundary, bgrid = setup
    mesh = _mesh(4)
    dd = DomainDecomposition(cfg, boundary, bgrid, fluid.n, mesh)
    # give the fluid a strong rightward velocity so it crosses slabs
    fluid2 = fluid._replace(u=jnp.full_like(fluid.u, 3.0))
    state = dd.init(fluid2)
    step = jax.jit(dd.make_step())
    g = jnp.asarray((3.0, -9.81), jnp.float32)
    for _ in range(60):
        state, st = step(state, g)
    assert int(st["n_valid"]) == fluid.n  # no particles lost or duplicated
    assert int(st["overflow"]) == 0
    got = dd.gather(state)
    assert got.x.shape[0] == fluid.n
    ids = np.sort(np.asarray(state.ids)[np.asarray(state.ids) >= 0])
    np.testing.assert_array_equal(ids, np.arange(fluid.n))
    # the fluid moved right (60 steps x 3 m/s x dt ~ 0.019 m) and particles
    # actually changed slab ownership
    assert float(jnp.mean(got.x)) > float(jnp.mean(fluid.x)) + 0.015
    slab0 = np.clip((np.asarray(fluid.x) / dd.slab_w).astype(int), 0, 3)
    slab1 = np.clip((np.asarray(got.x) / dd.slab_w).astype(int), 0, 3)
    assert (slab0 != slab1).sum() > 0


def test_init_distributes_by_slab(setup):
    cfg, fluid, boundary, bgrid = setup
    mesh = _mesh(8)
    dd = DomainDecomposition(cfg, boundary, bgrid, fluid.n, mesh)
    state = dd.init(fluid)
    x = np.asarray(state.fluid.x).reshape(8, dd.slab_cap)
    valid = np.asarray(state.fluid.m).reshape(8, dd.slab_cap) > 0
    for dev in range(8):
        if valid[dev].any():
            xs = x[dev][valid[dev]]
            assert xs.min() >= dev * dd.slab_w - 1e-6
            assert xs.max() <= (dev + 1) * dd.slab_w + 1e-6
    assert valid.sum() == fluid.n


def test_500_step_collapse_8_slabs():
    """A full dam-break collapse (500 steps, speeds > 2 m/s) across 8 slabs:
    sustained migration + halo traffic with zero overflow and exact particle
    conservation (VERDICT round-1 weak spot: DD was only exercised for tens
    of steps far from capacity)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from pi_sph_fluid_tpu.parallel.domain import DomainDecomposition

    cfg = SPHConfig()
    fluid, braw = build_dam_break_scene(cfg)
    boundary, bgrid = prepare_boundary(braw, cfg)
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.asarray(devs[:8]), ("x",))
    dd = DomainDecomposition(cfg, boundary, bgrid, fluid.n, mesh)
    state = dd.init(fluid)
    step = dd.make_step()

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, st = step(s, jnp.asarray((0.0, -9.81), jnp.float32))
            return s2, (st["n_valid"], st["overflow"], st["max_speed"])
        return jax.lax.scan(body, state, None, length=100)

    worst_ov = 0
    for _ in range(5):
        state, (nv, ov, ms) = multi(state)
        worst_ov = max(worst_ov, int(np.max(np.asarray(ov))))
        assert int(np.asarray(nv)[-1]) == fluid.n
    assert worst_ov == 0
    assert float(np.asarray(ms)[-1]) > 1.0  # the collapse actually happened
    assert np.isfinite(np.asarray(state.fluid.x)).all()

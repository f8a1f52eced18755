"""Property tests of the row-triple candidate structure (ops/pallas/triple.py).

The kernels are maskless, so correctness rests on structural invariants:
every true neighbor (fluid or boundary, within the support radius) of every
real query must appear **exactly once** in the query block's fetched
candidate window.  Checked exhaustively against a brute-force neighbor list
on randomized scenes (uniform and clustered-with-empty-rows).
"""

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pi_sph_fluid_tpu.config import SPHConfig
from pi_sph_fluid_tpu.models.boundary import prepare_boundary
from pi_sph_fluid_tpu.models.engine_v3 import WindowEngine
from pi_sph_fluid_tpu.models.scene import build_drop_scene
from pi_sph_fluid_tpu.state import FluidState

CFG = SPHConfig()


def _random_engine_state(seed, n=300, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        # dense blob + sparse dust: stresses window caps and empty rows
        nb_ = n // 2
        blob = rng.normal([1.0, 0.5], 0.1, size=(nb_, 2))
        dust = rng.uniform([0.1, 0.1], [3.9, 1.9], size=(n - nb_, 2))
        pos = np.concatenate([blob, dust]).astype(np.float32)
    else:
        pos = rng.uniform([0.05, 0.05], [3.95, 1.95], size=(n, 2)).astype(np.float32)
    pos[:, 0] = np.clip(pos[:, 0], 0.01, 3.99)
    pos[:, 1] = np.clip(pos[:, 1], 0.01, 1.99)
    _, braw = build_drop_scene(CFG)
    boundary, bgrid = prepare_boundary(braw, CFG)
    eng = WindowEngine(CFG, boundary, bgrid, n, tq=32, qb=8, cap=256,
                      seg_q=2, interpret=True)
    z = jnp.zeros(n, jnp.float32)
    fl = FluidState(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
                    u=z, v=z, m=z + CFG.particle_mass, rho=z + CFG.rho_0, p=z)
    packed = eng._initial_packed(fl)
    pk, ctx, overflow = jax.jit(eng._relayout)(packed)
    return eng, boundary, pk, ctx, int(overflow)


def _fetched_plain_range(spec, fetch):
    """Dual-plane fetch offset -> plain trip-slot indices of the fetched
    lanes (dual[t] = trip[t] for t < L; dual[L+t] = trip[t+64])."""
    if fetch >= spec.L:
        lo = fetch - spec.L + 64
    else:
        lo = fetch
    return np.arange(lo, min(lo + spec.cap, spec.L))


@pytest.mark.parametrize("seed,clustered", [(0, False), (1, True), (2, True)])
def test_every_true_pair_in_exactly_one_window(seed, clustered):
    eng, boundary, pk, ctx, overflow = _random_engine_state(seed, clustered=clustered)
    assert overflow == 0
    spec = eng.spec
    pk_np = np.asarray(pk)
    trip_src = np.asarray(ctx.trip_src)
    ws = np.asarray(ctx.w_start).reshape(-1)

    # gather source exactly as _pair_passes builds it (fluid layout rows,
    # boundary rows, inert row)
    src_x = np.concatenate([pk_np[:, 0], np.asarray(boundary.x), [-1e6]]).astype(np.float32)
    src_y = np.concatenate([pk_np[:, 1], np.asarray(boundary.y), [-1e6]]).astype(np.float32)
    src_m = np.concatenate([pk_np[:, 4], np.asarray(boundary.m), [0.0]]).astype(np.float32)

    support = np.float32(CFG.support_radius)
    real = pk_np[:, 4] > 0
    n_blocks = spec.n_layout // spec.qb
    for b in range(n_blocks):
        qs = np.nonzero(real[b * spec.qb:(b + 1) * spec.qb])[0] + b * spec.qb
        if len(qs) == 0:
            continue
        window = _fetched_plain_range(spec, ws[b])
        win_src = trip_src[window]
        for q in qs:
            qx, qy = np.float32(pk_np[q, 0]), np.float32(pk_np[q, 1])
            d_src = np.sqrt((src_x - qx) ** 2 + (src_y - qy) ** 2)
            want = set(np.nonzero((d_src < support) & (src_m > 0))[0].tolist())
            d_win = np.sqrt((src_x[win_src] - qx) ** 2 + (src_y[win_src] - qy) ** 2)
            hit = win_src[(d_win < support) & (src_m[win_src] > 0)]
            got = Counter(hit.tolist())
            assert set(got) == want, (
                f"block {b} query {q}: missing {want - set(got)}, "
                f"spurious {set(got) - want}")
            dup = {k: v for k, v in got.items() if v != 1}
            assert not dup, f"block {b} query {q}: duplicated candidates {dup}"


def test_l_budget_overrun_is_counted_never_silent():
    """If the static candidate budget L were ever overrun (ADVICE r2: the
    per-segment LANE rounding case), the excess must fire the overflow
    counter (weighted x1e6) instead of letting windows index garbage."""
    eng, _, _, ctx, overflow = _random_engine_state(3, clustered=True)
    assert overflow == 0  # the (fixed) budget itself must hold
    # shrink L artificially and re-run the frame build: the guard row in T
    # must carry the excess into block_windows' overflow
    short = eng.spec._replace(L=(eng.spec.L // 2 // 128) * 128)
    eng.spec = short
    fl_n = eng.n_real
    rng = np.random.default_rng(3)
    pos = rng.uniform([0.05, 0.05], [3.95, 1.95], size=(fl_n, 2)).astype(np.float32)
    z = jnp.zeros(fl_n, jnp.float32)
    fl = FluidState(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
                    u=z, v=z, m=z + CFG.particle_mass, rho=z + CFG.rho_0, p=z)
    packed = eng._initial_packed(fl)
    _, _, overflow2 = jax.jit(eng._relayout)(packed)
    assert int(overflow2) >= 1_000_000


def test_no_particle_lost_in_layout():
    for seed in (0, 1):
        eng, _, pk, ctx, _ = _random_engine_state(seed, clustered=True)
        pk_np = np.asarray(pk)
        ids = pk_np[pk_np[:, 4] > 0, 7].astype(np.int64)
        assert sorted(ids) == list(range(eng.n_real))

"""Pallas-backed simulation engine: the production TPU path.

Same physics and integration order as models/simulation.py (the jnp oracle —
tests assert the two agree), but engineered for the TPU memory system:

* particle state lives **packed** as one (n_layout, 8) float32 array
  [x, y, u, v, m, rho, p, pad] in the **row-padded layout** of
  ops/pallas/spans.py (each cell row at a fixed tile-aligned offset, inert
  pad slots with m = 0);
* the per-step grid rebuild is: cell keys -> one radix sort (argsort) ->
  CSR offsets by *binary search on the sorted keys* (no scatter) -> layout
  indices by broadcast arithmetic -> **one row-gather** of the packed state
  (replacing eight per-field gathers — gathers dominate the non-kernel cost
  on TPU);
* the pair passes are the fused Pallas kernels (density+EOS, forces);
* ``multi_step`` scans K ticks per host dispatch (free-running, the analog
  of REALTIME off, `pi_sph_fluid.c:10`).

Observability: StepStats.neighbor_overflow = span-cap losses plus (weighted
x1e6) row-capacity losses — both must read 0 in a healthy run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SPHConfig
from ..state import BoundaryState, FluidState
from ..ops.grid import GridContext, cell_ids
from ..ops.pallas.pair_kernels import (
    PallasDims,
    density_eos_call,
    forces_call,
    pack_candidates,
)
from ..ops.pallas.spans import (build_row_layout, layout_qb_windows, layout_size, layout_spans)
from .simulation import StepStats

__all__ = ["PallasEngine", "PallasDims", "PackedSim"]

INERT_X = -1e6
_INERT_ROW = np.asarray([INERT_X, INERT_X, 0, 0, 0, 0, 0, 0], np.float32)


class PackedSim(NamedTuple):
    """Simulation state in packed layout space."""

    packed: jnp.ndarray   # (n_layout, 8): x, y, u, v, m, rho, p, pad
    ids: jnp.ndarray      # (n_layout,) int32, -1 on pad slots
    au: jnp.ndarray       # (n_layout,)
    av: jnp.ndarray

    @property
    def fluid(self) -> FluidState:
        """FluidState view (column slices; cheap inside jit)."""
        p = self.packed
        return FluidState(x=p[:, 0], y=p[:, 1], u=p[:, 2], v=p[:, 3],
                          m=p[:, 4], rho=p[:, 5], p=p[:, 6])


class PallasEngine:
    """Owns the static scene (boundary, capacities) and builds jittable
    prime/step/multi_step functions for a fixed fluid particle count."""

    def __init__(
        self,
        cfg: SPHConfig,
        boundary: BoundaryState,
        boundary_grid: GridContext,
        n_real: int,
        dims: PallasDims | None = None,
    ):
        self.cfg = cfg
        self.dims = dims or PallasDims()
        assert self.dims.cap % 128 == 0 and self.dims.capb % 128 == 0, \
            "span caps must be multiples of the 128-lane chunk"
        self.n_real = int(n_real)
        self.rowcap, self.n_layout = layout_size(
            cfg, self.n_real, self.dims.tq, self.dims.row_slack
        )
        self.boundary = boundary
        self.bc_packed = pack_candidates(
            (boundary.x, boundary.y, boundary.u, boundary.v, boundary.m,
             boundary.rho, jnp.zeros_like(boundary.x)),
            self.dims.capb,
        )
        self.b_cell_starts = boundary_grid.cell_starts

    # ------------------------------------------------------------------
    def _relayout(self, packed, ids):
        """Counting sort + row layout; one row-gather of the packed state."""
        cfg = self.cfg
        x, y, m = packed[:, 0], packed[:, 1], packed[:, 4]
        keys = jnp.where(m > 0, cell_ids(x, y, cfg), cfg.n_cells)
        order = jnp.argsort(keys, stable=True).astype(jnp.int32)
        # CSR offsets via scatter histogram + cumsum (measured ~2 ms at 215k
        # on v5e vs 4-8 ms for every jnp.searchsorted method)
        counts = jnp.zeros(cfg.n_cells + 2, jnp.int32).at[keys + 1].add(1)
        cell_starts = jnp.cumsum(counts, dtype=jnp.int32)

        layout = build_row_layout(self.n_layout, cell_starts, cfg, self.rowcap)
        perm = order[layout.src]
        v = layout.valid
        packed_new = jnp.where(v[:, None], packed[perm, :], jnp.asarray(_INERT_ROW))
        ids_new = jnp.where(v, ids[perm], -1)
        cells = jnp.where(v, keys[perm], cfg.n_cells)
        return packed_new, ids_new, layout, cells, cell_starts

    # ------------------------------------------------------------------
    def _build_spans(self, packed, ids):
        """Relayout + span build; returns the new arrays and carried spans
        (f_spans, b_spans, per-query-block windows)."""
        cfg, dims = self.cfg, self.dims
        packed, ids, layout, cells, cell_starts = self._relayout(packed, ids)
        f_spans = layout_spans(layout, cells, cell_starts, cell_starts, cfg,
                               self.rowcap, dims.tq, dims.cap,
                               target_rowcap=self.rowcap)
        b_spans = layout_spans(layout, cells, cell_starts, self.b_cell_starts,
                               cfg, self.rowcap, dims.tq, dims.capb)
        windows = None
        if dims.qb:
            windows = layout_qb_windows(layout, cells, cell_starts, cell_starts,
                                        cfg, self.rowcap, dims.tq, dims.qb,
                                        target_rowcap=self.rowcap)
        # row-capacity loss destroys particles — weight it so it can never be
        # misread as a benign neighbor drop
        overflow = f_spans.overflow + b_spans.overflow + 1_000_000 * layout.lost
        return packed, ids, (f_spans, b_spans, windows), overflow

    def _pair_passes(self, packed, spans, g):
        """Density+EOS and force kernels over given (possibly carried) spans."""
        cfg, dims = self.cfg, self.dims
        f_spans, b_spans, windows = spans
        fc_packed = jnp.pad(packed.T, ((0, 0), (0, dims.cap)))
        rhop = density_eos_call(packed, fc_packed, self.bc_packed,
                                f_spans, b_spans, cfg, dims, windows=windows)
        rp_packed = jnp.pad(rhop.T, ((0, 0), (0, dims.cap)))
        acc = forces_call(packed, rhop, fc_packed, rp_packed, self.bc_packed,
                          f_spans, b_spans, g, cfg, dims, windows=windows)
        packed = jnp.concatenate([packed[:, :5], rhop, packed[:, 7:8]], axis=1)
        return packed, acc[:, 0], acc[:, 1]

    def _force_pass(self, packed, ids, g):
        packed, ids, spans, overflow = self._build_spans(packed, ids)
        packed, au, av = self._pair_passes(packed, spans, g)
        return packed, ids, au, av, overflow

    # ------------------------------------------------------------------
    def _initial_packed(self, fluid: FluidState):
        """Lift a compact scene state into (n_layout, 8) packed arrays (pads
        last; the first _relayout distributes them into row-padded form)."""
        extra = self.n_layout - fluid.n
        assert extra >= 0, "scene larger than layout capacity"
        cols = np.zeros((self.n_layout, 8), np.float32)
        cols[fluid.n:] = _INERT_ROW
        for j, f in enumerate((fluid.x, fluid.y, fluid.u, fluid.v,
                               fluid.m, fluid.rho, fluid.p)):
            cols[: fluid.n, j] = np.asarray(f)
        ids = np.concatenate([
            np.arange(fluid.n, dtype=np.int32),
            np.full(extra, -1, np.int32),
        ])
        return jnp.asarray(cols), jnp.asarray(ids)

    def prime(self, fluid: FluidState, g) -> PackedSim:
        """Step-0 pass (`pi_sph_fluid.c:604-607`) into layout space."""
        packed, ids = self._initial_packed(fluid)

        @jax.jit
        def _prime(packed, ids, g):
            pk, ids2, au, av, _ = self._force_pass(packed, ids, jnp.asarray(g, jnp.float32))
            return PackedSim(packed=pk, ids=ids2, au=au, av=av)

        return _prime(packed, ids, jnp.asarray(g, jnp.float32))

    # ------------------------------------------------------------------
    def make_step(self, damping: float = 1.0):
        """One tick.  ``damping`` < 1 scales velocities each step — the
        standard damped-settling trick for initializing fine-resolution
        scenes whose startup transient would otherwise breach the WCSPH
        validity bound v < C/10 (the reference's design bound,
        `pi_sph_fluid.c:16`; viscosity ~ alpha*c*h shrinks with h, so the
        undamped transient grows with resolution)."""
        cfg = self.cfg
        dt = jnp.float32(cfg.dt)
        half_dt = jnp.float32(0.5) * dt
        damp = jnp.float32(damping)

        def step(sim: PackedSim, g):
            g = jnp.asarray(g, jnp.float32)
            pk = sim.packed
            # kick + drift (`pi_sph_fluid.c:614-624`); pads have zero
            # velocity and acceleration, so no masking is needed
            u = pk[:, 2] + half_dt * sim.au
            v = pk[:, 3] + half_dt * sim.av
            x = pk[:, 0] + dt * u
            y = pk[:, 1] + dt * v
            pk = jnp.concatenate(
                [x[:, None], y[:, None], u[:, None], v[:, None], pk[:, 4:]], axis=1
            )

            pk, ids, au, av, overflow = self._force_pass(pk, sim.ids, g)
            # kick with new accelerations (`pi_sph_fluid.c:637-640`)
            u2 = (pk[:, 2] + half_dt * au) * damp
            v2 = (pk[:, 3] + half_dt * av) * damp
            pk = jnp.concatenate([pk[:, :2], u2[:, None], v2[:, None], pk[:, 4:]], axis=1)

            new_sim = PackedSim(packed=pk, ids=ids, au=au, av=av)
            return new_sim, self.stats(new_sim, overflow)

        return step

    def make_multi_step(self, damping: float = 1.0, resort_every: int = 1):
        """K ticks per dispatch.  ``resort_every`` > 1 enables *sticky
        layout*: the counting sort + span build run on the first tick of
        each group and the following ticks reuse the carried spans with the
        particles' live positions.  Since v_max*dt <= H/10 (the C/10 speed
        bound times the H/C step), a layout stale by k-1 steps can only miss
        pairs in the outermost (k-1)*H/10 shell of the support, where the
        Wendland weight is (1-q/2)^4 < ((k-1)/20)^4 — physically negligible
        for small k, and the distance mask keeps every computed pair exact.
        The reference rebuilds every step; resort_every=1 (default)
        reproduces that."""
        if resort_every <= 1:
            step = self.make_step(damping)

            def multi_step(sim: PackedSim, g_trace):
                return jax.lax.scan(step, sim, jnp.asarray(g_trace, jnp.float32))

            return multi_step

        cfg = self.cfg
        dt = jnp.float32(cfg.dt)
        half_dt = jnp.float32(0.5) * dt
        damp = jnp.float32(damping)

        def kick_drift(sim: PackedSim):
            pk = sim.packed
            u = pk[:, 2] + half_dt * sim.au
            v = pk[:, 3] + half_dt * sim.av
            x = pk[:, 0] + dt * u
            y = pk[:, 1] + dt * v
            return jnp.concatenate(
                [x[:, None], y[:, None], u[:, None], v[:, None], pk[:, 4:]], axis=1)

        def finish(pk, ids, au, av, overflow):
            u2 = (pk[:, 2] + half_dt * au) * damp
            v2 = (pk[:, 3] + half_dt * av) * damp
            pk = jnp.concatenate([pk[:, :2], u2[:, None], v2[:, None], pk[:, 4:]], axis=1)
            sim = PackedSim(packed=pk, ids=ids, au=au, av=av)
            return sim, self.stats(sim, overflow)

        def group(sim: PackedSim, g_group):
            # tick 0: fresh layout + spans
            pk = kick_drift(sim)
            pk, ids, spans, overflow = self._build_spans(pk, sim.ids)
            pk, au, av = self._pair_passes(pk, spans, g_group[0])
            sim, st0 = finish(pk, ids, au, av, overflow)
            stats_list = [st0]
            # ticks 1..k-1: carried spans, live positions
            for j in range(1, resort_every):
                pk = kick_drift(sim)
                pk, au, av = self._pair_passes(pk, spans, g_group[j])
                sim, stj = finish(pk, sim.ids, au, av, jnp.asarray(0, jnp.int32))
                stats_list.append(stj)
            stats = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stats_list)
            return sim, stats

        def multi_step(sim: PackedSim, g_trace):
            g_trace = jnp.asarray(g_trace, jnp.float32)
            k = g_trace.shape[0]
            assert k % resort_every == 0,                 f"trace length {k} not a multiple of resort_every={resort_every}"
            groups = g_trace.reshape(k // resort_every, resort_every, 2)
            sim, stats = jax.lax.scan(group, sim, groups)
            flat = jax.tree_util.tree_map(lambda a: a.reshape(k, *a.shape[2:]), stats)
            return sim, flat

        return multi_step

    # ------------------------------------------------------------------
    def stats(self, sim: PackedSim, overflow=None) -> StepStats:
        rho0 = jnp.float32(self.cfg.rho_0)
        m = sim.packed[:, 4]
        rho = sim.packed[:, 5]
        max_rho_error = jnp.max(jnp.where(m > 0, rho, 0.0) - rho0)
        speed2 = sim.packed[:, 2] ** 2 + sim.packed[:, 3] ** 2  # pads at rest
        return StepStats(
            max_rho_error_pct=jnp.maximum(max_rho_error, 0.0) / rho0 * 100.0,
            max_speed=jnp.sqrt(jnp.max(speed2)),
            neighbor_overflow=jnp.asarray(0, jnp.int32) if overflow is None else overflow,
        )

    # ------------------------------------------------------------------
    def unpad(self, sim: PackedSim) -> FluidState:
        """Real particles in original id order (host-side convenience)."""
        ids = np.asarray(sim.ids)
        sel = np.nonzero(ids >= 0)[0]
        inv = sel[np.argsort(ids[sel])]
        pk = np.asarray(sim.packed)[inv]
        return FluidState(*(jnp.asarray(pk[:, j]) for j in range(7)))

"""Scene builders: initial particle layouts.

Replicates the reference's scene construction (`pi_sph_fluid.c:475-540`)
including its float32 lattice semantics: the C loops accumulate the lattice
coordinate in a ``float`` (``for(float x_0 = 0; x_0 < WIDTH; x_0 += R)``), so
positions carry accumulated float32 rounding.  We reproduce that exactly with
numpy float32 accumulation — at the default config this yields the same 269
fluid + 162 boundary particles as the C build (SURVEY.md §2 #12).

Also provides parameterised scenes (dam break, scaled drop) for benchmarking
beyond the reference's single hard-coded scene.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..config import SPHConfig
from ..state import BoundaryState, FluidState

__all__ = [
    "float32_lattice",
    "in_circle_drop",
    "build_fluid",
    "build_box_boundary",
    "build_drop_scene",
    "build_dam_break_scene",
    "pixel_centers",
]


def float32_lattice(stop: float, step: float) -> np.ndarray:
    """Values of ``for(float a = 0; a < stop; a += step)`` in float32."""
    out = []
    a = np.float32(0.0)
    stop32 = np.float32(stop)
    step32 = np.float32(step)
    while a < stop32:
        out.append(a)
        a = np.float32(a + step32)
    return np.asarray(out, np.float32)


def in_circle_drop(cfg: SPHConfig) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Predicate of the reference's initial shape: a circle of radius 0.70 m
    centered mid-domain (`pi_sph_fluid.c:238-240`)."""
    cx = np.float32(cfg.width) / np.float32(2.0)
    cy = np.float32(cfg.height) / np.float32(2.0)

    def predicate(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        dx = np.float32(x) - cx
        dy = np.float32(y) - cy
        dist = np.sqrt((dx * dx + dy * dy).astype(np.float32), dtype=np.float32)
        return dist < 0.70  # double literal compare, as in C

    return predicate


def build_fluid(cfg: SPHConfig, predicate: Callable) -> FluidState:
    """Stipple the domain lattice and keep points satisfying ``predicate``
    (`pi_sph_fluid.c:484-506`).  Iteration order matches C: outer x, inner y."""
    xs = float32_lattice(cfg.width, cfg.r)
    ys = float32_lattice(cfg.height, cfg.r)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")  # outer x, inner y ordering
    keep = predicate(gx, gy).ravel()
    x = gx.ravel()[keep].astype(np.float32)
    y = gy.ravel()[keep].astype(np.float32)
    n = x.shape[0]
    m = np.full(n, np.float32(cfg.particle_mass))
    return FluidState(
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        m=jnp.asarray(m),
        rho=jnp.full((n,), np.float32(cfg.rho_0)),
        p=jnp.zeros(n, jnp.float32),
    )


def build_box_boundary(cfg: SPHConfig) -> BoundaryState:
    """Single-layer box walls at spacing R (`pi_sph_fluid.c:513-540`).

    Order matches C: (x_0, 0), (x_0, H) pairs for each lattice x, then
    (0, y_0), (W, y_0) pairs for each lattice y.  Pseudo-mass ``m`` is left
    at 0 here; compute it with models.boundary.compute_pseudo_mass.
    """
    xs = float32_lattice(cfg.width, cfg.r)
    ys = float32_lattice(cfg.height, cfg.r)
    bx, by = [], []
    for x0 in xs:
        bx += [x0, x0]
        by += [np.float32(0.0), np.float32(cfg.height)]
    for y0 in ys:
        bx += [np.float32(0.0), np.float32(cfg.width)]
        by += [y0, y0]
    n = len(bx)
    return BoundaryState(
        x=jnp.asarray(np.asarray(bx, np.float32)),
        y=jnp.asarray(np.asarray(by, np.float32)),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        m=jnp.zeros(n, jnp.float32),
        rho=jnp.full((n,), np.float32(cfg.rho_0)),
    )


def build_drop_scene(cfg: SPHConfig) -> tuple[FluidState, BoundaryState]:
    """The reference scene: circular drop mid-domain + box walls."""
    return build_fluid(cfg, in_circle_drop(cfg)), build_box_boundary(cfg)


def build_dam_break_scene(
    cfg: SPHConfig, fill_x: float = 0.4, fill_y: float = 0.8
) -> tuple[FluidState, BoundaryState]:
    """Dam break: fluid column filling the left ``fill_x`` fraction of the
    domain up to ``fill_y`` of its height (BASELINE.json config 2)."""
    x_max = np.float32(cfg.width) * np.float32(fill_x)
    y_max = np.float32(cfg.height) * np.float32(fill_y)
    # Start the column >= 2R off the walls: Akinci wall particles carry ~6x a
    # fluid particle's mass (they stand in for the half-space behind the
    # wall), so fluid initialised at distance R is ~70% over-dense and the
    # first pressure pass explodes.  At >= 1.5R the primed density matches
    # the interior lattice (973 kg/m^3 at defaults); 2R adds safety margin.
    gap = np.float32(cfg.r) * np.float32(2.0)

    def predicate(x, y):
        return (x >= gap) & (x < x_max) & (y >= gap) & (y < y_max)

    return build_fluid(cfg, predicate), build_box_boundary(cfg)


def build_pool_scene(
    cfg: SPHConfig, fill_x: float = 0.97, fill_y: float = 0.85
) -> tuple[FluidState, BoundaryState]:
    """A settled pool: fluid fills nearly the whole box width up to
    ``fill_y`` of its height.  The steady state of every closed-box scene —
    and the benchmark scene, since the row-padded layout is sized for full
    row occupancy (ops/pallas/triple.py) and a pool actually uses it."""
    x_lo = np.float32(cfg.width) * np.float32(1.0 - fill_x)
    x_hi = np.float32(cfg.width) * np.float32(fill_x)
    y_max = np.float32(cfg.height) * np.float32(fill_y)
    gap = np.float32(cfg.r) * np.float32(2.0)  # Akinci wall standoff

    def predicate(x, y):
        return (x >= max(gap, x_lo)) & (x <= x_hi) & (y >= gap) & (y < y_max)

    return build_fluid(cfg, predicate), build_box_boundary(cfg)


def pixel_centers(cfg: SPHConfig, rows: int = 64, cols: int = 128) -> tuple[np.ndarray, np.ndarray]:
    """Centers of the display pixels as pseudo-particle coordinates
    (`pi_sph_fluid.c:570-577`): row 0 is the top of the screen, y flipped.

    Returns (px, py) each of shape (rows*cols,), index ij = i*cols + j.
    """
    i = np.arange(rows, dtype=np.float64)
    j = np.arange(cols, dtype=np.float64)
    gj, gi = np.meshgrid(j, i)  # shape (rows, cols)
    px = ((gj + 0.5) * float(cfg.width) / cols).astype(np.float32)
    py = ((rows - (gi + 0.5)) * float(cfg.height) / rows).astype(np.float32)
    return px.ravel(), py.ravel()

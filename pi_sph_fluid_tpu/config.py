"""Static simulation configuration.

The reference keeps all physical/numerical constants as C preprocessor macros
(`pi_sph_fluid.c:10-21`).  Here they live in a frozen (hashable) dataclass so a
config instance can be closed over by ``jax.jit`` as a static value: every
derived quantity (DT, V, kernel normalisation, grid shape) is a plain Python
float/int computed once at trace time, exactly like a macro.

All floating point constants are materialised at float32 precision to match
the C code, which computes everything in ``float``.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

__all__ = ["SPHConfig", "DEFAULT_CONFIG"]


def _f32(x: float) -> float:
    """Round a python float through float32, so derived constants match C."""
    return float(np.float32(x))


@dataclasses.dataclass(frozen=True)
class SPHConfig:
    """All static parameters of a 2-D WCSPH simulation.

    Defaults replicate the reference constants (`pi_sph_fluid.c:10-21`):
    R=0.075 m spacing, H=1.3R smoothing length, 4x2 m domain, rho0=1000,
    c=400 m/s numerical speed of sound, g=9.81.
    """

    r: float = 0.075          # m, initial particle spacing
    h_factor: float = 1.3     # H = h_factor * R
    width: float = 4.0        # m, domain width
    height: float = 2.0       # m, domain height
    rho_0: float = 1000.0     # kg/m^3, reference density
    c: float = 400.0          # m/s, numerical speed of sound
    g: float = 9.81           # m/s^2, gravity magnitude
    dt_factor: float = 1.0    # DT = dt_factor * H / C (ref uses 1.0, CFL says 0.4)
    v_factor: float = 0.57    # particle volume V = v_factor * H^2 (2-D "volume")

    # --- artificial terms (reference hard-codes these in the force pass) ---
    alpha_visc: float = 0.01      # Monaghan artificial viscosity alpha (`pi_sph_fluid.c:334`)
    eps_visc: float = 0.01        # denominator softening (`pi_sph_fluid.c:332`)
    k_artificial_pressure: float = 0.1   # Macklin artificial pressure k1 (`pi_sph_fluid.c:325`)
    q_artificial_pressure: float = 0.2   # reference q for artif. pressure, in units of H
    artificial_pressure_power: int = 4   # exponent (`pi_sph_fluid.c:325`)

    # --- neighbor engine capacities (shape-static; reference analog:
    #     MAX_POSSIBLE_NEIGHBORS=48, `pi_sph_fluid.c:21`) ---
    row_span_cap: int = 32    # max candidates in one 3-cell row span per query
    cell_cap: int = 16        # max particles in one 2H x 2H cell

    # ------------------------------------------------------------------
    # Derived constants — float32-rounded like the C macros they mirror.
    # ------------------------------------------------------------------
    @property
    def h(self) -> float:
        """Smoothing length, H = 1.3*R (`pi_sph_fluid.c:12`)."""
        return _f32(np.float32(self.r) * np.float32(self.h_factor))

    @property
    def dt(self) -> float:
        """Time step, DT = dt_factor*H/C (`pi_sph_fluid.c:19`)."""
        return _f32(np.float32(self.dt_factor) * np.float32(self.h) / np.float32(self.c))

    @property
    def particle_volume(self) -> float:
        """V = 0.57*H*H (`pi_sph_fluid.c:20`)."""
        return _f32(np.float32(self.v_factor) * np.float32(self.h) * np.float32(self.h))

    @property
    def particle_mass(self) -> float:
        """Fluid particle mass m = RHO_0*V (`pi_sph_fluid.c:502`)."""
        return _f32(np.float32(self.rho_0) * np.float32(self.particle_volume))

    @property
    def support_radius(self) -> float:
        """Kernel support = 2H; also the neighbor-search cutoff (`pi_sph_fluid.c:144`)."""
        return _f32(2.0 * np.float32(self.h))

    @property
    def kernel_norm(self) -> float:
        """Wendland C2 2-D normalisation 7/(4*pi*H^2) (`pi_sph_fluid.c:46`)."""
        return _f32(7.0 / (4.0 * math.pi * float(self.h) * float(self.h)))

    @property
    def tait_b(self) -> float:
        """Tait EOS stiffness B = C^2*RHO_0/7 (`pi_sph_fluid.c:297`)."""
        return _f32(np.float32(self.c) * np.float32(self.c) * np.float32(self.rho_0) / np.float32(7.0))

    @property
    def cell_length(self) -> float:
        """Hash-grid cell edge = 2H (`pi_sph_fluid.c:596`)."""
        return self.support_radius

    @property
    def n_cell_rows(self) -> int:
        """Number of grid rows (y cells), matching `pi_sph_fluid.c:93`."""
        return int((np.float32(self.height) - np.float32(0.0)) / np.float32(self.cell_length)) + 1

    @property
    def n_cell_cols(self) -> int:
        """Number of grid cols (x cells), matching `pi_sph_fluid.c:94`."""
        return int((np.float32(self.width) - np.float32(0.0)) / np.float32(self.cell_length)) + 1

    @property
    def n_cells(self) -> int:
        return self.n_cell_rows * self.n_cell_cols

    def replace(self, **kwargs) -> "SPHConfig":
        return dataclasses.replace(self, **kwargs)


DEFAULT_CONFIG = SPHConfig()

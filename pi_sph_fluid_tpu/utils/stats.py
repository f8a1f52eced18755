"""Runtime invariant reporting, matching the reference stats block.

The reference prints every 0.1 sim-seconds (`pi_sph_fluid.c:679-691`):

    sim time: 1.20, ticks/s: 4102, max rho error: 0.3% (worst) 1.2%, ...

Fields are replicated exactly (plus the neighbor-overflow counter this
framework adds), with the reference's max-density comparison bug fixed —
it compared rho against an error so the "max" was the last particle's
rho-rho0 (`pi_sph_fluid.c:658-659`, SURVEY.md §2 #16); we report the true
max.  Reductions happen on device (models/simulation.py stats); this module
only aggregates and formats host-side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

__all__ = ["StatsReporter"]


@dataclass
class StatsReporter:
    dt: float
    report_every_sim_s: float = 0.1
    stream: object = None

    t: float = 0.0
    worst_rho_error_pct: float = 0.0
    worst_speed: float = 0.0
    total_overflow: int = 0
    _last_report_t: float = 0.0
    _last_report_wall: float = field(default_factory=time.perf_counter)
    _window_rho: float = 0.0
    _window_speed: float = 0.0

    def update(self, n_steps: int, step_stats) -> str | None:
        """Feed one dispatch's StepStats (scalars or (k,) arrays from scan);
        returns a formatted report line when one is due."""
        rho = float(np.max(np.asarray(step_stats.max_rho_error_pct)))
        speed = float(np.max(np.asarray(step_stats.max_speed)))
        overflow = int(np.sum(np.asarray(step_stats.neighbor_overflow)))
        self._window_rho = max(self._window_rho, rho)
        self._window_speed = max(self._window_speed, speed)
        self.worst_rho_error_pct = max(self.worst_rho_error_pct, rho)
        self.worst_speed = max(self.worst_speed, speed)
        self.total_overflow += overflow
        self.t += n_steps * self.dt

        if self.t - self._last_report_t < self.report_every_sim_s:
            return None
        now = time.perf_counter()
        elapsed = now - self._last_report_wall
        tps = int((self.t - self._last_report_t) / self.dt / max(elapsed, 1e-9))
        line = (
            f"sim time: {self.t:.2f}, ticks/s: {tps}, "
            f"max rho error: {self._window_rho:.3f}% (worst) {self.worst_rho_error_pct:.3f}%, "
            f"max speed: {self._window_speed:.1f} m/s (worst) {self.worst_speed:.1f} m/s"
        )
        if self.total_overflow:
            line += f", NEIGHBOR OVERFLOW: {self.total_overflow}"
        self._last_report_t = self.t
        self._last_report_wall = now
        self._window_rho = 0.0
        self._window_speed = 0.0
        if self.stream is not None:
            print(line, file=self.stream, flush=True)
        return line

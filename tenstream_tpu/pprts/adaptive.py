"""Adaptive re-solve skipping by error-growth extrapolation.

Parity: reference `src/adaptive_spectral_integration.F90`
(`need_new_solution`:38-183): per solution-uid, keep a short history of
(time, absorption-change maxnorm); fit a polynomial (order <= 2) to the
error growth and skip re-solving a band when the extrapolated error stays
below `max_solution_err` and the solution is younger than
`max_solution_time` (options `-max_solution_err/-max_solution_time`,
`src/tenstream_options.F90:91-99`; history update in `restore_solution`,
`src/pprts.F90:4007-4050`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

_HIST = 3  # reference keeps a 3-deep (time, err) history


@dataclass
class SolutionErrorTracker:
    times: List[float] = field(default_factory=list)
    errors: List[float] = field(default_factory=list)  # abso-change maxnorm

    def record(self, time: float, err: float) -> None:
        self.times.append(float(time))
        self.errors.append(float(err))
        if len(self.times) > _HIST:
            self.times.pop(0)
            self.errors.pop(0)

    def need_new_solution(
        self,
        time: Optional[float],
        max_solution_err: float,
        max_solution_time: float,
    ) -> bool:
        """True if the band should be re-solved at `time`."""
        if time is None or not self.times:
            return True
        age = time - self.times[-1]
        if age >= max_solution_time:
            return True
        if len(self.times) < 2:
            return True
        order = min(len(self.times) - 1, 2)
        try:
            coeff = np.polyfit(self.times, self.errors, order)
            est = float(np.polyval(coeff, time))
        except Exception:
            return True
        return abs(est) >= max_solution_err


def abso_change_maxnorm(abso_new, abso_old) -> float:
    """Inf-norm of the absorption change (reference
    `restore_solution`:4037-4050)."""
    return float(np.max(np.abs(np.asarray(abso_new) - np.asarray(abso_old))))

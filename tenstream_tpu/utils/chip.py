"""Chip-session hygiene for long-running TPU jobs (bench, LUT tracer,
profiler).

Round-4 post-mortem (`ROUND4_NOTES.md` chip ledger, `BENCH_r04.json`):
after a long on-chip job left the device claim wedged, the next
`bench.py` silently absorbed a ~27-minute hang into "setup" and was
killed by the driver's `timeout` (rc=124) with no number captured.  The
reference's benchmark harness runs unattended (`misc/benchmark.sh`);
ours must too.  This module gives every chip tool the same three
defenses:

  * `probe_chip()`  — a SUBPROCESS device probe with a hard timeout and
    process-group kill, so a wedged claim is detected in seconds and
    reported loudly instead of hanging the tool itself.
  * `Heartbeat`     — a daemon thread stamping `# [t+XXXs] phase=...` on
    stderr so the driver's captured tail always shows where time went.
  * `Deadline`      — a global watchdog that force-exits the process
    (loudly, with a distinct rc) before the driver's outer timeout can
    strike; an abrupt `os._exit` also releases the device claim, which
    a SIGKILL'd-by-timeout process may not do cleanly.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

# distinct exit codes so the driver tail + rc identify the failure mode
RC_PROBE_FAILED = 3  # chip claim probe hung/errored (wedged device state)
RC_DEADLINE = 4      # internal watchdog fired before the driver timeout

_PROBE_SRC = r"""
import sys, time
t0 = time.time()
import jax, numpy as np
x = jax.device_put(np.ones((128, 128), np.float32))
y = (x @ x).block_until_ready()
print("PROBE_OK devices=%s claim_s=%.1f" % (jax.devices(), time.time() - t0))
"""


def probe_chip(timeout_s: float = 180.0, retries: int = 1, stream=None) -> bool:
    """Claim-probe the accelerator in a subprocess with a hard timeout.

    Runs a trivial device_put + matmul in a fresh interpreter.  On
    timeout the whole probe process GROUP is killed (a hung tunnel
    thread must not keep a claim alive).  Returns True when the chip
    answered; False after all retries failed.  Progress goes to
    `stream` (default stderr) so the driver tail records the outcome.
    """
    stream = stream or sys.stderr
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # probe the real accelerator, not a CPU override
    for attempt in range(retries + 1):
        t0 = time.time()
        print(f"# chip probe (attempt {attempt + 1}/{retries + 1}, "
              f"timeout {timeout_s:.0f}s)...", file=stream, flush=True)
        proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, start_new_session=True, env=env,
        )
        try:
            out, _ = proc.communicate(timeout=timeout_s)
            ok = proc.returncode == 0 and "PROBE_OK" in out
            tail = [ln for ln in out.strip().splitlines() if ln.strip()][-1:] or [""]
            print(f"# chip probe {'OK' if ok else 'FAILED'} in "
                  f"{time.time() - t0:.1f}s: {tail[0]}", file=stream, flush=True)
            if ok:
                return True
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            print(f"# chip probe HUNG past {timeout_s:.0f}s (killed process "
                  "group) — device claim looks wedged", file=stream, flush=True)
    return False


class Heartbeat:
    """Daemon thread stamping phase + elapsed time on stderr.

    The round-4 bench showed nothing between "setup..." and the driver
    kill; with a heartbeat every `interval_s` the captured tail always
    explains where the time went.
    """

    def __init__(self, interval_s: float = 30.0, stream=None):
        self.interval_s = interval_s
        self.stream = stream or sys.stderr
        self.t0 = time.time()
        self._phase = "init"
        self._phase_t0 = self.t0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def phase(self, name: str):
        now = time.time()
        print(f"# [t+{now - self.t0:7.1f}s] phase={name} "
              f"(prev took {now - self._phase_t0:.1f}s)",
              file=self.stream, flush=True)
        self._phase, self._phase_t0 = name, now

    def _run(self):
        while not self._stop.wait(self.interval_s):
            now = time.time()
            print(f"# [t+{now - self.t0:7.1f}s] heartbeat phase={self._phase} "
                  f"({now - self._phase_t0:.1f}s in phase)",
                  file=self.stream, flush=True)

    def stop(self):
        self._stop.set()


class Deadline:
    """Force-exit watchdog that beats the driver's outer `timeout`.

    Exits with RC_DEADLINE and a loud stderr message when `deadline_s`
    elapses, instead of letting the outer timeout SIGKILL us with no
    diagnosis (and possibly a still-held device claim).  `on_fire` (if
    given) runs first with a small time budget — e.g. emit a partial
    result line.
    """

    def __init__(self, deadline_s: float, stream=None, on_fire=None):
        self.deadline_s = deadline_s
        self.stream = stream or sys.stderr
        self.on_fire = on_fire
        self.t0 = time.time()
        self._cancelled = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def remaining(self) -> float:
        return self.deadline_s - (time.time() - self.t0)

    def _run(self):
        if self._cancelled.wait(self.deadline_s):
            return
        print(f"# DEADLINE: exceeded internal budget of {self.deadline_s:.0f}s "
              "— force-exiting before the driver timeout (rc "
              f"{RC_DEADLINE})", file=self.stream, flush=True)
        if self.on_fire is not None:
            try:
                self.on_fire()
            except Exception as e:  # pragma: no cover - best effort
                print(f"# on_fire handler failed: {e}", file=self.stream,
                      flush=True)
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(RC_DEADLINE)

    def cancel(self):
        self._cancelled.set()

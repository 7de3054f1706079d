"""Adaptive LUT tracer convergence semantics (`_trace_adaptive`).

Pins the row-sum-relative criterion added on top of the reference's
per-coefficient rule (`src/boxmc.F90:968-996`): optically thin entries
whose coefficients all sit below stddev_atol used to "converge" after
min_rounds with O(100%) relative noise — and, for all-zero first rounds,
freeze at exactly 0 (an absorbing state; data-dependent stopping made
the ensemble mean biased low).  With the row criterion the estimator
must reach sem_row < max(row_atol, rtol * row_sum).
"""

import numpy as np
import pytest

import tenstream_tpu.optprop.lut as lutmod


class _FakeTracer:
    """Binomial sampler standing in for the BoxMC kernel: entry i has a
    true row total p_i split uniformly over ndiff destinations."""

    def __init__(self, p_rows, ndiff=10, seed=0):
        self.p = np.asarray(p_rows, np.float64)
        self.nd = ndiff
        self.rng = np.random.default_rng(seed)
        self.calls = 0

    def __call__(self, scheme, entries, src, ldir, n_photons, key, **kw):
        self.calls += 1
        idx = entries[:, 0].astype(np.int64)  # entry id smuggled in tau col
        p = self.p[idx]
        counts = self.rng.binomial(n_photons, p[:, None] / self.nd, (idx.size, self.nd))
        S = counts / float(n_photons)
        T = np.zeros((idx.size, 3), np.float32)
        return T.astype(np.float32), S.astype(np.float32)


@pytest.mark.parametrize("p_true", [2e-3, 2e-2])
def test_row_relative_convergence(monkeypatch, p_true):
    fake = _FakeTracer([p_true] * 64)
    monkeypatch.setattr(lutmod, "_trace_entries", fake)
    entries = np.zeros((64, 4), np.float32)
    entries[:, 0] = np.arange(64)
    import jax

    _, S, rounds, sem = lutmod._trace_adaptive(
        "3_10", entries, 0, False, jax.random.PRNGKey(0),
        stddev_atol=5e-4, stddev_rtol=5e-2, round_photons=5120,
        max_rounds=512, row_atol=1e-4,
    )
    rows = S.sum(1)
    # ensemble mean unbiased within 4 sigma of the achieved row sem
    sem_row = np.sqrt((np.asarray(sem, np.float64) ** 2).sum(1))
    tol = 4 * sem_row.mean() / np.sqrt(64)
    assert abs(rows.mean() - p_true) < max(tol, 1e-5), (rows.mean(), p_true)
    # achieved relative accuracy honors the criterion
    target = np.maximum(1e-4, 5e-2 * rows)
    assert (sem_row <= 1.5 * target).all()
    # thin entries must NOT stop at min_rounds anymore
    if p_true < 5e-3:
        assert rounds.min() >= 8


def test_zero_rows_stop_at_floor(monkeypatch):
    # rows whose true total is far below row_atol may stop early (their
    # absolute error is bounded by row_atol) but must not run forever
    fake = _FakeTracer([1e-7] * 16)
    monkeypatch.setattr(lutmod, "_trace_entries", fake)
    entries = np.zeros((16, 4), np.float32)
    entries[:, 0] = np.arange(16)
    import jax

    _, S, rounds, _ = lutmod._trace_adaptive(
        "3_10", entries, 0, False, jax.random.PRNGKey(1),
        stddev_atol=5e-4, stddev_rtol=5e-2, round_photons=5120,
        max_rounds=512, row_atol=1e-4,
    )
    assert rounds.max() <= 64
    assert S.sum(1).max() <= 5e-4

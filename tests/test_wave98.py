"""Wave-98 hand pins: forecast accuracy battery (MASE / sMAPE /
Theil U2) and the Diebold-Mariano test. The battery against plain-
Python recomputation on a constructed daily-count series; DM against
a numpy Newey-West (Bartlett) reference, the better-forecaster sign
convention, and the degenerate-variance -> NULL guard.

Covered spec names: forecast_accuracy_battery, diebold_mariano_naive.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    diebold_mariano,
    forecast_accuracy_battery,
)

_D0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events_df(spark, counts, key="k"):
    # one event row per unit of count on consecutive days
    rows = []
    for day, c in enumerate(counts):
        ts = _D0 + dt.timedelta(days=day)
        rows.extend([(key, ts)] * int(c))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _scored(counts, season=7):
    # (a, fn, fs) triples for days with all three present
    out = []
    for d in range(len(counts)):
        if d - 1 >= 0 and d - season >= 0:
            out.append((counts[d], counts[d - 1], counts[d - season]))
    return out


def _battery_ref(counts, season=7):
    sc = _scored(counts, season)
    sae_s = sum(abs(a - fs) for a, _, fs in sc)
    sae_n = sum(abs(a - fn) for a, fn, _ in sc)
    sse_s = sum((a - fs) ** 2 for a, _, fs in sc)
    sse_n = sum((a - fn) ** 2 for a, fn, _ in sc)
    smape = sum(2.0 * abs(a - fs) / (a + fs) for a, _, fs in sc) / len(sc)
    return (
        len(sc),
        sae_s / sae_n,
        smape,
        (sse_s / sse_n) ** 0.5,
    )


def _dm_ref(counts, season=7, L=7):
    sc = _scored(counts, season)
    d = np.array(
        [(a - fs) ** 2 - (a - fn) ** 2 for a, fn, fs in sc], dtype=float
    )
    n = len(d)
    m = d.mean()
    e = d - m
    s = (e * e).sum() / n
    for lag in range(1, L + 1):
        w = 1.0 - lag / (L + 1.0)
        s += 2.0 * w * (e[:-lag] * e[lag:]).sum() / n
    if s <= 0:
        return m, None
    return m, m / np.sqrt(s / n)


# a bumpy weekly-seasonal count series, 30 days
_COUNTS = [
    5, 9, 14, 7, 6, 11, 20,
    6, 10, 13, 8, 5, 12, 22,
    4, 8, 15, 7, 7, 10, 19,
    6, 11, 14, 6, 5, 13, 21,
    5, 9,
]


def test_battery_matches_reference(spark):
    out = forecast_accuracy_battery(_events_df(spark, _COUNTS)).collect()
    assert len(out) == 1
    r = out[0]
    n, mase, smape, u2 = _battery_ref(_COUNTS)
    assert r.n_days == n
    assert r.mase == pytest.approx(mase, abs=1e-6)
    assert r.smape == pytest.approx(smape, abs=1e-6)
    assert r.theil_u2 == pytest.approx(u2, abs=1e-6)
    # weekly-seasonal series: seasonal-naive must beat naive
    assert r.mase < 1.0
    assert r.theil_u2 < 1.0


def test_dm_matches_newey_west_reference(spark):
    out = diebold_mariano(_events_df(spark, _COUNTS)).collect()
    assert len(out) == 1
    r = out[0]
    m, stat = _dm_ref(_COUNTS)
    assert r.mean_loss_diff == pytest.approx(m, abs=1e-6)
    assert stat is not None
    assert r.dm_stat == pytest.approx(stat, abs=1e-5)
    # seasonal better -> negative loss differential
    assert r.dm_stat < 0


def test_dm_degenerate_variance_is_null(spark):
    # constant counts: every forecast is perfect, d_t = 0 for all t,
    # long-run variance 0 -> NULL, not a division blow-up
    counts = [8] * 20
    out = diebold_mariano(_events_df(spark, counts)).collect()
    assert len(out) == 1
    assert out[0].mean_loss_diff == pytest.approx(0.0)
    assert out[0].dm_stat is None


def test_battery_multiple_keys_ordered(spark):
    df_a = _events_df(spark, _COUNTS, key="a")
    df_b = _events_df(spark, [c + 2 for c in _COUNTS], key="b")
    out = forecast_accuracy_battery(df_a.unionByName(df_b)).collect()
    assert [r.event_type for r in out] == ["a", "b"]

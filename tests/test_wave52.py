"""Wave-52 tests: QQ picks on a known ladder, drawdown hand series,
transition entropy pins, MAD flags, weekday-conditioned anomalies."""

from __future__ import annotations

import datetime as dt
import math


def _events(spark, counts, etype="x", start=None):
    base = start or dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, etype))
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )


def test_qq_compare_known_ladder(spark):
    from mcas_question2_etl_spark.operators.profiling import qq_compare

    # group A = 1..100, group B = 101..200; pooled = 1..200
    rows = [("A", v) for v in range(1, 101)] + [
        ("B", v) for v in range(101, 201)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r.g, r.p): r for r in qq_compare(df, "g", "v").collect()}
    # p=50: A idx = 1 + 99*50//100 = 50 -> value 50; pooled idx
    # 1 + 199*50//100 = 100 -> value 100
    a50 = out[("A", 50)]
    assert a50.q_value == 50 and a50.pooled_q == 100 and a50.diff == -50
    b50 = out[("B", 50)]
    assert b50.q_value == 150 and b50.diff == 50
    assert len(out) == 2 * 19


def test_volume_drawdown_hand_series(spark):
    from mcas_question2_etl_spark.operators.timeseries import volume_drawdown

    # peaks at 8, trough 2 afterward -> drawdown 6 on day index 3
    df = _events(spark, [5, 8, 4, 2, 7])
    out = volume_drawdown(df).collect()[0]
    assert out.max_count == 8 and out.max_drawdown == 6
    assert out.drawdown_day == dt.date(2024, 1, 4)


def test_volume_drawdown_monotone_rise_zero(spark):
    from mcas_question2_etl_spark.operators.timeseries import volume_drawdown

    out = volume_drawdown(_events(spark, [1, 2, 3, 4])).collect()[0]
    assert out.max_drawdown == 0
    assert out.drawdown_day == dt.date(2024, 1, 1)


def test_transition_entropy_deterministic_chain(spark):
    from mcas_question2_etl_spark.operators.entropy import transition_entropy

    base = dt.datetime(2024, 1, 1)
    # one user, strict cycle a->b->a->b: H(next|cur) = 0
    rows = [
        (i + 1, base + dt.timedelta(hours=i), 1, "ab"[i % 2])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = transition_entropy(df).collect()[0]
    assert out.n_transitions == 9 and out.n_states == 2
    assert out.entropy_nats == 0.0 and out.perplexity == 1.0


def test_transition_entropy_uniform_two_states(spark):
    from mcas_question2_etl_spark.operators.entropy import transition_entropy

    base = dt.datetime(2024, 1, 1)
    # from each state, next is a or b equally often: H = ln 2
    seq = "aabb" * 5  # transitions: aa,ab,bb,ba repeating -> balanced
    rows = [
        (i + 1, base + dt.timedelta(hours=i), 1, seq[i])
        for i in range(len(seq))
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = transition_entropy(df).collect()[0]
    assert math.isclose(out.entropy_nats, round(math.log(2), 9), abs_tol=2e-2)


def test_mad_outlier_flags_spike_not_dragged(spark):
    from mcas_question2_etl_spark.operators.timeseries import mad_outlier_days

    # 12 quiet days of 10 +- 1, one 100-spike
    counts = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9, 100]
    out = mad_outlier_days(_events(spark, counts)).collect()[0]
    assert out.median_x == 10 and out.mad == 1
    # modified z of the spike = .6745*90 >> 3.5; quiet days z <= .6745
    assert out.n_outliers == 1


def test_mad_zero_mad_degenerate(spark):
    from mcas_question2_etl_spark.operators.timeseries import mad_outlier_days

    out = mad_outlier_days(_events(spark, [5, 5, 5, 5, 9])).collect()[0]
    assert out.mad == 0
    assert out.n_outliers == 1  # any deviation from the median flags


def test_dow_anomaly_weekday_conditioned(spark):
    from mcas_question2_etl_spark.operators.timeseries import dow_anomaly_days

    # 2024-01-01 is a Monday. Nine quiet Mondays alternating 100/102,
    # a tenth at 200; other weekdays constant 10. (With n-1 quiet days
    # a single outlier's population z tends to sqrt(n-1), so n must be
    # big enough for the spike to clear 2 sigma — 10 Mondays gives
    # z ~ 2.85.) Hot-but-steady Mondays are NOT flagged; constant
    # weekdays have sigma 0 and flag nothing.
    counts = []
    for week in range(9):
        for dow in range(7):
            if dow == 0:
                counts.append(100 if week % 2 == 0 else 102)
            else:
                counts.append(10)
    counts.append(200)  # 10th Monday
    df = _events(spark, counts)
    out = {r.dow: r for r in dow_anomaly_days(df).collect()}
    mondays = [100, 102, 100, 102, 100, 102, 100, 102, 100, 200]
    mu = sum(mondays) / 10
    sig = math.sqrt(sum(x * x for x in mondays) / 10 - mu * mu)
    expect = sum(1 for x in mondays if abs(x - mu) > 2 * sig)
    assert expect == 1  # design check: only the 200-spike clears 2s
    assert out[1].n_days == 10 and out[1].n_anomalies == expect
    for d in range(2, 8):
        assert out[d].n_anomalies == 0

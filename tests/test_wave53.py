"""Wave-53 tests: EB shrinkage directions, delta-method replay, latency
picks, Theil identity, vocab Jaccard hand case."""

from __future__ import annotations

import datetime as dt
import math


def test_eb_shrinkage_pulls_small_samples_harder(spark):
    from pyspark.sql import functions as F
    from mcas_question2_etl_spark.operators.shrinkage import eb_shrunk_rates

    # entity A: 1/2 success; entity B: 50/100; entity C: 10/100;
    # global mean ~ .30; A must move toward the prior far more than B
    rows = (
        [("A", 1), ("A", 0)]
        + [("B", 1)] * 50 + [("B", 0)] * 50
        + [("C", 1)] * 10 + [("C", 0)] * 90
    )
    df = spark.createDataFrame(rows, ["e", "s"])
    out = {r.e: r for r in
           eb_shrunk_rates(df, "e", F.col("s") == 1).collect()}
    m = out["A"].prior_rate
    assert math.isclose(m, 61 / 202, rel_tol=1e-12)
    move_a = abs(out["A"].shrunk_rate - out["A"].raw_rate)
    move_b = abs(out["B"].shrunk_rate - out["B"].raw_rate)
    assert move_a > move_b
    # shrunk stays between raw and prior
    for r in out.values():
        lo, hi = sorted([r.raw_rate, m])
        assert lo - 1e-12 <= r.shrunk_rate <= hi + 1e-12


def test_eb_underdispersion_fallback(spark):
    from pyspark.sql import functions as F
    from mcas_question2_etl_spark.operators.shrinkage import eb_shrunk_rates

    # every entity identical rate -> s2 = 0 -> fallback strength
    rows = [(e, i % 2) for e in "ABCD" for i in range(10)]
    df = spark.createDataFrame(rows, ["e", "s"])
    out = eb_shrunk_rates(df, "e", F.col("s") == 1).collect()
    assert all(r.prior_strength == 50.0 for r in out)
    assert all(math.isclose(r.shrunk_rate, 0.5, rel_tol=1e-12) for r in out)


def test_ratio_ab_python_replay(spark):
    from mcas_question2_etl_spark.operators.evaluation import (
        ratio_metric_ab_test,
    )

    # group A: units with (spend per order rows); B likewise
    rows = []
    a_units = {1: [10.0, 20.0], 2: [30.0], 3: [10.0, 10.0, 10.0]}
    b_units = {4: [5.0], 5: [5.0, 15.0], 6: [25.0, 5.0]}
    for u, sp in a_units.items():
        for p in sp:
            rows.append((u, "A", p))
    for u, sp in b_units.items():
        for p in sp:
            rows.append((u, "B", p))
    df = spark.createDataFrame(rows, ["unit", "seg", "price"])
    out = ratio_metric_ab_test(df, "unit", "seg", "A", "B", "price").collect()[0]

    def stats(units):
        xs = [sum(v) for v in units.values()]
        ys = [len(v) for v in units.values()]
        k = len(xs)
        r = sum(xs) / sum(ys)
        xb, yb = sum(xs) / k, sum(ys) / k
        vx = sum(x * x for x in xs) / k - xb * xb
        vy = sum(y * y for y in ys) / k - yb * yb
        cv = sum(x * y for x, y in zip(xs, ys)) / k - xb * yb
        return r, (vx - 2 * r * cv + r * r * vy) / (k * yb * yb)

    ra, va = stats(a_units)
    rb, vb = stats(b_units)
    assert math.isclose(out.ratio_a, ra, rel_tol=1e-12)
    assert math.isclose(out.ratio_b, rb, rel_tol=1e-12)
    assert math.isclose(out.se, math.sqrt(va + vb), rel_tol=1e-12)
    assert math.isclose(out.z, (ra - rb) / math.sqrt(va + vb), rel_tol=1e-12)


def test_conversion_latency_picks(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        conversion_latency_quantiles,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1..4 convert with latencies 10, 20, 30, 40 minutes; user 5
    # purchases BEFORE clicking (no conversion); user 6 never buys
    for u, lat_min in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        eid += 1
        rows.append((eid, base, u, "click"))
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=lat_min), u, "purchase"))
    eid += 1
    rows.append((eid, base - dt.timedelta(hours=1), 5, "purchase"))
    eid += 1
    rows.append((eid, base, 5, "click"))
    eid += 1
    rows.append((eid, base, 6, "click"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.p: r for r in conversion_latency_quantiles(df).collect()}
    assert out[50].n_users == 4
    # idx(50) = 1 + 3*50//100 = 2 -> 20 min
    assert out[50].latency_us == 20 * 60 * 1_000_000
    assert out[25].latency_us == 10 * 60 * 1_000_000
    assert out[90].latency_us == 30 * 60 * 1_000_000  # idx = 1+270//100 = 3


def test_theil_identity_and_zero_case(spark):
    from mcas_question2_etl_spark.operators.concentration import (
        theil_decomposition,
    )

    # equal values -> T = 0 everywhere
    df = spark.createDataFrame([("a", 5)] * 4 + [("b", 5)] * 4, ["g", "v"])
    out = theil_decomposition(df, "g", "v").collect()
    assert all(abs(r.theil_total) < 1e-9 for r in out)
    # unequal groups: identity T = within + between holds by
    # construction; check between > 0 when means differ
    df2 = spark.createDataFrame(
        [("a", 10)] * 4 + [("b", 40)] * 4, ["g", "v"]
    )
    out2 = theil_decomposition(df2, "g", "v").collect()[0]
    assert out2.within_total == 0.0  # within-group values constant
    assert out2.between_total > 0
    assert math.isclose(
        out2.theil_total, out2.within_total + out2.between_total, rel_tol=1e-12
    )


def test_vocab_jaccard_hand_case(spark):
    from mcas_question2_etl_spark.operators.text import source_vocab_jaccard

    df = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma"),
            ("s1", "beta delta"),
            ("s2", "beta gamma epsilon"),
        ],
        ["source", "text"],
    )
    out = source_vocab_jaccard(df).collect()
    assert len(out) == 1
    r = out[0]
    # s1 vocab {alpha,beta,gamma,delta}, s2 {beta,gamma,epsilon}
    assert r.vocab_a == 4 and r.vocab_b == 3 and r.n_common == 2
    assert math.isclose(r.jaccard, 2 / 5, rel_tol=1e-12)

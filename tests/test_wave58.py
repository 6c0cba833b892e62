"""Wave-58 tests: BT ordering + python replay, attribution credit
conservation, path strings, synthetic-control placebo, price-index
pins."""

from __future__ import annotations

import datetime as dt
import math


def test_bradley_terry_orders_by_strength(spark):
    from mcas_question2_etl_spark.operators.pairwise import (
        bradley_terry_ratings,
    )

    # A beats B 9/1, B beats C 9/1, A beats C 9/1 -> rating A > B > C
    pairs = spark.createDataFrame(
        [(1, 2, 9, 1), (2, 3, 9, 1), (1, 3, 9, 1)],
        ["i", "j", "wins_i", "wins_j"],
    )
    out = {r.player: r for r in bradley_terry_ratings(pairs).collect()}
    assert out[1].rating > out[2].rating > out[3].rating
    assert out[1].wins == 18 and out[1].losses == 2
    # mean-1 normalization
    assert math.isclose(sum(r.rating for r in out.values()), 3.0, rel_tol=1e-5)

    # python replay of the exact MM recursion
    import itertools

    games = {(1, 2): (9, 1), (2, 3): (9, 1), (1, 3): (9, 1)}
    p = {1: 1.0, 2: 1.0, 3: 1.0}
    wins = {1: 18, 2: 10, 3: 2}
    for _ in range(6):
        new = {}
        for i in p:
            d = 0.0
            for (a, b), (wa, wb) in games.items():
                if a == i:
                    d += (wa + wb) / (p[i] + p[b])
                elif b == i:
                    d += (wa + wb) / (p[i] + p[a])
            new[i] = wins[i] / d
        s = sum(new.values())
        p = {i: v * 3 / s for i, v in new.items()}
    for i in p:
        assert math.isclose(out[i].rating, round(p[i], 6), abs_tol=2e-6)


def test_position_attribution_credit_conservation(spark):
    from mcas_question2_etl_spark.operators.attribution import (
        position_based_attribution,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click, view, click, view then purchase -> 4 touches
        (1, base + dt.timedelta(minutes=0), 1, "click"),
        (2, base + dt.timedelta(minutes=1), 1, "view"),
        (3, base + dt.timedelta(minutes=2), 1, "click"),
        (4, base + dt.timedelta(minutes=3), 1, "view"),
        (5, base + dt.timedelta(minutes=4), 1, "purchase"),
        # user 2: single view then purchase -> 100% to view
        (6, base, 2, "view"),
        (7, base + dt.timedelta(minutes=9), 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.touch_type: r for r in position_based_attribution(df).collect()}
    total = sum(r.credit for r in out.values())
    assert math.isclose(total, 2.0, rel_tol=1e-9)  # one unit per conversion
    # user1: first click .4, last view .4, two middles .1 each;
    # user2: view 1.0 -> click = .4 + .1 = .5; view = .4+.1+1.0 = 1.5
    assert math.isclose(out["click"].credit, 0.5, rel_tol=1e-9)
    assert math.isclose(out["view"].credit, 1.5, rel_tol=1e-9)


def test_paths_to_conversion_strings(spark):
    from mcas_question2_etl_spark.operators.markov import paths_to_conversion

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 6 users with identical click>view>click -> purchase journeys
    for u in range(1, 7):
        for i, t in enumerate(["click", "view", "click", "purchase"]):
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=i), u, t))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = paths_to_conversion(df, min_count=2).collect()
    assert len(out) == 1
    assert out[0].path == "click>view>click" and out[0].n_conversions == 6


def test_synthetic_control_placebo_zero(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        synthetic_control_effect,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # both series double between halves -> ratio holds -> effect 0
    for day, mult in [(0, 1), (20, 2)]:
        for _ in range(10 * mult):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "purchase"))
        for _ in range(5 * mult):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "signup"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = synthetic_control_effect(df).collect()[0]
    assert math.isclose(out.ratio, 2.0, rel_tol=1e-12)
    assert math.isclose(out.effect, 0.0, abs_tol=1e-9)


def test_price_index_pins(spark):
    from mcas_question2_etl_spark.operators.econ import price_index_halves

    base = dt.datetime(2024, 1, 1)
    rows = [
        # item 1: price 10 -> 20 (qty 5 -> 4); item 2: 100 -> 100 (2 -> 2)
        (1, 50.0, 5.0, base),
        (1, 80.0, 4.0, base + dt.timedelta(days=30)),
        (2, 200.0, 2.0, base),
        (2, 200.0, 2.0, base + dt.timedelta(days=30)),
    ]
    df = spark.createDataFrame(rows, ["item", "value", "qty", "ts"])
    out = price_index_halves(df, "item", "value", "qty", "ts").collect()[0]
    # L = (20*5 + 100*2)/(10*5 + 100*2) = 300/250 = 1.2
    # P = (20*4 + 100*2)/(10*4 + 100*2) = 280/240
    assert out.n_items == 2
    assert math.isclose(out.laspeyres, 1.2, rel_tol=1e-9)
    assert math.isclose(out.paasche, 280 / 240, rel_tol=1e-9)
    assert math.isclose(
        out.fisher, math.sqrt(1.2 * 280 / 240), rel_tol=1e-9
    )

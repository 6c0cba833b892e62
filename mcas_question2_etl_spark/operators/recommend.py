"""Collaborative-filtering kernels: weighted Slope-One with a
deterministic hold-out evaluation.

Slope-One (Lemire & Maclachlan 2005) is the strongest CF predictor
that needs NO iterative training: precompute, for every item pair
(i, j), the average rating deviation dev_ij = Σ_u (r_ui − r_uj)/c_ij
over users who rated both, then predict r̂_ui as the support-weighted
combination Σ_j (sumdiff_ij + r_uj·c_ij) / Σ_j c_ij. Everything is
exact integer arithmetic — ratings are bigint quantity totals,
deviations stay as (sum, count) pairs, and the prediction is one
rational per test pair — so both engines produce identical doubles.

Scale shape: the pair stage is the classic item-item self-join keyed
on user; pair state is O(items²) AT MOST and in practice bounded by
co-rating sparsity, the same shape every production item-item CF
(Amazon-style) materializes. The raw fact table reduces to the
(user, item) rating matrix in one map-side-combined aggregate first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def slope_one_eval(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    holdout_mod: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Train weighted Slope-One on all (user, item) ratings EXCEPT the
    deterministic hold-out ((user + item) % ``holdout_mod`` == 0),
    predict the held-out ratings, and score MAE against the truth —
    alongside the user-train-mean baseline every CF model must beat.
    Ratings must be integer-valued (bigint); the whole train/predict/
    score path is exact integer sums with one rational per
    prediction. Output (one row): n_train, n_test, n_predictable,
    mae_slope_one, mae_user_mean."""
    r = ratings.select(
        F.col(user_col).cast("bigint").alias("u"),
        F.col(item_col).cast("bigint").alias("i"),
        F.col(rating_col).cast("bigint").alias("r"),
    )
    is_test = (F.col("u") + F.col("i")) % holdout_mod == 0
    train = r.filter(~is_test)
    test = r.filter(is_test)
    # item-pair deviation state from the user-keyed self-join
    a = train.select(
        F.col("u").alias("ua"), F.col("i").alias("ia"), F.col("r").alias("ra")
    )
    b = train.select(
        F.col("u").alias("ub"), F.col("i").alias("ib"), F.col("r").alias("rb")
    )
    devs = (
        a.join(b, (F.col("ub") == F.col("ua")) & (F.col("ib") != F.col("ia")))
        .groupBy(F.col("ia").alias("di"), F.col("ib").alias("dj"))
        .agg(
            F.sum(F.col("ra") - F.col("rb")).cast("bigint").alias("sumdiff"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    # predictions: test pair (u, i) x u's train ratings (j) x dev(i, j)
    tr_u = train.select(
        F.col("u").alias("tu"), F.col("i").alias("tj"), F.col("r").alias("rj")
    )
    joined = (
        test.join(tr_u, F.col("tu") == F.col("u"))
        .join(
            devs,
            (F.col("di") == F.col("i")) & (F.col("dj") == F.col("tj")),
        )
        .groupBy("u", "i", "r")
        .agg(
            F.sum(F.col("sumdiff") + F.col("rj") * F.col("cnt"))
            .cast("bigint")
            .alias("num"),
            F.sum("cnt").cast("bigint").alias("den"),
        )
    )
    user_means = train.groupBy(F.col("u").alias("mu")).agg(
        F.sum("r").cast("bigint").alias("msum"),
        F.count(F.lit(1)).cast("bigint").alias("mcnt"),
    )
    scored = test.join(
        joined.select(
            F.col("u").alias("pu"),
            F.col("i").alias("pi"),
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "pred"
            ),
        ),
        (F.col("pu") == F.col("u")) & (F.col("pi") == F.col("i")),
        "left",
    ).join(user_means, F.col("mu") == F.col("u"), "left")
    g = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.count("pred").cast("bigint").alias("n_predictable"),
        F.sum(F.abs(F.col("pred") - F.col("r").cast("double"))).alias(
            "ae_s1"
        ),
        F.sum(
            F.when(
                F.col("pred").isNotNull() & F.col("msum").isNotNull(),
                F.abs(
                    F.col("msum").cast("double")
                    / F.col("mcnt").cast("double")
                    - F.col("r").cast("double")
                ),
            )
        ).alias("ae_um"),
    )
    n_train = train.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    return n_train.crossJoin(F.broadcast(g)).select(
        "n_train",
        "n_test",
        "n_predictable",
        F.round(
            F.col("ae_s1") / F.col("n_predictable").cast("double"), round_to
        ).alias("mae_slope_one"),
        F.round(
            F.col("ae_um") / F.col("n_predictable").cast("double"), round_to
        ).alias("mae_user_mean"),
    )


def slope_one_eval_sql(
    ratings_sql: str,
    holdout_mod: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`slope_one_eval`. ``ratings_sql`` must
    yield (u, i, r) with integer r."""
    return f"""
    WITH ratings AS MATERIALIZED ({ratings_sql}),
    train AS MATERIALIZED (
      SELECT u, i, r FROM ratings WHERE (u + i) % {holdout_mod} <> 0
    ),
    test AS (
      SELECT u, i, r FROM ratings WHERE (u + i) % {holdout_mod} = 0
    ),
    devs AS MATERIALIZED (
      SELECT a.i AS di, b.i AS dj,
             CAST(SUM(a.r - b.r) AS BIGINT) AS sumdiff,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM train a JOIN train b ON b.u = a.u AND b.i <> a.i
      GROUP BY 1, 2
    ),
    preds AS (
      SELECT t.u, t.i, t.r,
             CAST(SUM(d.sumdiff + tr.r * d.cnt) AS DOUBLE)
               / CAST(SUM(d.cnt) AS DOUBLE) AS pred
      FROM test t
      JOIN train tr ON tr.u = t.u
      JOIN devs d ON d.di = t.i AND d.dj = tr.i
      GROUP BY 1, 2, 3
    ),
    user_means AS (
      SELECT u, CAST(SUM(r) AS BIGINT) AS msum,
             CAST(COUNT(*) AS BIGINT) AS mcnt
      FROM train GROUP BY u
    ),
    scored AS (
      SELECT t.u, t.i, t.r, p.pred, m.msum, m.mcnt
      FROM test t
      LEFT JOIN preds p ON p.u = t.u AND p.i = t.i
      LEFT JOIN user_means m ON m.u = t.u
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(COUNT(pred) AS BIGINT) AS n_predictable,
             SUM(ABS(pred - CAST(r AS DOUBLE))) AS ae_s1,
             SUM(CASE WHEN pred IS NOT NULL AND msum IS NOT NULL
                      THEN ABS(CAST(msum AS DOUBLE) / CAST(mcnt AS DOUBLE)
                               - CAST(r AS DOUBLE)) END) AS ae_um
      FROM scored
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_train,
           n_test, n_predictable,
           ROUND(ae_s1 / CAST(n_predictable AS DOUBLE), {round_to})
             AS mae_slope_one,
           ROUND(ae_um / CAST(n_predictable AS DOUBLE), {round_to})
             AS mae_user_mean
    FROM g
    """

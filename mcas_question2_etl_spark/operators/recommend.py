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


# ──────────────────────────────────────────────────────────────────────────
# wave 125: item-item cosine similarity (binary co-occurrence CF)
# ──────────────────────────────────────────────────────────────────────────


def item_cosine_topk(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    top_k: int = 20,
    min_support: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Item-item cosine similarity over binary basket co-occurrence —
    the similarity matrix behind Amazon-style item-item CF
    (Linden/Smith/York 2003): ``cos(i,j) = c_ij / sqrt(n_i n_j)``
    where c_ij counts baskets containing both and n_i baskets
    containing i. Unlike slope_one's rating deviations this is the
    BINARY/implicit-feedback path, and unlike association-rule
    confidence it is symmetric and length-normalized.

    Everything is exact integer counts; the only double is the final
    ``c / sqrt(n_i·n_j)`` — one IEEE sqrt + divide on exact integers,
    bit-identical in any engine. (cos desc, i asc, j asc) is a total
    order, so the global top-``top_k`` cut is deterministic.

    Scale shape: the pair stage is the basket-keyed self-join (i < j),
    bounded by basket sparsity — identical to the slope_one /
    copurchase pair discipline; item marginals broadcast back onto the
    pair aggregate. Output: top_k rows (item_i, item_j, n_i, n_j,
    c_ij, cosine).
    """
    bi = baskets.select(
        F.col(basket_col).cast("bigint").alias("b"),
        F.col(item_col).cast("bigint").alias("i"),
    ).distinct()
    n_items = bi.groupBy(F.col("i").alias("mi")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = bi.select(F.col("b").alias("ba"), F.col("i").alias("ia"))
    c = (
        a.join(
            bi.select(F.col("b").alias("bb"), F.col("i").alias("ib")),
            (F.col("bb") == F.col("ba")) & (F.col("ia") < F.col("ib")),
        )
        .groupBy(
            F.col("ia").alias("item_i"), F.col("ib").alias("item_j")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ij"))
        .filter(F.col("c_ij") >= min_support)
    )
    withn = (
        c.join(F.broadcast(n_items), c["item_i"] == n_items["mi"])
        .select("item_i", "item_j", "c_ij", F.col("n").alias("n_i"))
        .join(F.broadcast(n_items), F.col("item_j") == n_items["mi"])
        .select("item_i", "item_j", "n_i", F.col("n").alias("n_j"), "c_ij")
    )
    cos = F.col("c_ij").cast("double") / F.sqrt(
        (F.col("n_i") * F.col("n_j")).cast("double")
    )
    return (
        withn.withColumn("cosine", F.round(cos, round_to))
        .orderBy(
            F.col("cosine").desc(),
            F.col("item_i").asc(),
            F.col("item_j").asc(),
        )
        .limit(top_k)
    )


def item_cosine_topk_sql(
    baskets_sql: str,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    top_k: int = 20,
    min_support: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`item_cosine_topk`."""
    return f"""
    WITH src AS ({baskets_sql}),
    bi AS (
      SELECT DISTINCT CAST({basket_col} AS BIGINT) AS b,
                      CAST({item_col} AS BIGINT) AS i
      FROM src
    ),
    n_items AS (
      SELECT i AS mi, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY i
    ),
    pairs AS (
      SELECT a.i AS item_i, x.i AS item_j,
             CAST(COUNT(*) AS BIGINT) AS c_ij
      FROM bi a JOIN bi x ON x.b = a.b AND a.i < x.i
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_support}
    )
    SELECT item_i, item_j, ni.n AS n_i, nj.n AS n_j, c_ij,
           ROUND(CAST(c_ij AS DOUBLE)
                 / sqrt(CAST(ni.n * nj.n AS DOUBLE)), {round_to}) AS cosine
    FROM pairs
    JOIN n_items ni ON ni.mi = item_i
    JOIN n_items nj ON nj.mi = item_j
    ORDER BY cosine DESC, item_i ASC, item_j ASC
    LIMIT {top_k}
    """

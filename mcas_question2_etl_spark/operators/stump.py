"""Decision-stump split finding — the one-pass CART primitive.

A depth-1 tree (find the single (threshold) split of a numeric
feature that best separates a binary label by Gini impurity) is the
inner loop of every tree ensemble, and its scale shape is the point:
the naive form evaluates every candidate threshold with a rescan,
but binned prefix-sums evaluate ALL candidates from ONE pass —

1. bin the feature into ``n_bins`` fixed equi-width bins; aggregate
   (n, n_pos) per bin — the only corpus-sized stage, map-side
   combined to <= n_bins rows;
2. prefix-sum the bin table (ordered window over <= n_bins rows);
   every bin boundary's left/right class counts are now available;
3. score each boundary's weighted Gini and argmin — integer counts
   all the way, double only in the final impurity arithmetic.

This is exactly how distributed GBDT implementations (XGBoost
approx/hist modes, LightGBM) find splits — histograms, not sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_expr: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Best Gini split of ``feature_col`` for the boolean SQL
    expression ``label_expr``, over ``n_bins`` equi-width bins on
    [lo, hi) (values outside clamp to the end bins — explicit integer
    floor-divide, the repo's histogram discipline).

    Gini of a side: ``1 - p² - (1-p)²``; a split's score is the
    count-weighted average of its sides, and the reported gain is
    root Gini minus that. Ties break to the LOWEST threshold.

    Output (one row): (n, n_pos, bin_split, threshold, n_left,
    pos_left, n_right, pos_right, gini_gain).
    """
    width = (hi - lo) / n_bins
    x = F.col(feature_col).cast("double")
    b = F.least(
        F.greatest(
            F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    bins = df.select(
        b.alias("__b"), F.expr(label_expr).cast("int").alias("__y")
    ).groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__y").cast("bigint").alias("__pos"),
    )
    w_ord = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    pre = (
        bins.withColumn("__nl", F.sum("__n").over(w_ord))
        .withColumn("__pl", F.sum("__pos").over(w_ord))
        .withColumn("__nt", F.sum("__n").over(w_all))
        .withColumn("__pt", F.sum("__pos").over(w_all))
    )

    def _gini(pos, n):
        p = pos.cast("double") / n.cast("double")
        return 1.0 - p * p - (1.0 - p) * (1.0 - p)

    nl, pl = F.col("__nl"), F.col("__pl")
    nr, pr = F.col("__nt") - nl, F.col("__pt") - pl
    weighted = (
        nl.cast("double") * _gini(pl, nl) + nr.cast("double") * _gini(pr, nr)
    ) / F.col("__nt").cast("double")
    gain = _gini(F.col("__pt"), F.col("__nt")) - weighted
    cands = pre.filter((nl > 0) & (nr > 0)).withColumn("__gain", gain)
    best = cands.orderBy(F.col("__gain").desc(), F.col("__b").asc()).limit(1)
    return best.select(
        F.col("__nt").alias("n"),
        F.col("__pt").alias("n_pos"),
        F.col("__b").cast("int").alias("bin_split"),
        F.round(F.lit(lo) + (F.col("__b") + 1) * F.lit(width), round_to).alias(
            "threshold"
        ),
        nl.alias("n_left"),
        pl.alias("pos_left"),
        nr.cast("bigint").alias("n_right"),
        pr.cast("bigint").alias("pos_right"),
        F.round("__gain", round_to).alias("gini_gain"),
    )


def decision_stump_sql(
    table: str,
    feature_col: str,
    label_expr: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`decision_stump`."""
    width = (hi - lo) / n_bins
    return f"""
    WITH bins AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST({feature_col} AS DOUBLE)
                                        - {lo!r}) / {width!r}) AS INTEGER),
                            0), {n_bins - 1}) AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM {table} GROUP BY 1
    ),
    pre AS (
      SELECT b,
             SUM(n) OVER w AS nl,
             SUM(pos) OVER w AS pl,
             SUM(n) OVER () AS nt,
             SUM(pos) OVER () AS pt
      FROM bins
      WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
    ),
    cands AS (
      SELECT *,
        (1.0 - (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             * (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             - (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
               * (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)))
        - (CAST(nl AS DOUBLE)
             * (1.0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                    * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                    - (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                      * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
           + CAST(nt - nl AS DOUBLE)
             * (1.0 - (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                    * (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                    - (1.0 - CAST(pt - pl AS DOUBLE)
                             / CAST(nt - nl AS DOUBLE))
                      * (1.0 - CAST(pt - pl AS DOUBLE)
                               / CAST(nt - nl AS DOUBLE))))
          / CAST(nt AS DOUBLE)
        AS gain
      FROM pre
      WHERE nl > 0 AND nt - nl > 0
    )
    SELECT CAST(nt AS BIGINT) AS n,
           CAST(pt AS BIGINT) AS n_pos,
           CAST(b AS INTEGER) AS bin_split,
           ROUND(CAST({lo!r} AS DOUBLE)
                 + (b + 1) * CAST({width!r} AS DOUBLE),
                 {round_to}) AS threshold,
           CAST(nl AS BIGINT) AS n_left,
           CAST(pl AS BIGINT) AS pos_left,
           CAST(nt - nl AS BIGINT) AS n_right,
           CAST(pt - pl AS BIGINT) AS pos_right,
           ROUND(gain, {round_to}) AS gini_gain
    FROM cands
    ORDER BY gain DESC, b ASC
    LIMIT 1
    """

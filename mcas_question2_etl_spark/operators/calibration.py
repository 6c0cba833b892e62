"""Probability-calibration diagnostics: Expected Calibration Error and
the Murphy decomposition of the Brier score (reliability − resolution
+ uncertainty) over equal-width confidence bins.

A scorer that RANKS well can still be miscalibrated (say 0.9 and be
right 60% of the time); every downstream threshold or expected-cost
decision silently assumes calibration. These are the standard
diagnostics (Guo et al. ICML 2017 for ECE; Murphy 1973 for the
decomposition).

Determinism discipline (wave 118): scores are QUANTIZED to 4 decimals
and carried as DECIMAL(7,4) — so per-bin score sums and the Brier sum
of squares accumulate exactly in any order; bin membership is integer
math on the quantized score (score_q * bins // 1.0001-free: pure
decimal-to-int scaling); outcomes are 0/1 integers. The only doubles
are per-bin closed-form ratios, folded across the <= ``bins`` rows in
a FIXED sorted order (the wave-129 sorted-fold trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """ECE + Brier decomposition. ``score_col`` must be in [0, 1]
    (quantized internally to 4 dp); ``label_col`` boolean.

    Output (one row): (n, n_bins_used, brier, reliability, resolution,
    uncertainty, ece). Murphy's identity brier = reliability -
    resolution + uncertainty holds EXACTLY when scores are constant
    within each bin; in general brier exceeds it by the within-bin
    score variance (the tests pin both cases).

    Plan: one scan -> B-row bin aggregate -> fixed-order fold. O(rows)
    with a B-row shuffle at any corpus size.
    """
    q = F.round(F.col(score_col), 4).cast("decimal(7,4)")
    y = F.col(label_col).cast("boolean").cast("int")
    pts = df.select(q.alias("__s"), y.alias("__y")).select(
        "__s",
        "__y",
        # bin = floor(s * bins) in pure integer math on the quantized
        # score (s*10000 is an exact integer), clamped so s = 1.0
        # lands in the last bin
        F.least(
            F.expr(
                f"(cast(__s * 10000 as bigint) * {bins}) div 10000"
            ),
            F.lit(bins - 1).cast("bigint"),
        ).alias("__b"),
    )
    per_bin = pts.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("__y").cast("bigint").alias("yb"),
        F.sum("__s").alias("sb"),  # decimal-exact
        F.sum(
            (F.col("__s") - F.col("__y")) * (F.col("__s") - F.col("__y"))
        ).alias("sqb"),  # decimal-exact (scale 8)
    )
    tot = per_bin.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.sum("yb").cast("bigint").alias("yall"),
        F.sum("sqb").alias("sqall"),  # decimal-exact
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        F.sort_array(
            F.collect_list(F.struct("__b", "nb", "yb", "sb"))
        ).alias("bs"),
    )

    def _fold(expr):
        return F.expr(
            "aggregate(bs, cast(0.0 as double), (acc, x) -> acc + "
            + expr
            + ")"
        )

    nn = F.col("n").cast("double")
    ybar = F.col("yall").cast("double") / nn
    # reliability = sum_b nb*(conf_b - acc_b)^2 / n ; resolution =
    # sum_b nb*(acc_b - ybar)^2 / n — acc/conf are per-bin rationals
    rel = (
        _fold(
            "x.nb * (cast(x.sb as double)/x.nb - cast(x.yb as double)/x.nb)"
            " * (cast(x.sb as double)/x.nb - cast(x.yb as double)/x.nb)"
        )
        / nn
    )
    res_expr = (
        "x.nb * (cast(x.yb as double)/x.nb - {yb}) "
        "* (cast(x.yb as double)/x.nb - {yb})"
    )
    ece = (
        _fold(
            "x.nb * abs(cast(x.sb as double)/x.nb - cast(x.yb as double)/x.nb)"
        )
        / nn
    )
    out = tot.withColumn("__ybar", ybar)
    res = (
        F.expr(
            "aggregate(bs, cast(0.0 as double), (acc, x) -> acc + "
            + res_expr.format(yb="__ybar")
            + ")"
        )
        / nn
    )
    unc = ybar * (F.lit(1.0) - ybar)
    return out.select(
        "n",
        "n_bins_used",
        F.round(F.col("sqall").cast("double") / nn, round_to).alias("brier"),
        F.round(rel, round_to).alias("reliability"),
        F.round(res, round_to).alias("resolution"),
        F.round(unc, round_to).alias("uncertainty"),
        F.round(ece, round_to).alias("ece"),
    )


def calibration_report_sql(
    src_sql: str,
    score_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`calibration_report` (same quantization,
    same integer bin math, same fixed-order fold)."""
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT CAST(round({score_col}, 4) AS DECIMAL(7,4)) AS s,
             CASE WHEN {label_col} THEN 1 ELSE 0 END AS y
      FROM src
    ),
    binned AS (
      SELECT s, y,
             LEAST(CAST(s * 10000 AS BIGINT) * {bins} // 10000,
                   {bins - 1}) AS b
      FROM pts
    ),
    per_bin AS (
      SELECT b,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(y) AS BIGINT) AS yb,
             CAST(SUM(s) AS DECIMAL(28,4)) AS sb,
             CAST(SUM((s - y) * (s - y)) AS DECIMAL(28,8)) AS sqb
      FROM binned GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(nb) AS BIGINT) AS n,
             CAST(SUM(yb) AS BIGINT) AS yall,
             CAST(SUM(sqb) AS DECIMAL(38,8)) AS sqall,
             CAST(COUNT(*) AS BIGINT) AS n_bins_used,
             list(nb ORDER BY b) AS nbs,
             list(yb ORDER BY b) AS ybs,
             list(CAST(sb AS DOUBLE) ORDER BY b) AS sbs
      FROM per_bin
    ),
    folded AS (
      SELECT *,
        CAST(yall AS DOUBLE) / n AS ybar,
        list_reduce(list_prepend(0.0, list_transform(range(1, n_bins_used + 1),
          i -> nbs[i] * (sbs[i]/nbs[i] - CAST(ybs[i] AS DOUBLE)/nbs[i])
                      * (sbs[i]/nbs[i] - CAST(ybs[i] AS DOUBLE)/nbs[i]))),
          (a, v) -> a + v) / n AS rel,
        list_reduce(list_prepend(0.0, list_transform(range(1, n_bins_used + 1),
          i -> nbs[i] * (CAST(ybs[i] AS DOUBLE)/nbs[i] - CAST(yall AS DOUBLE)/n)
                      * (CAST(ybs[i] AS DOUBLE)/nbs[i] - CAST(yall AS DOUBLE)/n))),
          (a, v) -> a + v) / n AS res,
        list_reduce(list_prepend(0.0, list_transform(range(1, n_bins_used + 1),
          i -> nbs[i] * abs(sbs[i]/nbs[i] - CAST(ybs[i] AS DOUBLE)/nbs[i]))),
          (a, v) -> a + v) / n AS ece
      FROM tot
    )
    SELECT n, n_bins_used,
           ROUND(CAST(sqall AS DOUBLE) / n, {round_to}) AS brier,
           ROUND(rel, {round_to}) AS reliability,
           ROUND(res, {round_to}) AS resolution,
           ROUND(ybar * (1.0 - ybar), {round_to}) AS uncertainty,
           ROUND(ece, {round_to}) AS ece
    FROM folded
    """

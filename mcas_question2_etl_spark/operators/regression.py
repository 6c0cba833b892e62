"""Per-group ordinary least squares via sufficient statistics.

The reference fits one global weighted GLM in R (run_analysis.Rmd:80-99,
SURVEY §2.12 M1 — mirrored in ml/glm.py). A user scaling that analysis
up immediately wants the *grouped* variant: an independent simple
regression per key (per district, per product segment, ...). Fitting
millions of tiny models is not an iterative-solver problem — simple OLS
has a closed form over six sufficient statistics, so the whole thing is
ONE hash aggregation:

    n, Sx = SUM(x), Sy = SUM(y), Sxx = SUM(x*x), Syy = SUM(y*y),
    Sxy = SUM(x*y)
    slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    intercept = (Sy - slope*Sx) / n
    r2        = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

Scale notes:
  * One shuffle on the group key; partial aggregation (map-side combine)
    reduces each partition to six doubles per key before the exchange,
    so the shuffle volume is O(distinct keys), independent of row count.
  * All arithmetic is JVM-side whole-stage-codegen expressions — no UDF,
    no per-group iteration, no driver involvement. A billion groups cost
    the same plan shape as ten.
  * The raw-moment formula can lose precision when x has a huge mean and
    tiny variance (classic catastrophic cancellation); callers with such
    data should center x first. For cross-engine differential checks the
    same formula is spelled out in the oracle so both sides make the
    identical floating-point choices, then outputs are rounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.fanout import fan_out


def group_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
) -> DataFrame:
    """Per-group simple OLS of ``y`` on ``x``: slope, intercept, r2, n.

    Rows where either coordinate is NULL are excluded (SQL aggregate
    null-skipping matches R's ``lm(..., na.action=na.omit)`` and
    DuckDB's ``regr_*`` family). Groups with zero x-variance yield NULL
    slope/intercept/r2 (division by zero → NULL, as in SQL).
    """
    xv = F.when(F.col(y).isNotNull(), F.col(x).cast("double"))
    yv = F.when(F.col(x).isNotNull(), F.col(y).cast("double"))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(F.col(x).isNotNull() & F.col(y).isNotNull(), 1)).alias("n"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv * xv).alias("sxx"),
        F.sum(yv * yv).alias("syy"),
        F.sum(xv * yv).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / F.when(varx_n != 0, varx_n)
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov_n * cov_n) / F.when(varx_n * vary_n != 0, varx_n * vary_n)
    return agg.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def group_ols_oracle_sql(
    table: str, group_cols: Sequence[str], x: str, y: str, round_to: int = 4
) -> str:
    """ANSI SQL computing the same sufficient-statistics formula.

    Spelled out (rather than ``regr_slope``/``regr_r2``) so the oracle
    engine follows the identical raw-moment arithmetic; both sides are
    then rounded to ``round_to`` decimals for a stable cross-engine
    hash.
    """
    keys = ", ".join(group_cols)
    return f"""
    WITH s AS (
      SELECT {keys},
             COUNT(CASE WHEN {x} IS NOT NULL AND {y} IS NOT NULL THEN 1 END) AS n,
             SUM(CASE WHEN {y} IS NOT NULL THEN CAST({x} AS DOUBLE) END) AS sx,
             SUM(CASE WHEN {x} IS NOT NULL THEN CAST({y} AS DOUBLE) END) AS sy,
             SUM(CASE WHEN {y} IS NOT NULL
                 THEN CAST({x} AS DOUBLE) * CAST({x} AS DOUBLE) END) AS sxx,
             SUM(CASE WHEN {x} IS NOT NULL
                 THEN CAST({y} AS DOUBLE) * CAST({y} AS DOUBLE) END) AS syy,
             SUM(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE)) AS sxy
      FROM {table} GROUP BY {keys}
    ), d AS (
      SELECT *, CAST(n AS DOUBLE) AS nd,
             CAST(n AS DOUBLE) * sxy - sx * sy AS cov_n,
             CAST(n AS DOUBLE) * sxx - sx * sx AS varx_n,
             CAST(n AS DOUBLE) * syy - sy * sy AS vary_n
      FROM s
    )
    SELECT {keys}, n,
           ROUND(cov_n / (CASE WHEN varx_n <> 0 THEN varx_n END), {round_to})
             AS slope,
           ROUND((sy - (cov_n / (CASE WHEN varx_n <> 0 THEN varx_n END)) * sx)
                 / nd, {round_to}) AS intercept,
           ROUND((cov_n * cov_n) /
                 (CASE WHEN varx_n * vary_n <> 0 THEN varx_n * vary_n END),
                 {round_to}) AS r2
    FROM d
    """


def isotonic_fit(
    bucketed: DataFrame,
    bucket_col: str,
    num_col: str,
    den_col: str,
) -> DataFrame:
    """Weighted L2 isotonic regression (nondecreasing) over a bucketed
    curve — the calibration step that turns a raw score-vs-rate curve
    into a monotone one (quality-score -> dup-rate, acctbal ->
    urgency, model-score -> precision). Classically solved by
    pool-adjacent-violators; PAV's sequential pooling is hostile to
    a distributed engine, so this uses the equivalent closed MINIMAX
    form (Robertson/Wright/Dykstra, "Order Restricted Statistical
    Inference", 1988):

        iso(t) = max_{i<=t} min_{j>=t} wavg(y[i..j])

    Input: one row per bucket with an exact integer/decimal numerator
    (``num_col``, e.g. positive-outcome count) and denominator
    (``den_col``, e.g. trials). Interval averages come from prefix
    sums, so every wavg is ONE double division of exact integers —
    bit-identical across engines; max/min over identical doubles is
    exact, giving a rounding-free oracle.

    Scale shape: the bucket table is tiny by construction (k buckets
    <= a few hundred: the heavy lifting — bucketing the corpus — is
    the caller's single aggregation pass). The (t,i,j) triple join is
    O(k^3) fixed-width rows, all broadcastable; the corpus itself is
    touched exactly once, upstream. Output: (bucket, n, rate,
    iso_rate) with rate the raw bucket mean.
    """
    from pyspark.sql import Window

    w = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = bucketed.select(
        F.col(bucket_col).alias("t"),
        F.col(den_col).cast("bigint").alias("n"),
        (
            F.col(num_col).cast("double") / F.col(den_col).cast("double")
        ).alias("rate"),
        F.sum(F.col(num_col).cast("decimal(38,0)")).over(w).alias("pn"),
        F.sum(F.col(den_col).cast("decimal(38,0)")).over(w).alias("pd"),
    )
    lo = pre.select(
        F.col("t").alias("i"),
        F.col("pn").alias("pni"),
        F.col("pd").alias("pdi"),
    )
    hi = pre.select(
        F.col("t").alias("j"), F.col("pn").alias("pnj"), F.col("pd").alias("pdj")
    )
    # wavg(i..j) = (P_j - P_{i-1}) / (W_j - W_{i-1}); express P_{i-1}
    # as P_i - bucket_i's own mass to avoid a lag join
    own = bucketed.select(
        F.col(bucket_col).alias("i"),
        F.col(num_col).cast("decimal(38,0)").alias("oi_n"),
        F.col(den_col).cast("decimal(38,0)").alias("oi_d"),
    )
    intervals = (
        lo.join(own, "i")
        .crossJoin(hi)
        .where(F.col("j") >= F.col("i"))
        .select(
            "i",
            "j",
            (
                (F.col("pnj") - F.col("pni") + F.col("oi_n")).cast("double")
                / (F.col("pdj") - F.col("pdi") + F.col("oi_d")).cast("double")
            ).alias("wavg"),
        )
    )
    t_axis = pre.select(F.col("t"), "n", "rate")
    inner = (
        t_axis.join(
            intervals,
            (F.col("i") <= F.col("t")) & (F.col("j") >= F.col("t")),
        )
        .groupBy("t", "n", "rate", "i")
        .agg(F.min("wavg").alias("mn"))
    )
    return (
        inner.groupBy("t", "n", "rate")
        .agg(F.max("mn").alias("iso_rate"))
        .select(
            F.col("t").alias(bucket_col), "n", "rate", "iso_rate"
        )
    )


def isotonic_fit_sql(
    bucketed_sql: str,
    bucket_col: str = "bucket",
    num_col: str = "num",
    den_col: str = "den",
) -> str:
    """DuckDB twin of :func:`isotonic_fit`; ``bucketed_sql`` must yield
    (bucket_col, num_col, den_col) at the bucket grain."""
    return f"""
    WITH bucketed AS ({bucketed_sql}),
    pre AS (
      SELECT {bucket_col} AS t,
             CAST({den_col} AS BIGINT) AS n,
             CAST({num_col} AS DOUBLE) / CAST({den_col} AS DOUBLE) AS rate,
             SUM(CAST({num_col} AS DECIMAL(38,0))) OVER
               (ORDER BY {bucket_col} ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS pn,
             SUM(CAST({den_col} AS DECIMAL(38,0))) OVER
               (ORDER BY {bucket_col} ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS pd,
             CAST({num_col} AS DECIMAL(38,0)) AS oi_n,
             CAST({den_col} AS DECIMAL(38,0)) AS oi_d
      FROM bucketed
    ),
    intervals AS (
      SELECT lo.t AS i, hi.t AS j,
             CAST(hi.pn - lo.pn + lo.oi_n AS DOUBLE)
               / CAST(hi.pd - lo.pd + lo.oi_d AS DOUBLE) AS wavg
      FROM pre lo JOIN pre hi ON hi.t >= lo.t
    ),
    inner_min AS (
      SELECT pre.t, pre.n, pre.rate, intervals.i, MIN(wavg) AS mn
      FROM pre JOIN intervals
        ON intervals.i <= pre.t AND intervals.j >= pre.t
      GROUP BY pre.t, pre.n, pre.rate, intervals.i
    )
    SELECT t AS {bucket_col}, n, rate, MAX(mn) AS iso_rate
    FROM inner_min GROUP BY t, n, rate
    """


def ransac_line(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    seed_mod: int = 7,
    seed_rem: int = 3,
    eps_frac: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """RANSAC line fit over a daily series — the high-breakdown
    alternative to OLS (`group_ols`) and Theil-Sen: candidate lines
    come from pairs of DETERMINISTIC seed days (``day % seed_mod ==
    seed_rem`` — the repo's modular-seed discipline, no RNG), each
    candidate is scored by its INLIER COUNT (|residual| <= eps where
    ``eps = eps_frac * stddev(y)``), and the best model wins with a
    lowest-seed-pair tie-break.

    Scale shape: seeds are a fixed fraction of DAYS (tiny), so the
    candidate set is bounded pairs-of-seeds; scoring is ONE
    broadcast join of candidates against the daily table with an
    integer count aggregate — no per-candidate rescan, no O(n²) on
    the data. Inlier decisions compare 6dp-ROUNDED residuals to a
    4dp-ROUNDED eps so a last-ulp stddev difference cannot flip a
    count across engines.

    Output (one row): (n_days, n_candidates, x1, x2, slope,
    intercept, n_inliers, inlier_frac).
    """
    pts = daily.select(
        F.col(date_col).cast("bigint").alias("__x"),
        F.col(value_col).cast("double").alias("__y"),
    )
    stats = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.round(
            F.stddev_samp("__y") * F.lit(float(eps_frac)), 4
        ).alias("__eps"),
    )
    seeds = pts.filter(F.col("__x") % seed_mod == seed_rem)
    a = seeds.select(F.col("__x").alias("x1"), F.col("__y").alias("y1"))
    b = seeds.select(F.col("__x").alias("x2"), F.col("__y").alias("y2"))
    cands = (
        a.join(b, F.col("x1") < F.col("x2"))
        .select(
            "x1",
            "x2",
            (
                (F.col("y2") - F.col("y1"))
                / (F.col("x2") - F.col("x1")).cast("double")
            ).alias("__b"),
            (
                F.col("y1")
                - (F.col("y2") - F.col("y1"))
                / (F.col("x2") - F.col("x1")).cast("double")
                * F.col("x1")
            ).alias("__a"),
        )
    )
    scored = (
        pts.crossJoin(F.broadcast(cands))
        .crossJoin(F.broadcast(stats))
        .groupBy("x1", "x2", "__a", "__b", "__n", "__eps")
        .agg(
            F.sum(
                (
                    F.round(
                        F.abs(
                            F.col("__y")
                            - (F.col("__a") + F.col("__b") * F.col("__x"))
                        ),
                        6,
                    )
                    <= F.col("__eps")
                ).cast("long")
            )
            .cast("bigint")
            .alias("n_inliers")
        )
    )
    n_cand = cands.count()
    if n_cand == 0:
        # fewer than two seed days (day % seed_mod == seed_rem) means
        # no candidate pairs exist; fail loudly instead of handing a
        # zero-row frame to one-row downstream consumers
        raise ValueError(
            "ransac_line: degenerate seed set — fewer than two days "
            f"satisfy day % {seed_mod} == {seed_rem}; widen seed_mod/"
            "seed_rem or supply a longer series"
        )
    best = scored.orderBy(
        F.col("n_inliers").desc(), F.col("x1").asc(), F.col("x2").asc()
    ).limit(1)
    return best.select(
        F.col("__n").alias("n_days"),
        F.lit(n_cand).cast("bigint").alias("n_candidates"),
        "x1",
        "x2",
        F.round("__b", round_to).alias("slope"),
        F.round("__a", round_to).alias("intercept"),
        "n_inliers",
        F.round(
            F.col("n_inliers").cast("double") / F.col("__n"), round_to
        ).alias("inlier_frac"),
    )


def ransac_line_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    seed_mod: int = 7,
    seed_rem: int = 3,
    eps_frac: float = 0.5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ransac_line`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({date_col} AS BIGINT) AS x,
             CAST({value_col} AS DOUBLE) AS y
      FROM d
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(stddev_samp(y) * CAST({eps_frac!r} AS DOUBLE), 4) AS eps
      FROM pts
    ),
    seeds AS (SELECT x, y FROM pts WHERE x % {seed_mod} = {seed_rem}),
    cands AS (
      SELECT a.x AS x1, b.x AS x2,
             (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope,
             a.y - (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) * a.x
               AS intercept
      FROM seeds a JOIN seeds b ON a.x < b.x
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cands),
    scored AS (
      SELECT c.x1, c.x2, c.slope, c.intercept, s.n, s.eps,
             CAST(SUM(CASE WHEN ROUND(ABS(p.y - (c.intercept
                                               + c.slope * p.x)), 6)
                                <= s.eps
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
      FROM pts p CROSS JOIN cands c CROSS JOIN stats s
      GROUP BY c.x1, c.x2, c.slope, c.intercept, s.n, s.eps
    )
    SELECT s.n AS n_days, nc.n_candidates, s.x1, s.x2,
           ROUND(s.slope, {round_to}) AS slope,
           ROUND(s.intercept, {round_to}) AS intercept,
           s.n_inliers,
           ROUND(CAST(s.n_inliers AS DOUBLE) / s.n, {round_to})
             AS inlier_frac
    FROM scored s CROSS JOIN nc
    ORDER BY s.n_inliers DESC, s.x1 ASC, s.x2 ASC
    LIMIT 1
    """


def deming_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Deming (orthogonal / total-least-squares) regression, error
    ratio 1 — the line that minimizes PERPENDICULAR distances, for
    when BOTH variables carry measurement error (OLS assumes x is
    exact and attenuates the slope; `group_ols` vs this is the
    method-comparison classic). Closed form from the centered
    moments:

      ``slope = (Syy - Sxx + sqrt((Syy - Sxx)² + 4 Sxy²))
                / (2 Sxy)``.

    All five sufficient moments accumulate as EXACT decimals in one
    map-side-combined aggregate (corpus scanned once); the final
    quadratic runs in double on bit-identical inputs.

    Output (one row): (n, slope, intercept, slope_ols, attenuation).
    """
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    nn = F.col("__n").cast("double")
    sxx = F.col("__sxx").cast("double") - F.col("__sx").cast("double") * F.col("__sx").cast("double") / nn
    syy = F.col("__syy").cast("double") - F.col("__sy").cast("double") * F.col("__sy").cast("double") / nn
    sxy = F.col("__sxy").cast("double") - F.col("__sx").cast("double") * F.col("__sy").cast("double") / nn
    slope = (
        syy - sxx + F.sqrt((syy - sxx) * (syy - sxx) + 4.0 * sxy * sxy)
    ) / (2.0 * sxy)
    mx = F.col("__sx").cast("double") / nn
    my = F.col("__sy").cast("double") / nn
    ols = sxy / sxx
    return m.select(
        F.col("__n").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(my - slope * mx, round_to).alias("intercept"),
        F.round(ols, round_to).alias("slope_ols"),
        F.round(ols / slope, round_to).alias("attenuation"),
    )


def deming_regression_sql(
    table: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`deming_regression`."""
    dx = f"CAST({x_col} AS DECIMAL(18,2))"
    dy = f"CAST({y_col} AS DECIMAL(18,2))"
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM({dx}) AS sx, SUM({dy}) AS sy,
             SUM({dx} * {dx}) AS sxx, SUM({dy} * {dy}) AS syy,
             SUM({dx} * {dy}) AS sxy
      FROM {table}
    ),
    c AS (
      SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(n AS DOUBLE) AS cxx,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE) AS cyy,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE) AS cxy
      FROM m
    )
    SELECT n,
           ROUND((cyy - cxx + SQRT((cyy - cxx) * (cyy - cxx)
                                   + 4.0 * cxy * cxy))
                 / (2.0 * cxy), {round_to}) AS slope,
           ROUND(my - (cyy - cxx + SQRT((cyy - cxx) * (cyy - cxx)
                                        + 4.0 * cxy * cxy))
                      / (2.0 * cxy) * mx, {round_to}) AS intercept,
           ROUND(cxy / cxx, {round_to}) AS slope_ols,
           ROUND((cxy / cxx)
                 / ((cyy - cxx + SQRT((cyy - cxx) * (cyy - cxx)
                                      + 4.0 * cxy * cxy))
                    / (2.0 * cxy)), {round_to}) AS attenuation
    FROM c
    """


def newey_west_trend(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    lags: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Daily-trend OLS slope with Newey-West (HAC) standard errors —
    the autocorrelation-robust SE that replaces the iid OLS SE a
    time series always violates (positive autocorrelation makes the
    naive SE overconfident, the classic false-positive trend):

      ``Var_HAC(b) = (sum_l w_l * sum_t u_t u_{t-l} x~_t x~_{t-l}
                      summed both directions) / Sxx²``

    with Bartlett weights ``w_l = 1 - l/(L+1)``, u the OLS
    residuals, x~ the centered regressor. The slope comes from exact
    integer/decimal moments; residual products per lag are lag
    self-joins over the DAILY table (L tiny, the table is days-sized)
    with a fixed summation order per lag.

    Output (one row): (n_days, slope, se_ols, se_hac, ratio).
    """
    pts = daily.select(
        F.col(date_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("double").alias("__y"),
    ).withColumn(
        "__t", F.row_number().over(Window.orderBy("__d")).cast("bigint")
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__t").cast("bigint").alias("__st"),
        F.sum(F.col("__t") * F.col("__t")).cast("bigint").alias("__st2"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__t").cast("double") * F.col("__y")).alias("__sty"),
    )
    nn = F.col("__n").cast("double")
    stt = F.col("__st2").cast("double") - F.col("__st").cast("double") * F.col("__st").cast("double") / nn
    sty = F.col("__sty") - F.col("__st").cast("double") * F.col("__sy") / nn
    stats = m.select(
        "__n",
        (F.col("__st").cast("double") / nn).alias("__mt"),
        (F.col("__sy") / nn).alias("__my"),
        stt.alias("__stt"),
        (sty / stt).alias("__b"),
    )
    resid = pts.crossJoin(F.broadcast(stats)).select(
        "__t",
        "__n",
        "__stt",
        "__b",
        (F.col("__t").cast("double") - F.col("__mt")).alias("__xc"),
        (
            F.col("__y")
            - F.col("__my")
            - F.col("__b") * (F.col("__t").cast("double") - F.col("__mt"))
        ).alias("__u"),
    )
    s0 = resid.agg(
        F.sum(F.col("__u") * F.col("__u") * F.col("__xc") * F.col("__xc")).alias("v"),
        F.sum(F.col("__u") * F.col("__u")).alias("__ssr"),
        F.max("__n").alias("__n"),
        F.max("__stt").alias("__stt"),
        F.max("__b").alias("__b"),
    )
    lag_terms = None
    a = resid.select(
        F.col("__t").alias("t1"), F.col("__u").alias("u1"),
        F.col("__xc").alias("x1"),
    )
    for l in range(1, lags + 1):
        b = resid.select(
            (F.col("__t") + l).alias("t1"),
            F.col("__u").alias("u2"),
            F.col("__xc").alias("x2"),
        )
        term = a.join(b, "t1").agg(
            F.sum(
                F.col("u1") * F.col("u2") * F.col("x1") * F.col("x2")
            ).alias("v")
        ).select((F.lit(1.0 - l / (lags + 1.0)) * 2.0 * F.col("v")).alias("v"))
        lag_terms = term if lag_terms is None else lag_terms.unionAll(term)
    lag_sum = lag_terms.agg(F.coalesce(F.sum("v"), F.lit(0.0)).alias("__lv"))
    j = s0.crossJoin(F.broadcast(lag_sum))
    nn2 = F.col("__n").cast("double")
    var_ols = (F.col("__ssr") / (nn2 - 2.0)) / F.col("__stt")
    var_hac = (F.col("v") + F.col("__lv")) / (
        F.col("__stt") * F.col("__stt")
    )
    return j.select(
        F.col("__n").alias("n_days"),
        F.round("__b", round_to).alias("slope"),
        F.round(F.sqrt(var_ols), round_to).alias("se_ols"),
        F.round(F.sqrt(var_hac), round_to).alias("se_hac"),
        F.round(F.sqrt(var_hac) / F.sqrt(var_ols), round_to).alias("ratio"),
    )


def newey_west_trend_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    lags: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`newey_west_trend` (lags unrolled)."""
    lag_selects = "\n    UNION ALL ".join(
        f"""SELECT {1.0 - l / (lags + 1.0)!r} * 2.0
           * SUM(a.u * b.u * a.xc * b.xc) AS v
    FROM resid a JOIN resid b ON a.t = b.t + {l}"""
        for l in range(1, lags + 1)
    )
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS st2,
             SUM(y) AS sy,
             SUM(CAST(t AS DOUBLE) * y) AS sty
      FROM pts
    ),
    stats AS (
      SELECT n,
             CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS mt,
             sy / CAST(n AS DOUBLE) AS my,
             CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
               / CAST(n AS DOUBLE) AS stt,
             (sty - CAST(st AS DOUBLE) * sy / CAST(n AS DOUBLE))
             / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                / CAST(n AS DOUBLE)) AS b
      FROM m
    ),
    resid AS (
      SELECT pts.t, stats.n, stats.stt, stats.b,
             CAST(pts.t AS DOUBLE) - stats.mt AS xc,
             pts.y - stats.my
               - stats.b * (CAST(pts.t AS DOUBLE) - stats.mt) AS u
      FROM pts CROSS JOIN stats
    ),
    s0 AS (
      SELECT SUM(u * u * xc * xc) AS v,
             SUM(u * u) AS ssr,
             MAX(n) AS n, MAX(stt) AS stt, MAX(b) AS b
      FROM resid
    ),
    lags_t AS (
      {lag_selects}
    ),
    lag_sum AS (SELECT COALESCE(SUM(v), 0.0) AS lv FROM lags_t)
    SELECT s0.n AS n_days,
           ROUND(s0.b, {round_to}) AS slope,
           ROUND(SQRT((s0.ssr / (CAST(s0.n AS DOUBLE) - 2.0)) / s0.stt),
                 {round_to}) AS se_ols,
           ROUND(SQRT((s0.v + lag_sum.lv) / (s0.stt * s0.stt)),
                 {round_to}) AS se_hac,
           ROUND(SQRT((s0.v + lag_sum.lv) / (s0.stt * s0.stt))
                 / SQRT((s0.ssr / (CAST(s0.n AS DOUBLE) - 2.0)) / s0.stt),
                 {round_to}) AS ratio
    FROM s0 CROSS JOIN lag_sum
    """


def durbin_watson_trend(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Durbin-Watson statistic on the daily-trend OLS residuals — the
    canonical "are the residuals autocorrelated" check that decides
    whether :func:`newey_west_trend`'s HAC correction is even needed
    (DW ~ 2 means no lag-1 autocorrelation; toward 0 positive,
    toward 4 negative):

      ``DW = sum_t (u_t - u_{t-1})² / sum_t u_t²``.

    The slope comes from exact integer/decimal moments (same
    construction as `newey_west_trend`); residual differences are a
    single lag window over the days-sized table.

    Output (one row): (n_days, slope, dw, rho1).
    """
    pts = daily.select(
        F.col(date_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("double").alias("__y"),
    ).withColumn(
        "__t", F.row_number().over(Window.orderBy("__d")).cast("bigint")
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__t").cast("bigint").alias("__st"),
        F.sum(F.col("__t") * F.col("__t")).cast("bigint").alias("__st2"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__t").cast("double") * F.col("__y")).alias("__sty"),
    )
    nn = F.col("__n").cast("double")
    stt = F.col("__st2").cast("double") - F.col("__st").cast("double") * F.col("__st").cast("double") / nn
    sty = F.col("__sty") - F.col("__st").cast("double") * F.col("__sy") / nn
    stats = m.select(
        "__n",
        (F.col("__st").cast("double") / nn).alias("__mt"),
        (F.col("__sy") / nn).alias("__my"),
        (sty / stt).alias("__b"),
    )
    resid = pts.crossJoin(F.broadcast(stats)).select(
        "__t",
        "__n",
        "__b",
        (
            F.col("__y")
            - F.col("__my")
            - F.col("__b") * (F.col("__t").cast("double") - F.col("__mt"))
        ).alias("__u"),
    )
    w = Window.orderBy("__t")
    dd = resid.withColumn(
        "__du", F.col("__u") - F.lag("__u", 1).over(w)
    ).withColumn("__ul", F.col("__u") * F.lag("__u", 1).over(w))
    agg = dd.agg(
        F.max("__n").alias("n_days"),
        F.max("__b").alias("__b"),
        F.sum(F.col("__du") * F.col("__du")).alias("__sdu2"),
        F.sum(F.col("__u") * F.col("__u")).alias("__su2"),
        F.sum("__ul").alias("__ulag"),
    )
    return agg.select(
        "n_days",
        F.round("__b", round_to).alias("slope"),
        F.round(F.col("__sdu2") / F.col("__su2"), round_to).alias("dw"),
        F.round(F.col("__ulag") / F.col("__su2"), round_to).alias("rho1"),
    )


def durbin_watson_trend_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`durbin_watson_trend`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS st2,
             SUM(y) AS sy,
             SUM(CAST(t AS DOUBLE) * y) AS sty
      FROM pts
    ),
    stats AS (
      SELECT n,
             CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS mt,
             sy / CAST(n AS DOUBLE) AS my,
             (sty - CAST(st AS DOUBLE) * sy / CAST(n AS DOUBLE))
             / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                / CAST(n AS DOUBLE)) AS b
      FROM m
    ),
    resid AS (
      SELECT pts.t, stats.n, stats.b,
             pts.y - stats.my
               - stats.b * (CAST(pts.t AS DOUBLE) - stats.mt) AS u
      FROM pts CROSS JOIN stats
    ),
    dd AS (
      SELECT n, b, u,
             u - LAG(u, 1) OVER (ORDER BY t) AS du,
             u * LAG(u, 1) OVER (ORDER BY t) AS ul
      FROM resid
    )
    SELECT MAX(n) AS n_days,
           ROUND(MAX(b), {round_to}) AS slope,
           ROUND(SUM(du * du) / SUM(u * u), {round_to}) AS dw,
           ROUND(SUM(ul) / SUM(u * u), {round_to}) AS rho1
    FROM dd
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 78: econometric / structural diagnostics
# ──────────────────────────────────────────────────────────────────────────
def adf_unit_root(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Dickey-Fuller unit-root test (constant, lag 0) on the daily
    series — "is this a random walk or does it mean-revert?", the
    stationarity gate every trend/forecast spec implicitly assumes:

      regress ``Δx_t`` on ``[1, x_{t-1}]``; DF stat = b / SE(b).

    A unit root (b ≈ 0) means shocks are permanent and the OLS-trend
    family (newey_west_trend, segmented_regression) is describing a
    drifting random walk, not structure. One ordered-window lag over
    the days-sized table, one aggregate of six sufficient statistics
    — the corpus already reduced upstream, so O(days), no self-joins.
    Closed-form OLS over centered sums, identical expression order in
    both engines.

    Output (one row): (n_obs, slope, df_stat).
    """
    w = Window.orderBy("__d")
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__x"),
    )
    lagged = (
        pts.withColumn("__xl", F.lag("__x", 1).over(w))
        .filter(F.col("__xl").isNotNull())
        .select(
            (F.col("__x") - F.col("__xl")).alias("__y"),
            F.col("__xl").alias("__z"),
        )
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("__z").alias("sz"),
        F.sum(F.col("__z") * F.col("__z")).alias("sz2"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).alias("sy2"),
        F.sum(F.col("__z") * F.col("__y")).alias("szy"),
    )
    mm = F.col("m").cast("double")
    cen = agg.select(
        "m",
        (F.col("sz2") - F.col("sz") * F.col("sz") / mm).alias("szz"),
        (F.col("szy") - F.col("sz") * F.col("sy") / mm).alias("szy_c"),
        (F.col("sy2") - F.col("sy") * F.col("sy") / mm).alias("syy"),
    )
    fit = cen.select(
        "m",
        "szz",
        "szy_c",
        "syy",
        (F.col("szy_c") / F.col("szz")).alias("b"),
    )
    mm2 = F.col("m").cast("double")
    ssr = F.col("syy") - F.col("b") * F.col("szy_c")
    se = F.sqrt((ssr / (mm2 - 2.0)) / F.col("szz"))
    return fit.select(
        F.col("m").alias("n_obs"),
        F.round("b", round_to).alias("slope"),
        F.round(F.col("b") / se, round_to).alias("df_stat"),
    )


def adf_unit_root_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`adf_unit_root`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT {date_col} AS dd, CAST({value_col} AS DOUBLE) AS x FROM d
    ),
    lagged AS (
      SELECT x - xl AS y, xl AS z
      FROM (SELECT x, LAG(x, 1) OVER (ORDER BY dd) AS xl FROM pts)
      WHERE xl IS NOT NULL
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(z) AS sz, SUM(z * z) AS sz2,
             SUM(y) AS sy, SUM(y * y) AS sy2,
             SUM(z * y) AS szy
      FROM lagged
    ),
    cen AS (
      SELECT m,
             sz2 - sz * sz / CAST(m AS DOUBLE) AS szz,
             szy - sz * sy / CAST(m AS DOUBLE) AS szy_c,
             sy2 - sy * sy / CAST(m AS DOUBLE) AS syy
      FROM agg
    ),
    fit AS (
      SELECT m, szz, szy_c, syy, szy_c / szz AS b FROM cen
    )
    SELECT m AS n_obs,
           ROUND(b, {round_to}) AS slope,
           ROUND(b / SQRT(((syy - b * szy_c) / (CAST(m AS DOUBLE) - 2.0))
                          / szz),
                 {round_to}) AS df_stat
    FROM fit
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 148: KPSS level-stationarity test
# ──────────────────────────────────────────────────────────────────────────

_KPSS_MAX_LAG = 16  # covers T up to 100*(16/4)^4 = 25,600 periods


def kpss_level_test(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """KPSS test (Kwiatkowski-Phillips-Schmidt-Shin 1992) of LEVEL
    stationarity — the complement of :func:`adf_unit_root`: ADF's
    null is a unit root, KPSS's null is stationarity, and the pair
    (reject/reject, fail/fail, split) is the standard four-way
    diagnosis a single test can't give.

      e_t = y_t − ȳ;  S_t = Σ_{i≤t} e_i;
      LM = Σ S_t² / (T² σ̂²_lr);
      σ̂²_lr = γ̂_0 + 2 Σ_{j=1}^{q} (1 − j/(q+1)) γ̂_j  (Bartlett),
      q = min(16, ⌊4 (T/100)^{1/4}⌋)  (Schwert's rule).

    Exactness: the series contract is INTEGER-VALUED (the daily count
    rollup; pre-scale prices to cents) so scaled residuals
    ``E_t = T·y_t − S`` and their prefix sums P_t are exact bigints;
    P², and the lag products E_t·E_{t−j} accumulate as DECIMAL(38,0)
    (P² alone is ~6e26 at sf0.1 — far past int64). The cancellation
    LM = ΣP² / (T · (G_0 + 2Σ w_j G_j)) drops every power of T
    beyond one. The PLAN is static despite the data-dependent
    bandwidth: all 16 lag columns are computed and the Bartlett
    weight ``greatest(0, 1 − j/(q+1))`` zeroes exactly those beyond
    q — no dynamic column list, no second pass.

    One ordered window (prefix sums + 16 lags) over the days-sized
    rollup, one aggregate. Output (one row): (n_obs, q_lag, lm_stat).
    """
    w = Window.orderBy("__d")
    wc = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("bigint").alias("__y"),
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum("__y").cast("bigint").alias("__s"),
    )
    e = pts.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__t",
        (F.col("__t") * F.col("__y") - F.col("__s")).alias("__e"),
    )
    lagged = e.select(
        "__t",
        "__e",
        F.sum("__e").over(wc).alias("__p"),
        *[
            F.lag("__e", j).over(w).alias(f"__l{j}")
            for j in range(1, _KPSS_MAX_LAG + 1)
        ],
    )
    dec = "decimal(38,0)"
    agg = lagged.agg(
        F.max("__t").alias("n"),
        F.sum(
            F.col("__p").cast(dec) * F.col("__p").cast(dec)
        ).alias("__num"),
        F.sum(F.col("__e").cast(dec) * F.col("__e").cast(dec)).alias(
            "__g0"
        ),
        *[
            F.sum(
                F.col("__e").cast(dec) * F.col(f"__l{j}").cast(dec)
            ).alias(f"__g{j}")
            for j in range(1, _KPSS_MAX_LAG + 1)
        ],
    )
    tt = F.col("n").cast("double")
    q = F.least(
        F.lit(_KPSS_MAX_LAG).cast("double"),
        F.floor(4.0 * F.pow(tt / 100.0, 0.25)).cast("double"),
    )
    lr = F.col("__g0").cast("double")
    for j in range(1, _KPSS_MAX_LAG + 1):
        wj = F.greatest(F.lit(0.0), 1.0 - F.lit(float(j)) / (q + 1.0))
        # coalesce: a lag beyond T-1 sums over zero rows -> NULL, and
        # 0-weight * NULL would otherwise poison the whole chain
        lr = lr + 2.0 * wj * F.coalesce(
            F.col(f"__g{j}").cast("double"), F.lit(0.0)
        )
    lm = F.col("__num").cast("double") / (tt * lr)
    return agg.select(
        F.col("n").alias("n_obs"),
        q.cast("bigint").alias("q_lag"),
        F.round(lm, round_to).alias("lm_stat"),
    )


def kpss_level_test_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`kpss_level_test` (same scaled-integer
    residuals, DECIMAL(38,0) accumulators, static 16-lag plan with
    Bartlett-weight truncation)."""
    mx = _KPSS_MAX_LAG
    lag_cols = ",\n             ".join(
        f"LAG(e, {j}) OVER (ORDER BY dd) AS l{j}" for j in range(1, mx + 1)
    )
    g_cols = ",\n             ".join(
        f"SUM(CAST(e AS DECIMAL(38,0)) * CAST(l{j} AS DECIMAL(38,0)))"
        f" AS g{j}"
        for j in range(1, mx + 1)
    )
    lr_terms = "\n                 ".join(
        f"+ 2.0 * GREATEST(0.0, 1.0 - {float(j)!r} / (q + 1.0))"
        f" * COALESCE(CAST(g{j} AS DOUBLE), 0.0)"
        for j in range(1, mx + 1)
    )
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT {date_col} AS dd, CAST({value_col} AS BIGINT) AS y FROM d
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t, CAST(SUM(y) AS BIGINT) AS s
      FROM pts
    ),
    e AS (
      SELECT dd, t, t * y - s AS e FROM pts CROSS JOIN tot
    ),
    lagged AS (
      SELECT t, e,
             SUM(e) OVER (ORDER BY dd ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS p,
             {lag_cols}
      FROM e
    ),
    agg AS (
      SELECT MAX(t) AS n,
             SUM(CAST(p AS DECIMAL(38,0)) * CAST(p AS DECIMAL(38,0)))
               AS num,
             SUM(CAST(e AS DECIMAL(38,0)) * CAST(e AS DECIMAL(38,0)))
               AS g0,
             {g_cols}
      FROM lagged
    ),
    qq AS (
      SELECT *,
             LEAST(CAST({mx} AS DOUBLE),
                   FLOOR(4.0 * POW(CAST(n AS DOUBLE) / 100.0, 0.25)))
               AS q
      FROM agg
    )
    SELECT n AS n_obs,
           CAST(q AS BIGINT) AS q_lag,
           ROUND(CAST(num AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(g0 AS DOUBLE)
                 {lr_terms})),
                 {round_to}) AS lm_stat
    FROM qq
    """


def engle_granger(
    xy: DataFrame,
    date_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Engle-Granger two-step cointegration test between two daily
    series on a shared day axis — "do these drift TOGETHER?" (a pair
    can each be non-stationary yet keep a stationary spread; that
    spread is what pairs-monitoring and ratio alerts implicitly bet
    on):

      step 1: OLS ``y = a + β x`` in levels → residuals e_t;
      step 2: Dickey-Fuller on e (no constant, lag 0):
              ``ρ = Σ e_{t-1} Δe_t / Σ e_{t-1}²``, stat = ρ / SE(ρ).

    Two days-sized aggregates and one ordered-window lag; the OLS
    stats broadcast back (scalar row), so nothing data-sized ever
    shuffles twice. Closed-form sums, identical expression order in
    both engines.

    Output (one row): (n_days, beta, eg_stat).
    """
    pts = xy.select(
        F.col(date_col).alias("__d"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sx2"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    stats = m.select(
        "n",
        (F.col("sx") / nn).alias("mx"),
        (F.col("sy") / nn).alias("my"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / nn)
            / (F.col("sx2") - F.col("sx") * F.col("sx") / nn)
        ).alias("beta"),
    )
    resid = pts.crossJoin(F.broadcast(stats)).select(
        "__d",
        "n",
        "beta",
        (
            (F.col("__y") - F.col("my"))
            - F.col("beta") * (F.col("__x") - F.col("mx"))
        ).alias("__e"),
    )
    w = Window.orderBy("__d")
    de = (
        resid.withColumn("__el", F.lag("__e", 1).over(w))
        .filter(F.col("__el").isNotNull())
        .select(
            "n",
            "beta",
            F.col("__el").alias("__el"),
            (F.col("__e") - F.col("__el")).alias("__de"),
        )
    )
    agg2 = de.agg(
        F.max("n").alias("n_days"),
        F.max("beta").alias("beta"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("__el") * F.col("__el")).alias("sel2"),
        F.sum(F.col("__el") * F.col("__de")).alias("selde"),
        F.sum(F.col("__de") * F.col("__de")).alias("sde2"),
    )
    rho = F.col("selde") / F.col("sel2")
    mm = F.col("m").cast("double")
    ssr = F.col("sde2") - rho * F.col("selde")
    se = F.sqrt((ssr / (mm - 1.0)) / F.col("sel2"))
    return agg2.select(
        "n_days",
        F.round("beta", round_to).alias("beta"),
        F.round(rho / se, round_to).alias("eg_stat"),
    )


def engle_granger_sql(
    xy_sql: str,
    date_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`engle_granger`."""
    return f"""
    WITH xy AS ({xy_sql}),
    pts AS (
      SELECT {date_col} AS dd,
             CAST({x_col} AS DOUBLE) AS x,
             CAST({y_col} AS DOUBLE) AS y
      FROM xy
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sx2, SUM(x * y) AS sxy
      FROM pts
    ),
    stats AS (
      SELECT n,
             sx / CAST(n AS DOUBLE) AS mx,
             sy / CAST(n AS DOUBLE) AS my,
             (sxy - sx * sy / CAST(n AS DOUBLE))
             / (sx2 - sx * sx / CAST(n AS DOUBLE)) AS beta
      FROM m
    ),
    resid AS (
      SELECT pts.dd, stats.n, stats.beta,
             (pts.y - stats.my) - stats.beta * (pts.x - stats.mx) AS e
      FROM pts CROSS JOIN stats
    ),
    de AS (
      SELECT n, beta, el, e - el AS de
      FROM (SELECT n, beta, e, LAG(e, 1) OVER (ORDER BY dd) AS el
            FROM resid)
      WHERE el IS NOT NULL
    ),
    agg2 AS (
      SELECT MAX(n) AS n_days, MAX(beta) AS beta,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(el * el) AS sel2,
             SUM(el * de) AS selde,
             SUM(de * de) AS sde2
      FROM de
    )
    SELECT n_days,
           ROUND(beta, {round_to}) AS beta,
           ROUND((selde / sel2)
                 / SQRT(((sde2 - (selde / sel2) * selde)
                         / (CAST(m AS DOUBLE) - 1.0)) / sel2),
                 {round_to}) AS eg_stat
    FROM agg2
    """


def chow_break(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Chow structural-break F-test of the daily trend at the sample
    midpoint — "is it ONE line or TWO?": fit ``y = a + b·t`` pooled
    and separately on each half, then

      ``F = ((SSR_p - SSR_1 - SSR_2) / k) / ((SSR_1 + SSR_2) / (n - 2k))``,
      k = 2.

    The hypothesis-test complement to segmented_regression (which
    *finds* the best break; this *tests* a fixed one — the classic
    deploy-date / policy-change question). Each segment's SSR is the
    closed form ``Syy - Sxy²/Sxx`` over conditional sums, so the whole
    test is ONE aggregate over the days-sized table after a scalar
    count broadcast.

    Bit-reproducibility discipline (the ``ppr_fixed_point`` rule,
    graph_metrics.py:1160): all conditional sums of y-derived terms
    accumulate as exact DECIMAL — decimal(18,2) input, products
    decimal(29,2) / decimal(37,4) — so the unordered global aggregate
    is partition-order-independent; doubles appear only inside
    ``_ssr``'s closed-form ratios, identical expression order in both
    engines. (The previous conditional double sums flipped the driver
    hash across partition orders — VERDICT r6 #2.) Fit quality is
    reported DIMENSIONLESS: ``ssr_ratio = (SSR_1+SSR_2)/SSR_pooled``
    ∈ (0,1], O(1) at any scale — rounding a raw ~1e14 SSR to 6
    decimals is below double resolution.

    Output (one row): (n_days, break_t, ssr_ratio, f_stat).
    """
    pts = daily.select(
        F.col(value_col).cast("decimal(18,2)").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    n_row = pts.agg(F.max("__t").cast("bigint").alias("__n"))
    seg = pts.crossJoin(F.broadcast(n_row)).select(
        "__y",
        "__t",
        "__n",
        (F.col("__t") <= F.floor(F.col("__n") / 2)).alias("__first"),
    )

    def _sums(pred, tag):
        td = F.col("__t").cast("decimal(10,0)")
        t = F.when(pred, F.col("__t"))
        y = F.when(pred, F.col("__y"))
        return [
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"n{tag}"),
            F.sum(t).cast("bigint").alias(f"st{tag}"),
            F.sum(t * F.col("__t")).cast("bigint").alias(f"st2{tag}"),
            F.sum(y).alias(f"sy{tag}"),
            F.sum(y * F.col("__y")).alias(f"sy2{tag}"),
            F.sum(F.when(pred, td * F.col("__y"))).alias(f"sty{tag}"),
        ]

    agg = seg.agg(
        F.max("__n").alias("n_days"),
        *_sums(F.lit(True), "p"),
        *_sums(F.col("__first"), "1"),
        *_sums(~F.col("__first"), "2"),
    )

    def _ssr(tag):
        n = F.col(f"n{tag}").cast("double")
        st = F.col(f"st{tag}").cast("double")
        sy = F.col(f"sy{tag}").cast("double")
        sxx = F.col(f"st2{tag}").cast("double") - st * st / n
        sxy = F.col(f"sty{tag}").cast("double") - st * sy / n
        syy = F.col(f"sy2{tag}").cast("double") - sy * sy / n
        return syy - sxy * sxy / sxx

    ssrs = agg.select(
        "n_days",
        _ssr("p").alias("ssr_p"),
        _ssr("1").alias("ssr_1"),
        _ssr("2").alias("ssr_2"),
    )
    nn = F.col("n_days").cast("double")
    split = F.col("ssr_1") + F.col("ssr_2")
    f_stat = ((F.col("ssr_p") - split) / 2.0) / (split / (nn - 4.0))
    return ssrs.select(
        "n_days",
        F.floor(F.col("n_days") / 2).cast("bigint").alias("break_t"),
        F.round(split / F.col("ssr_p"), round_to).alias("ssr_ratio"),
        F.round(f_stat, round_to).alias("f_stat"),
    )


def chow_break_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`chow_break`.

    Mirrors the Spark plan's determinism discipline: conditional sums
    of y-derived terms accumulate as exact DECIMAL, so the aggregate is
    scan-order-independent in both engines; doubles enter only in the
    closed-form ratios, same expression order as the Spark columns.
    """

    def _sums(pred, tag):
        return f"""CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n{tag},
             CAST(SUM(CASE WHEN {pred} THEN t END) AS BIGINT) AS st{tag},
             CAST(SUM(CASE WHEN {pred} THEN t END * t) AS BIGINT) AS st2{tag},
             SUM(CASE WHEN {pred} THEN y END) AS sy{tag},
             SUM(CASE WHEN {pred} THEN CAST(y AS DECIMAL(20,2)) END * y) AS sy2{tag},
             SUM(CASE WHEN {pred}
                 THEN CAST(t AS DECIMAL(10,0)) * y END) AS sty{tag}"""

    def _ssr(tag):
        n = f"CAST(n{tag} AS DOUBLE)"
        st = f"CAST(st{tag} AS DOUBLE)"
        sy = f"CAST(sy{tag} AS DOUBLE)"
        sxx = f"(CAST(st2{tag} AS DOUBLE) - {st} * {st} / {n})"
        sxy = f"(CAST(sty{tag} AS DOUBLE) - {st} * {sy} / {n})"
        syy = f"(CAST(sy2{tag} AS DOUBLE) - {sy} * {sy} / {n})"
        return f"({syy} - {sxy} * {sxy} / {sxx})"

    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DECIMAL(18,2)) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    n_row AS (SELECT CAST(MAX(t) AS BIGINT) AS n FROM pts),
    seg AS (
      SELECT y, t, n, t <= n // 2 AS first
      FROM pts CROSS JOIN n_row
    ),
    agg AS (
      SELECT MAX(n) AS n_days,
             {_sums("TRUE", "p")},
             {_sums("first", "1")},
             {_sums("NOT first", "2")}
      FROM seg
    ),
    ssrs AS (
      SELECT n_days,
             {_ssr("p")} AS ssr_p,
             {_ssr("1")} AS ssr_1,
             {_ssr("2")} AS ssr_2
      FROM agg
    )
    SELECT n_days,
           CAST(n_days // 2 AS BIGINT) AS break_t,
           ROUND((ssr_1 + ssr_2) / ssr_p, {round_to}) AS ssr_ratio,
           ROUND(((ssr_p - (ssr_1 + ssr_2)) / 2.0)
                 / ((ssr_1 + ssr_2) / (CAST(n_days AS DOUBLE) - 4.0)),
                 {round_to}) AS f_stat
    FROM ssrs
    """


def breusch_pagan(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test (Koenker's studentized
    form) on the daily trend fit — "does the VARIANCE drift even if
    the mean doesn't?": OLS ``y = a + b·t``, then the auxiliary
    regression of squared residuals on t;

      ``LM = n · R²_aux``,  R²_aux the simple-OLS r² closed form.

    Growing dispersion invalidates the constant-variance SE every
    trend CI in the suite quotes (newey_west_trend fixes
    autocorrelation, this detects the *other* violation). Two
    aggregates over the days-sized table with a scalar broadcast
    between — O(days), no self-joins, identical expression order in
    both engines.

    Output (one row): (n_days, r2_aux, lm_stat).
    """
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("__t").cast("double")).alias("st"),
        F.sum(F.col("__t").cast("double") * F.col("__t").cast("double")).alias(
            "st2"
        ),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__t").cast("double") * F.col("__y")).alias("sty"),
    )
    nn = F.col("n").cast("double")
    stats = m.select(
        "n",
        (F.col("st") / nn).alias("mt"),
        (F.col("sy") / nn).alias("my"),
        (
            (F.col("sty") - F.col("st") * F.col("sy") / nn)
            / (F.col("st2") - F.col("st") * F.col("st") / nn)
        ).alias("b"),
    )
    aux = pts.crossJoin(F.broadcast(stats)).select(
        F.col("__t").cast("double").alias("__x"),
        (
            (
                F.col("__y")
                - F.col("my")
                - F.col("b") * (F.col("__t").cast("double") - F.col("mt"))
            )
            * (
                F.col("__y")
                - F.col("my")
                - F.col("b") * (F.col("__t").cast("double") - F.col("mt"))
            )
        ).alias("__g"),
    )
    agg2 = aux.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("sx2"),
        F.sum("__g").alias("sg"),
        F.sum(F.col("__g") * F.col("__g")).alias("sg2"),
        F.sum(F.col("__x") * F.col("__g")).alias("sxg"),
    )
    nn2 = F.col("n_days").cast("double")
    sxx = F.col("sx2") - F.col("sx") * F.col("sx") / nn2
    sgg = F.col("sg2") - F.col("sg") * F.col("sg") / nn2
    sxg_c = F.col("sxg") - F.col("sx") * F.col("sg") / nn2
    r2 = sxg_c * sxg_c / (sxx * sgg)
    return agg2.select(
        "n_days",
        F.round(r2, round_to).alias("r2_aux"),
        F.round(nn2 * r2, round_to).alias("lm_stat"),
    )


def breusch_pagan_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`breusch_pagan`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(t AS DOUBLE)) AS st,
             SUM(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS st2,
             SUM(y) AS sy,
             SUM(CAST(t AS DOUBLE) * y) AS sty
      FROM pts
    ),
    stats AS (
      SELECT n,
             st / CAST(n AS DOUBLE) AS mt,
             sy / CAST(n AS DOUBLE) AS my,
             (sty - st * sy / CAST(n AS DOUBLE))
             / (st2 - st * st / CAST(n AS DOUBLE)) AS b
      FROM m
    ),
    aux AS (
      SELECT CAST(pts.t AS DOUBLE) AS x,
             (pts.y - stats.my
              - stats.b * (CAST(pts.t AS DOUBLE) - stats.mt))
             * (pts.y - stats.my
                - stats.b * (CAST(pts.t AS DOUBLE) - stats.mt)) AS g
      FROM pts CROSS JOIN stats
    ),
    agg2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(x) AS sx, SUM(x * x) AS sx2,
             SUM(g) AS sg, SUM(g * g) AS sg2,
             SUM(x * g) AS sxg
      FROM aux
    )
    SELECT n_days,
           ROUND((sxg - sx * sg / CAST(n_days AS DOUBLE))
                 * (sxg - sx * sg / CAST(n_days AS DOUBLE))
                 / ((sx2 - sx * sx / CAST(n_days AS DOUBLE))
                    * (sg2 - sg * sg / CAST(n_days AS DOUBLE))),
                 {round_to}) AS r2_aux,
           ROUND(CAST(n_days AS DOUBLE)
                 * ((sxg - sx * sg / CAST(n_days AS DOUBLE))
                    * (sxg - sx * sg / CAST(n_days AS DOUBLE))
                    / ((sx2 - sx * sx / CAST(n_days AS DOUBLE))
                       * (sg2 - sg * sg / CAST(n_days AS DOUBLE)))),
                 {round_to}) AS lm_stat
    FROM agg2
    """


def arch_lm(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Engle's ARCH-LM test (1 lag) on the demeaned daily series —
    "is VOLATILITY autocorrelated?" (calm days cluster, bursty days
    cluster): with e_t = y_t - ȳ and u_t = e_t², regress u_t on
    u_{t-1};

      ``LM = m · R²``,  m = usable observations.

    Variance clustering is invisible to every mean-equation
    diagnostic (ljung_box sees correlation in LEVELS, this in
    squared shocks) and is the standard burst-detection gate before
    trusting iid-based anomaly thresholds. One scalar-mean broadcast,
    one ordered lag, one aggregate — O(days). Identical expression
    order in both engines.

    Output (one row): (n_obs, r2, lm_stat).
    """
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__y"),
    )
    m = pts.agg(F.avg("__y").alias("my"))
    w = Window.orderBy("__d")
    u = pts.crossJoin(F.broadcast(m)).select(
        "__d",
        (
            (F.col("__y") - F.col("my")) * (F.col("__y") - F.col("my"))
        ).alias("__u"),
    )
    lagged = (
        u.withColumn("__ul", F.lag("__u", 1).over(w))
        .filter(F.col("__ul").isNotNull())
        .select("__u", "__ul")
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("__ul").alias("sx"),
        F.sum(F.col("__ul") * F.col("__ul")).alias("sx2"),
        F.sum("__u").alias("sy"),
        F.sum(F.col("__u") * F.col("__u")).alias("sy2"),
        F.sum(F.col("__ul") * F.col("__u")).alias("sxy"),
    )
    mm = F.col("n_obs").cast("double")
    sxx = F.col("sx2") - F.col("sx") * F.col("sx") / mm
    syy = F.col("sy2") - F.col("sy") * F.col("sy") / mm
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / mm
    r2 = sxy_c * sxy_c / (sxx * syy)
    return agg.select(
        "n_obs",
        F.round(r2, round_to).alias("r2"),
        F.round(mm * r2, round_to).alias("lm_stat"),
    )


def arch_lm_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`arch_lm`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT {date_col} AS dd, CAST({value_col} AS DOUBLE) AS y FROM d
    ),
    m AS (SELECT AVG(y) AS my FROM pts),
    u AS (
      SELECT dd, (y - my) * (y - my) AS u
      FROM pts CROSS JOIN m
    ),
    lagged AS (
      SELECT u, ul
      FROM (SELECT u, LAG(u, 1) OVER (ORDER BY dd) AS ul FROM u)
      WHERE ul IS NOT NULL
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
             SUM(ul) AS sx, SUM(ul * ul) AS sx2,
             SUM(u) AS sy, SUM(u * u) AS sy2,
             SUM(ul * u) AS sxy
      FROM lagged
    )
    SELECT n_obs,
           ROUND((sxy - sx * sy / CAST(n_obs AS DOUBLE))
                 * (sxy - sx * sy / CAST(n_obs AS DOUBLE))
                 / ((sx2 - sx * sx / CAST(n_obs AS DOUBLE))
                    * (sy2 - sy * sy / CAST(n_obs AS DOUBLE))),
                 {round_to}) AS r2,
           ROUND(CAST(n_obs AS DOUBLE)
                 * ((sxy - sx * sy / CAST(n_obs AS DOUBLE))
                    * (sxy - sx * sy / CAST(n_obs AS DOUBLE))
                    / ((sx2 - sx * sx / CAST(n_obs AS DOUBLE))
                       * (sy2 - sy * sy / CAST(n_obs AS DOUBLE)))),
                 {round_to}) AS lm_stat
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 83: OLS influence diagnostics — leverage, Cook's distance,
# closed-form leave-one-out (PRESS), VIF, ridge. The reference stops at a
# single fitted GLM (run_analysis.Rmd:80-99, SURVEY §2.12 M1); a user who
# trusts that fit next asks WHICH rows drive it and whether the covariates
# are even identifiable — the diagnostics R hands out via influence.measures
# and car::vif. Simple/2-feature regression keeps every one of them in
# closed form over ONE hash aggregate of sufficient statistics, so the
# whole battery is scan-stage work: no iterative refits, no n x n hat
# matrix, no driver loops. Leave-one-out in particular NEVER refits —
# PRESS = sum (e_i / (1 - h_i))^2 is an algebraic identity, which is the
# difference between one scan and n regressions at 100 TB.
# ──────────────────────────────────────────────────────────────────────────


def _ols_core_stats(df: DataFrame, x: str, y: str) -> DataFrame:
    """One-row DataFrame of the shared simple-OLS sufficient statistics:
    (n, mx, my, sxx_c, syy_c, sxy_c, b) — the centered second moments and
    slope every wave-83 diagnostic reuses. Null pairs are dropped (same
    policy as :func:`group_ols`). The arithmetic ORDER here is mirrored
    literally in the `_sql` twins so both engines make identical IEEE
    choices."""
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        F.col(x).cast("double").alias("__x"),
        F.col(y).cast("double").alias("__y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    nn = F.col("__n").cast("double")
    sxx_c = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nn
    syy_c = F.col("__syy") - F.col("__sy") * F.col("__sy") / nn
    sxy_c = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nn
    return m.select(
        "__n",
        (F.col("__sx") / nn).alias("__mx"),
        (F.col("__sy") / nn).alias("__my"),
        sxx_c.alias("__sxx_c"),
        syy_c.alias("__syy_c"),
        sxy_c.alias("__sxy_c"),
        (sxy_c / sxx_c).alias("__b"),
    )


_OLS_CORE_SQL = """
      SELECT CAST(n AS BIGINT) AS n,
             sx / CAST(n AS DOUBLE) AS mx,
             sy / CAST(n AS DOUBLE) AS my,
             sxx - sx * sx / CAST(n AS DOUBLE) AS sxx_c,
             syy - sy * sy / CAST(n AS DOUBLE) AS syy_c,
             sxy - sx * sy / CAST(n AS DOUBLE) AS sxy_c,
             (sxy - sx * sy / CAST(n AS DOUBLE))
               / (sxx - sx * sx / CAST(n AS DOUBLE)) AS b
      FROM (
        SELECT COUNT(*) AS n, SUM(xv) AS sx, SUM(yv) AS sy,
               SUM(xv * xv) AS sxx, SUM(yv * yv) AS syy,
               SUM(xv * yv) AS sxy
        FROM pts
      )
"""


def _pts_sql(table: str, x: str, y: str, keys: Sequence[str]) -> str:
    key_list = ", ".join(keys)
    return f"""
      SELECT {key_list},
             CAST({x} AS DOUBLE) AS xv, CAST({y} AS DOUBLE) AS yv
      FROM {table}
      WHERE {x} IS NOT NULL AND {y} IS NOT NULL
"""


def cooks_influence(
    df: DataFrame,
    x: str,
    y: str,
    keys: Sequence[str],
    top_n: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_n`` most influential observations of the simple OLS of
    ``y`` on ``x``: leverage ``h_i = 1/n + (x_i - mx)^2 / Sxx``,
    internally studentized residual ``r_i = e_i / sqrt(s^2 (1 - h_i))``,
    and Cook's distance ``D_i = r_i^2 h_i / (p (1 - h_i))`` with p = 2.

    Plan shape: one sufficient-statistics aggregate, the 1-row result
    broadcast back onto the scan, then TakeOrdered(top_n) — per-row
    diagnostics for a trillion rows never materialize a hat matrix and
    never shuffle the fact table. Ordered by cooks_d DESC with the key
    columns as deterministic tie-breaks."""
    stats = _ols_core_stats(df, x, y)
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        *keys,
        F.col(x).cast("double").alias("__x"),
        F.col(y).cast("double").alias("__y"),
    )
    j = pts.crossJoin(F.broadcast(stats))
    nn = F.col("__n").cast("double")
    xc = F.col("__x") - F.col("__mx")
    h = F.lit(1.0) / nn + xc * xc / F.col("__sxx_c")
    e = F.col("__y") - F.col("__my") - F.col("__b") * xc
    sse = F.col("__syy_c") - F.col("__b") * F.col("__sxy_c")
    s2 = sse / (nn - 2.0)
    rstud = e / F.sqrt(s2 * (F.lit(1.0) - h))
    cooks = rstud * rstud * h / (F.lit(2.0) * (F.lit(1.0) - h))
    out = j.select(
        *keys,
        F.round(h, round_to).alias("leverage"),
        F.round(rstud, round_to).alias("r_student"),
        F.round(cooks, round_to).alias("cooks_d"),
        cooks.alias("__raw"),
    )
    return (
        out.orderBy(F.col("__raw").desc(), *[F.col(k) for k in keys])
        .limit(top_n)
        .drop("__raw")
    )


def cooks_influence_sql(
    table: str,
    x: str,
    y: str,
    keys: Sequence[str],
    top_n: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cooks_influence` (identical formula order)."""
    key_list = ", ".join(keys)
    return f"""
    WITH pts AS ({_pts_sql(table, x, y, keys)}),
    m AS ({_OLS_CORE_SQL}),
    d AS (
      SELECT {key_list},
             1.0 / CAST(n AS DOUBLE) + (xv - mx) * (xv - mx) / sxx_c AS h,
             (yv - my - b * (xv - mx))
               / SQRT(((syy_c - b * sxy_c) / (CAST(n AS DOUBLE) - 2.0))
                      * (1.0 - (1.0 / CAST(n AS DOUBLE)
                                + (xv - mx) * (xv - mx) / sxx_c))) AS r
      FROM pts CROSS JOIN m
    )
    SELECT {key_list},
           ROUND(h, {round_to}) AS leverage,
           ROUND(r, {round_to}) AS r_student,
           ROUND(r * r * h / (2.0 * (1.0 - h)), {round_to}) AS cooks_d
    FROM d
    ORDER BY r * r * h / (2.0 * (1.0 - h)) DESC, {key_list}
    LIMIT {top_n}
    """


def press_loocv(
    df: DataFrame, x: str, y: str, round_to: int = 6
) -> DataFrame:
    """Leave-one-out cross-validation of the simple OLS WITHOUT refitting:
    the PRESS identity ``e_(i) = e_i / (1 - h_i)`` turns n held-out
    regressions into one scan. Output (one row): n, r2 (in-sample),
    press_rmse (sqrt(PRESS/n) — the LOO prediction error in y-units),
    and predicted_r2 = 1 - PRESS / Syy — the honest generalization
    number that drops when the fit leans on single points. Two scans
    total (moments, then the broadcast-stats residual pass); nothing
    iterative, nothing driver-side.

    PRESS itself is an unordered double sum of magnitude ~n·y² (5e14 at
    sf0.1), so emitting ``ROUND(press, 6)`` was sub-ULP — one partition
    order away from a driver hash flip (the wave-118 disease, caught by
    tools/audit_rounding.py). The emitted contracts are INTENSIVE
    (rmse in y-units, R² ratios): O(y)/O(1) at any corpus scale.
    """
    stats = _ols_core_stats(df, x, y)
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        F.col(x).cast("double").alias("__x"),
        F.col(y).cast("double").alias("__y"),
    )
    j = pts.crossJoin(F.broadcast(stats))
    nn = F.col("__n").cast("double")
    xc = F.col("__x") - F.col("__mx")
    h = F.lit(1.0) / nn + xc * xc / F.col("__sxx_c")
    e = F.col("__y") - F.col("__my") - F.col("__b") * xc
    loo = e / (F.lit(1.0) - h)
    agg = j.agg(
        F.max("__n").alias("n"),
        F.max("__syy_c").alias("__syy_c"),
        F.max(F.col("__syy_c") - F.col("__b") * F.col("__sxy_c")).alias(
            "__sse"
        ),
        F.sum(loo * loo).alias("__press"),
    )
    return agg.select(
        F.col("n"),
        F.round(F.lit(1.0) - F.col("__sse") / F.col("__syy_c"), round_to)
        .alias("r2"),
        F.round(
            F.sqrt(F.col("__press") / F.col("n").cast("double")), round_to
        ).alias("press_rmse"),
        F.round(
            F.lit(1.0) - F.col("__press") / F.col("__syy_c"), round_to
        ).alias("predicted_r2"),
    )


def press_loocv_sql(table: str, x: str, y: str, round_to: int = 6) -> str:
    """DuckDB twin of :func:`press_loocv`."""
    return f"""
    WITH pts AS ({_pts_sql(table, x, y, ["1 AS one"])}),
    m AS ({_OLS_CORE_SQL}),
    d AS (
      SELECT n, syy_c, syy_c - b * sxy_c AS sse,
             (yv - my - b * (xv - mx))
               / (1.0 - (1.0 / CAST(n AS DOUBLE)
                         + (xv - mx) * (xv - mx) / sxx_c)) AS loo
      FROM pts CROSS JOIN m
    )
    SELECT MAX(n) AS n,
           ROUND(1.0 - MAX(sse) / MAX(syy_c), {round_to}) AS r2,
           ROUND(sqrt(SUM(loo * loo) / CAST(MAX(n) AS DOUBLE)), {round_to})
             AS press_rmse,
           ROUND(1.0 - SUM(loo * loo) / MAX(syy_c), {round_to})
             AS predicted_r2
    FROM d
    """


def vif_three(
    df: DataFrame,
    cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Variance inflation factors for exactly three covariates, in closed
    form from the pairwise correlations (for p = 3 the auxiliary
    regression R² has the textbook identity
    ``R²_1|23 = (r12² + r13² - 2 r12 r13 r23) / (1 - r23²)``, cyclically)
    — so multicollinearity screening is ONE aggregate of nine moments,
    not three regression fits. Output: one row per variable
    (variable, r_squared_others, vif), ordered by variable name. Rows
    with any NULL among the three are dropped (complete-case, matching
    ``car::vif`` on ``na.omit`` data)."""
    if len(cols) != 3:
        raise ValueError("vif_three: exactly three covariates required")
    c1, c2, c3 = cols
    pts = df.filter(
        F.col(c1).isNotNull() & F.col(c2).isNotNull() & F.col(c3).isNotNull()
    ).select(
        F.col(c1).cast("double").alias("__v1"),
        F.col(c2).cast("double").alias("__v2"),
        F.col(c3).cast("double").alias("__v3"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(f"__v{i}").alias(f"s{i}") for i in (1, 2, 3)],
        *[
            F.sum(F.col(f"__v{i}") * F.col(f"__v{j}")).alias(f"s{i}{j}")
            for i, j in ((1, 1), (2, 2), (3, 3), (1, 2), (1, 3), (2, 3))
        ],
    )
    nn = F.col("n").cast("double")

    def r(i: int, j: int):
        sij = F.col(f"s{min(i, j)}{max(i, j)}")
        return (nn * sij - F.col(f"s{i}") * F.col(f"s{j}")) / F.sqrt(
            (nn * F.col(f"s{i}{i}") - F.col(f"s{i}") * F.col(f"s{i}"))
            * (nn * F.col(f"s{j}{j}") - F.col(f"s{j}") * F.col(f"s{j}"))
        )

    r12, r13, r23 = r(1, 2), r(1, 3), r(2, 3)

    def r2_of(ra, rb, rcc):
        # R² of the target on the other two: ra, rb target-other corrs,
        # rcc the other-other corr
        return (ra * ra + rb * rb - F.lit(2.0) * ra * rb * rcc) / (
            F.lit(1.0) - rcc * rcc
        )

    rows = m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(c1).alias("variable"),
                    r2_of(r12, r13, r23).alias("r2o"),
                ),
                F.struct(
                    F.lit(c2).alias("variable"),
                    r2_of(r12, r23, r13).alias("r2o"),
                ),
                F.struct(
                    F.lit(c3).alias("variable"),
                    r2_of(r13, r23, r12).alias("r2o"),
                ),
            )
        ).alias("e")
    ).select(
        F.col("e.variable").alias("variable"),
        F.round(F.col("e.r2o"), round_to).alias("r_squared_others"),
        F.round(F.lit(1.0) / (F.lit(1.0) - F.col("e.r2o")), round_to).alias(
            "vif"
        ),
    )
    return rows.orderBy("variable")


def vif_three_sql(
    table: str, cols: Sequence[str], round_to: int = 6
) -> str:
    """DuckDB twin of :func:`vif_three` (same correlation formula order)."""
    c1, c2, c3 = cols
    corr = lambda i, j: (  # noqa: E731 — tiny local SQL fragment builder
        f"(CAST(n AS DOUBLE) * s{min(i, j)}{max(i, j)} - s{i} * s{j})"
        f" / SQRT((CAST(n AS DOUBLE) * s{i}{i} - s{i} * s{i})"
        f" * (CAST(n AS DOUBLE) * s{j}{j} - s{j} * s{j}))"
    )
    return f"""
    WITH pts AS (
      SELECT CAST({c1} AS DOUBLE) AS v1, CAST({c2} AS DOUBLE) AS v2,
             CAST({c3} AS DOUBLE) AS v3
      FROM {table}
      WHERE {c1} IS NOT NULL AND {c2} IS NOT NULL AND {c3} IS NOT NULL
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(v1) AS s1, SUM(v2) AS s2, SUM(v3) AS s3,
             SUM(v1 * v1) AS s11, SUM(v2 * v2) AS s22, SUM(v3 * v3) AS s33,
             SUM(v1 * v2) AS s12, SUM(v1 * v3) AS s13, SUM(v2 * v3) AS s23
      FROM pts
    ),
    c AS (
      SELECT {corr(1, 2)} AS r12, {corr(1, 3)} AS r13, {corr(2, 3)} AS r23
      FROM m
    ),
    v AS (
      SELECT '{c1}' AS variable,
             (r12 * r12 + r13 * r13 - 2.0 * r12 * r13 * r23)
               / (1.0 - r23 * r23) AS r2o FROM c
      UNION ALL
      SELECT '{c2}',
             (r12 * r12 + r23 * r23 - 2.0 * r12 * r23 * r13)
               / (1.0 - r13 * r13) FROM c
      UNION ALL
      SELECT '{c3}',
             (r13 * r13 + r23 * r23 - 2.0 * r13 * r23 * r12)
               / (1.0 - r12 * r12) FROM c
    )
    SELECT variable, ROUND(r2o, {round_to}) AS r_squared_others,
           ROUND(1.0 / (1.0 - r2o), {round_to}) AS vif
    FROM v ORDER BY variable
    """


def ridge_two_feature(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    lambdas: Sequence[float] = (0.0, 1000.0, 100000.0),
    round_to: int = 6,
) -> DataFrame:
    """Closed-form ridge regression of ``y`` on two centered features
    across a λ grid: ``(X'X + λI) β = X'y`` solved by 2×2 Cramer's rule
    over centered sufficient statistics, intercept recovered as
    ``my - β·mx``. The ENTIRE λ path costs one hash aggregate — the grid
    multiplies literals, not scans — which is the shape regularization
    sweeps should have at 100 TB. λ = 0 reproduces OLS exactly (pinned in
    tests). Output: (lambda, intercept, beta_<x1>, beta_<x2>, coef_norm)
    ordered by lambda."""
    pts = df.filter(
        F.col(x1).isNotNull() & F.col(x2).isNotNull() & F.col(y).isNotNull()
    ).select(
        F.col(x1).cast("double").alias("__x1"),
        F.col(x2).cast("double").alias("__x2"),
        F.col(y).cast("double").alias("__y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x1").alias("s1"),
        F.sum("__x2").alias("s2"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x1") * F.col("__x1")).alias("s11"),
        F.sum(F.col("__x2") * F.col("__x2")).alias("s22"),
        F.sum(F.col("__x1") * F.col("__x2")).alias("s12"),
        F.sum(F.col("__x1") * F.col("__y")).alias("s1y"),
        F.sum(F.col("__x2") * F.col("__y")).alias("s2y"),
    )
    nn = F.col("n").cast("double")
    cent = m.select(
        "n",
        (F.col("s1") / nn).alias("m1"),
        (F.col("s2") / nn).alias("m2"),
        (F.col("sy") / nn).alias("my"),
        (F.col("s11") - F.col("s1") * F.col("s1") / nn).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / nn).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / nn).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / nn).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / nn).alias("c2y"),
    )
    lam = F.explode(
        F.array(*[F.lit(float(v)) for v in lambdas])
    ).alias("lambda")
    g = cent.select("*", lam)
    det = (F.col("c11") + F.col("lambda")) * (
        F.col("c22") + F.col("lambda")
    ) - F.col("c12") * F.col("c12")
    b1 = (
        (F.col("c22") + F.col("lambda")) * F.col("c1y")
        - F.col("c12") * F.col("c2y")
    ) / det
    b2 = (
        (F.col("c11") + F.col("lambda")) * F.col("c2y")
        - F.col("c12") * F.col("c1y")
    ) / det
    b0 = F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")
    return g.select(
        F.col("lambda"),
        F.round(b0, round_to).alias("intercept"),
        F.round(b1, round_to).alias(f"beta_{x1}"),
        F.round(b2, round_to).alias(f"beta_{x2}"),
        F.round(F.sqrt(b1 * b1 + b2 * b2), round_to).alias("coef_norm"),
    ).orderBy("lambda")


def ridge_two_feature_sql(
    table: str,
    x1: str,
    x2: str,
    y: str,
    lambdas: Sequence[float] = (0.0, 1000.0, 100000.0),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ridge_two_feature` (λ grid as VALUES)."""
    values = ", ".join(f"({float(v)!r})" for v in lambdas)
    return f"""
    WITH pts AS (
      SELECT CAST({x1} AS DOUBLE) AS v1, CAST({x2} AS DOUBLE) AS v2,
             CAST({y} AS DOUBLE) AS yv
      FROM {table}
      WHERE {x1} IS NOT NULL AND {x2} IS NOT NULL AND {y} IS NOT NULL
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(v1) AS s1, SUM(v2) AS s2, SUM(yv) AS sy,
             SUM(v1 * v1) AS s11, SUM(v2 * v2) AS s22,
             SUM(v1 * v2) AS s12, SUM(v1 * yv) AS s1y, SUM(v2 * yv) AS s2y
      FROM pts
    ),
    cent AS (
      SELECT s1 / CAST(n AS DOUBLE) AS m1, s2 / CAST(n AS DOUBLE) AS m2,
             sy / CAST(n AS DOUBLE) AS my,
             s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
             s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
             s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
             s1y - s1 * sy / CAST(n AS DOUBLE) AS c1y,
             s2y - s2 * sy / CAST(n AS DOUBLE) AS c2y
      FROM m
    ),
    g AS (
      SELECT cent.*, CAST(l.lambda AS DOUBLE) AS lambda
      FROM cent CROSS JOIN (VALUES {values}) AS l(lambda)
    ),
    sol AS (
      SELECT lambda, m1, m2, my, c12,
             ((c22 + lambda) * c1y - c12 * c2y)
               / ((c11 + lambda) * (c22 + lambda) - c12 * c12) AS b1,
             ((c11 + lambda) * c2y - c12 * c1y)
               / ((c11 + lambda) * (c22 + lambda) - c12 * c12) AS b2
      FROM g
    )
    SELECT lambda AS "lambda",
           ROUND(my - b1 * m1 - b2 * m2, {round_to}) AS intercept,
           ROUND(b1, {round_to}) AS beta_{x1},
           ROUND(b2, {round_to}) AS beta_{x2},
           ROUND(SQRT(b1 * b1 + b2 * b2), {round_to}) AS coef_norm
    FROM sol ORDER BY lambda
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 92: LMG relative importance (exact Shapley R² decomposition, p=3)
# ──────────────────────────────────────────────────────────────────────────


def lmg_importance(
    df: DataFrame,
    xs: Sequence[str],
    y: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact LMG relative importance (Lindeman-Merenda-Gold; R's
    relaimpo::lmg) for THREE predictors: each x_i's Shapley share of
    the full model R² — the average of its R² increment over all 3!
    orderings, the principled answer to "which covariate matters most"
    that raw coefficients and marginal R²s both get wrong under
    collinearity.

    For p = 3 every subset R² is closed-form in the pairwise
    correlations (1-var: r²; 2-var: the partial identity; 3-var:
    Cramer on the 3×3 correlation matrix), so the WHOLE decomposition
    is literal algebra over one 14-moment aggregate — no model fits,
    no orderings enumerated at runtime. Shapley weights for p=3:
    1/3·(0-subset), 1/6·(each 1-subset), 1/3·(2-subset).

    Output: one row per predictor (variable, lmg_share, pct_of_r2),
    plus exact additivity: Σ lmg_share = R²_full (pinned in tests).
    Ordered by variable."""
    if len(xs) != 3:
        raise ValueError("lmg_importance: exactly three predictors")
    x1, x2, x3 = xs
    pts = df.filter(
        F.col(x1).isNotNull()
        & F.col(x2).isNotNull()
        & F.col(x3).isNotNull()
        & F.col(y).isNotNull()
    ).select(
        F.col(x1).cast("double").alias("__v1"),
        F.col(x2).cast("double").alias("__v2"),
        F.col(x3).cast("double").alias("__v3"),
        F.col(y).cast("double").alias("__vy"),
    )
    names = ["1", "2", "3", "y"]
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(f"__v{a}").alias(f"s{a}") for a in names],
        *[
            F.sum(F.col(f"__v{a}") * F.col(f"__v{b}")).alias(f"s{a}{b}")
            for ai, a in enumerate(names)
            for b in names[ai:]
        ],
    )
    nn = F.col("n").cast("double")

    def corr(a: str, b: str):
        key = f"s{a}{b}" if f"s{a}{b}" in m.columns else f"s{b}{a}"
        return (nn * F.col(key) - F.col(f"s{a}") * F.col(f"s{b}")) / F.sqrt(
            (nn * F.col(f"s{a}{a}") - F.col(f"s{a}") * F.col(f"s{a}"))
            * (nn * F.col(f"s{b}{b}") - F.col(f"s{b}") * F.col(f"s{b}"))
        )

    r12, r13, r23 = corr("1", "2"), corr("1", "3"), corr("2", "3")
    r1y, r2y, r3y = corr("1", "y"), corr("2", "y"), corr("3", "y")

    def r2_one(riy):
        return riy * riy

    def r2_two(ra, rb, rab):
        return (ra * ra + rb * rb - F.lit(2.0) * ra * rb * rab) / (
            F.lit(1.0) - rab * rab
        )

    # full-model R² = r' C⁻¹ r via Cramer on the correlation matrix
    det = (
        F.lit(1.0)
        + F.lit(2.0) * r12 * r13 * r23
        - r12 * r12
        - r13 * r13
        - r23 * r23
    )
    b1 = (
        r1y * (F.lit(1.0) - r23 * r23)
        + r2y * (r13 * r23 - r12)
        + r3y * (r12 * r23 - r13)
    ) / det
    b2 = (
        r1y * (r13 * r23 - r12)
        + r2y * (F.lit(1.0) - r13 * r13)
        + r3y * (r12 * r13 - r23)
    ) / det
    b3 = (
        r1y * (r12 * r23 - r13)
        + r2y * (r12 * r13 - r23)
        + r3y * (F.lit(1.0) - r12 * r12)
    ) / det
    r2_full = b1 * r1y + b2 * r2y + b3 * r3y
    r2_1, r2_2, r2_3 = r2_one(r1y), r2_one(r2y), r2_one(r3y)
    r2_12 = r2_two(r1y, r2y, r12)
    r2_13 = r2_two(r1y, r3y, r13)
    r2_23 = r2_two(r2y, r3y, r23)
    lmg1 = (
        r2_1 / 3.0
        + ((r2_12 - r2_2) + (r2_13 - r2_3)) / 6.0
        + (r2_full - r2_23) / 3.0
    )
    lmg2 = (
        r2_2 / 3.0
        + ((r2_12 - r2_1) + (r2_23 - r2_3)) / 6.0
        + (r2_full - r2_13) / 3.0
    )
    lmg3 = (
        r2_3 / 3.0
        + ((r2_13 - r2_1) + (r2_23 - r2_2)) / 6.0
        + (r2_full - r2_12) / 3.0
    )
    rows = m.select(
        r2_full.alias("__r2f"),
        F.explode(
            F.array(
                F.struct(F.lit(x1).alias("variable"), lmg1.alias("lmg")),
                F.struct(F.lit(x2).alias("variable"), lmg2.alias("lmg")),
                F.struct(F.lit(x3).alias("variable"), lmg3.alias("lmg")),
            )
        ).alias("e"),
    ).select(
        F.col("e.variable").alias("variable"),
        F.round(F.col("e.lmg"), round_to).alias("lmg_share"),
        F.round(F.col("e.lmg") / F.col("__r2f"), round_to).alias(
            "pct_of_r2"
        ),
    )
    return rows.orderBy("variable")


def lmg_importance_sql(
    table: str, xs: Sequence[str], y: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`lmg_importance` (same formula order)."""
    x1, x2, x3 = xs
    names = ["1", "2", "3", "y"]
    moment_cols = ", ".join(
        [f"SUM(v{a}) AS s{a}" for a in names]
        + [
            f"SUM(v{a} * v{b}) AS s{a}{b}"
            for ai, a in enumerate(names)
            for b in names[ai:]
        ]
    )

    def corr(a, b):
        # callers always pass (a, b) in moment-column order
        key = f"s{a}{b}"
        return (
            f"((CAST(n AS DOUBLE) * {key} - s{a} * s{b})"
            f" / SQRT((CAST(n AS DOUBLE) * s{a}{a} - s{a} * s{a})"
            f" * (CAST(n AS DOUBLE) * s{b}{b} - s{b} * s{b})))"
        )

    r12, r13, r23 = corr("1", "2"), corr("1", "3"), corr("2", "3")
    r1y, r2y, r3y = corr("1", "y"), corr("2", "y"), corr("3", "y")
    return f"""
    WITH pts AS (
      SELECT CAST({x1} AS DOUBLE) AS v1, CAST({x2} AS DOUBLE) AS v2,
             CAST({x3} AS DOUBLE) AS v3, CAST({y} AS DOUBLE) AS vy
      FROM {table}
      WHERE {x1} IS NOT NULL AND {x2} IS NOT NULL AND {x3} IS NOT NULL
        AND {y} IS NOT NULL
    ),
    m AS (SELECT COUNT(*) AS n, {moment_cols} FROM pts),
    c AS (
      SELECT {r12} AS r12, {r13} AS r13, {r23} AS r23,
             {r1y} AS r1y, {r2y} AS r2y, {r3y} AS r3y
      FROM m
    ),
    f AS (
      SELECT *,
             1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13
               - r23 * r23 AS det
      FROM c
    ),
    b AS (
      SELECT *,
             (r1y * (1.0 - r23 * r23) + r2y * (r13 * r23 - r12)
              + r3y * (r12 * r23 - r13)) / det AS b1,
             (r1y * (r13 * r23 - r12) + r2y * (1.0 - r13 * r13)
              + r3y * (r12 * r13 - r23)) / det AS b2,
             (r1y * (r12 * r23 - r13) + r2y * (r12 * r13 - r23)
              + r3y * (1.0 - r12 * r12)) / det AS b3
      FROM f
    ),
    r2s AS (
      SELECT *,
             b1 * r1y + b2 * r2y + b3 * r3y AS r2_full,
             r1y * r1y AS r2_1, r2y * r2y AS r2_2, r3y * r3y AS r2_3,
             (r1y * r1y + r2y * r2y - 2.0 * r1y * r2y * r12)
               / (1.0 - r12 * r12) AS r2_12,
             (r1y * r1y + r3y * r3y - 2.0 * r1y * r3y * r13)
               / (1.0 - r13 * r13) AS r2_13,
             (r2y * r2y + r3y * r3y - 2.0 * r2y * r3y * r23)
               / (1.0 - r23 * r23) AS r2_23
      FROM b
    ),
    lmg AS (
      SELECT '{x1}' AS variable,
             r2_1 / 3.0 + ((r2_12 - r2_2) + (r2_13 - r2_3)) / 6.0
               + (r2_full - r2_23) / 3.0 AS lmg, r2_full FROM r2s
      UNION ALL
      SELECT '{x2}',
             r2_2 / 3.0 + ((r2_12 - r2_1) + (r2_23 - r2_3)) / 6.0
               + (r2_full - r2_13) / 3.0, r2_full FROM r2s
      UNION ALL
      SELECT '{x3}',
             r2_3 / 3.0 + ((r2_13 - r2_1) + (r2_23 - r2_2)) / 6.0
               + (r2_full - r2_12) / 3.0, r2_full FROM r2s
    )
    SELECT variable, ROUND(lmg, {round_to}) AS lmg_share,
           ROUND(lmg / r2_full, {round_to}) AS pct_of_r2
    FROM lmg ORDER BY variable
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 94: Siegel repeated-medians slope (50% breakdown robust trend)
# ──────────────────────────────────────────────────────────────────────────


def siegel_repeated_medians(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Siegel's repeated-medians line: slope = median over points i of
    (median over j≠i of pairwise slope (y_j-y_i)/(x_j-x_i)), intercept
    = median of (y_i - slope·x_i). Breakdown point 50% — twice
    Theil-Sen's 29%, the strongest simple robust trend there is: half
    the days can be garbage and the line stands.

    The pair stage is the daily-rollup self-join (bounded kernel, same
    discipline as matrix_profile/newey_west: n = days, never rows);
    the two median passes are exact interpolated percentiles. Output
    (one row): n_days, slope, intercept."""
    pts = daily.select(
        F.col(date_col).cast("double").alias("__x"),
        F.col(value_col).cast("double").alias("__y"),
    )
    # the O(n²) pair kernel below streams `a`: fan it out so the
    # quadratic work runs cluster-wide, not on the single partition the
    # tiny daily rollup coalesces to (exact medians are order-free, so
    # partitioning cannot change the result)
    a = fan_out(
        pts.select(F.col("__x").alias("xi"), F.col("__y").alias("yi"))
    )
    b = pts.select(F.col("__x").alias("xj"), F.col("__y").alias("yj"))
    inner = (
        a.join(b, F.col("xi") != F.col("xj"))
        .select(
            "xi",
            "yi",
            (
                (F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))
            ).alias("__s"),
        )
        .groupBy("xi", "yi")
        .agg(F.expr("percentile(__s, 0.5)").alias("__ms"))
        # n_days rows; checkpoint so the O(n²) pair stage runs ONCE —
        # the broadcast(agg) below otherwise re-executes it a second
        # time for the scalar side (bit-identical results, half the
        # work). EAGER: a lazy checkpoint here is materialized from
        # inside broadcast-exchange threads, which race and can
        # re-execute the full lineage instead of waiting (observed as
        # a minutes-long CPU burn on a plan that runs in seconds)
        .localCheckpoint(eager=True)
    )
    agg = inner.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("percentile(__ms, 0.5)").alias("__slope"),
    )
    both = inner.crossJoin(F.broadcast(agg)).agg(
        F.max("n_days").alias("n_days"),
        F.max("__slope").alias("__slope"),
        F.expr("percentile(yi - __slope * xi, 0.5)").alias("__icpt"),
    )
    return both.select(
        "n_days",
        F.round("__slope", round_to).alias("slope"),
        F.round("__icpt", round_to).alias("intercept"),
    )


def siegel_repeated_medians_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`siegel_repeated_medians`."""
    return f"""
    WITH d0 AS ({daily_sql}),
    pts AS (
      SELECT CAST({date_col} AS DOUBLE) AS x,
             CAST({value_col} AS DOUBLE) AS y
      FROM d0
    ),
    inner_med AS (
      SELECT a.x AS xi, a.y AS yi,
             quantile_cont((b.y - a.y) / (b.x - a.x), 0.5) AS ms
      FROM pts a JOIN pts b ON a.x <> b.x
      GROUP BY a.x, a.y
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             quantile_cont(ms, 0.5) AS slope
      FROM inner_med
    )
    SELECT s.n_days,
           ROUND(s.slope, {round_to}) AS slope,
           ROUND(quantile_cont(i.yi - s.slope * i.xi, 0.5), {round_to})
             AS intercept
    FROM inner_med i CROSS JOIN s
    GROUP BY s.n_days, s.slope
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 97: misspecification battery — White test + Ramsey RESET
# ──────────────────────────────────────────────────────────────────────────


def _w97_scaled(daily: DataFrame, date_col: str, value_col: str) -> DataFrame:
    """Shared prep for the wave-97 tests: t = ROW_NUMBER over the date
    order, u = (2t − n − 1)/(n − 1) ∈ [−1, 1] (integer numerator, so
    both engines compute the identical double), and y normalized by
    its mean so every downstream moment is O(n) — White's LM and
    RESET's F are scale-free, the normalization is purely numeric
    conditioning (u, u², u³ on a [−1,1] grid keep the normal-equation
    determinant well away from 0, where raw t, t², t³ would be
    catastrophically collinear)."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w = Window.partitionBy()
    n_w = F.count(F.lit(1)).over(w).cast("double")
    sy_w = F.sum("__y").over(w)
    return pts.select(
        (
            (F.lit(2.0) * F.col("__t").cast("double") - n_w - F.lit(1.0))
            / (n_w - F.lit(1.0))
        ).alias("__u"),
        (F.col("__y") * n_w / sy_w).alias("__yn"),
    )


_W97_SCALED_SQL = """
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    scaled AS (
      SELECT (2.0 * CAST(t AS DOUBLE)
              - CAST(COUNT(*) OVER () AS DOUBLE) - 1.0)
             / (CAST(COUNT(*) OVER () AS DOUBLE) - 1.0) AS u,
             y * CAST(COUNT(*) OVER () AS DOUBLE) / SUM(y) OVER () AS yn
      FROM pts
    )"""


def white_test(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """White's general heteroskedasticity test on the daily trend
    fit: OLS y = a + b·u, then the auxiliary regression of squared
    residuals on (u, u²) — LM = n·R²_aux ~ χ²(2) under
    homoskedasticity. The strictly stronger sibling of breusch_pagan
    above: BP's auxiliary is linear in u and misses variance that
    swells at BOTH ends of the sample (a U-shape); White's u² term
    catches it, with no distributional assumption on the errors.

    Two O(days) aggregate passes with a scalar broadcast between; the
    2×2 auxiliary normal equations are solved in closed form.
    Output (one row): n_days, r2_aux, lm_stat."""
    scaled = _w97_scaled(daily, date_col, value_col)
    m = scaled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__u").alias("su"),
        F.sum(F.col("__u") * F.col("__u")).alias("su2"),
        F.sum("__yn").alias("syn"),
        F.sum(F.col("__u") * F.col("__yn")).alias("suy"),
    )
    nn = F.col("n").cast("double")
    stats = m.select(
        (F.col("su") / nn).alias("mu"),
        (F.col("syn") / nn).alias("my"),
        (
            (F.col("suy") - F.col("su") * F.col("syn") / nn)
            / (F.col("su2") - F.col("su") * F.col("su") / nn)
        ).alias("b"),
    )
    resid = F.col("__yn") - F.col("my") - F.col("b") * (
        F.col("__u") - F.col("mu")
    )
    aux = scaled.crossJoin(F.broadcast(stats)).select(
        F.col("__u").alias("__z1"),
        (F.col("__u") * F.col("__u")).alias("__z2"),
        (resid * resid).alias("__g"),
    )
    a = aux.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__z1").alias("s1"),
        F.sum("__z2").alias("s2"),
        F.sum(F.col("__z1") * F.col("__z1")).alias("s11"),
        F.sum(F.col("__z1") * F.col("__z2")).alias("s12"),
        F.sum(F.col("__z2") * F.col("__z2")).alias("s22"),
        F.sum("__g").alias("sg"),
        F.sum(F.col("__g") * F.col("__g")).alias("sgg"),
        F.sum(F.col("__z1") * F.col("__g")).alias("s1g"),
        F.sum(F.col("__z2") * F.col("__g")).alias("s2g"),
    )
    nn2 = F.col("n_days").cast("double")
    a11 = F.col("s11") - F.col("s1") * F.col("s1") / nn2
    a12 = F.col("s12") - F.col("s1") * F.col("s2") / nn2
    a22 = F.col("s22") - F.col("s2") * F.col("s2") / nn2
    c1 = F.col("s1g") - F.col("s1") * F.col("sg") / nn2
    c2 = F.col("s2g") - F.col("s2") * F.col("sg") / nn2
    sgg_c = F.col("sgg") - F.col("sg") * F.col("sg") / nn2
    ess = (a22 * c1 * c1 - F.lit(2.0) * a12 * c1 * c2 + a11 * c2 * c2) / (
        a11 * a22 - a12 * a12
    )
    r2 = ess / sgg_c
    return a.select(
        "n_days",
        F.round(r2, round_to).alias("r2_aux"),
        F.round(nn2 * r2, round_to).alias("lm_stat"),
    )


def white_test_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`white_test`."""
    scaled = _W97_SCALED_SQL.format(date_col=date_col, value_col=value_col)
    return f"""
    WITH d AS ({daily_sql}),{scaled},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(u) AS su, SUM(u * u) AS su2,
             SUM(yn) AS syn, SUM(u * yn) AS suy
      FROM scaled
    ),
    st AS (
      SELECT su / CAST(n AS DOUBLE) AS mu,
             syn / CAST(n AS DOUBLE) AS my,
             (suy - su * syn / CAST(n AS DOUBLE))
             / (su2 - su * su / CAST(n AS DOUBLE)) AS b
      FROM m
    ),
    aux AS (
      SELECT u AS z1, u * u AS z2,
             (yn - my - b * (u - mu)) * (yn - my - b * (u - mu)) AS g
      FROM scaled CROSS JOIN st
    ),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(z1) AS s1, SUM(z2) AS s2,
             SUM(z1 * z1) AS s11, SUM(z1 * z2) AS s12,
             SUM(z2 * z2) AS s22,
             SUM(g) AS sg, SUM(g * g) AS sgg,
             SUM(z1 * g) AS s1g, SUM(z2 * g) AS s2g
      FROM aux
    )
    SELECT n_days,
           ROUND(((s22 - s2 * s2 / CAST(n_days AS DOUBLE))
                    * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                    * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                  - 2.0 * (s12 - s1 * s2 / CAST(n_days AS DOUBLE))
                    * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                    * (s2g - s2 * sg / CAST(n_days AS DOUBLE))
                  + (s11 - s1 * s1 / CAST(n_days AS DOUBLE))
                    * (s2g - s2 * sg / CAST(n_days AS DOUBLE))
                    * (s2g - s2 * sg / CAST(n_days AS DOUBLE)))
                 / (((s11 - s1 * s1 / CAST(n_days AS DOUBLE))
                     * (s22 - s2 * s2 / CAST(n_days AS DOUBLE))
                     - (s12 - s1 * s2 / CAST(n_days AS DOUBLE))
                       * (s12 - s1 * s2 / CAST(n_days AS DOUBLE)))
                    * (sgg - sg * sg / CAST(n_days AS DOUBLE))),
                 {round_to}) AS r2_aux,
           ROUND(CAST(n_days AS DOUBLE)
                 * ((s22 - s2 * s2 / CAST(n_days AS DOUBLE))
                      * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                      * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                    - 2.0 * (s12 - s1 * s2 / CAST(n_days AS DOUBLE))
                      * (s1g - s1 * sg / CAST(n_days AS DOUBLE))
                      * (s2g - s2 * sg / CAST(n_days AS DOUBLE))
                    + (s11 - s1 * s1 / CAST(n_days AS DOUBLE))
                      * (s2g - s2 * sg / CAST(n_days AS DOUBLE))
                      * (s2g - s2 * sg / CAST(n_days AS DOUBLE)))
                 / (((s11 - s1 * s1 / CAST(n_days AS DOUBLE))
                     * (s22 - s2 * s2 / CAST(n_days AS DOUBLE))
                     - (s12 - s1 * s2 / CAST(n_days AS DOUBLE))
                       * (s12 - s1 * s2 / CAST(n_days AS DOUBLE)))
                    * (sgg - sg * sg / CAST(n_days AS DOUBLE))),
                 {round_to}) AS lm_stat
    FROM a
    """


def ramsey_reset(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Ramsey RESET (regression specification error test) on the
    daily trend: does adding powers of the fitted values improve the
    linear fit more than chance? With a single regressor the fitted
    values are affine in u, so span(1, u, ŷ², ŷ³) = span(1, u, u²,
    u³) and the joint F on the added powers is IDENTICAL to testing
    (u², u³) directly — the numerically conditioned form used here
    (u ∈ [−1, 1], so the 3×3 normal-equation determinant stays far
    from zero; raw t, t², t³ would be catastrophically collinear).

      F = ((RSS_base − RSS_full)/2) / (RSS_full/(n − 4)) ~ F(2, n−4)

    under correct specification. One O(days) aggregate pass; the 3×3
    system is solved by the explicit symmetric inverse. Output (one
    row): n_days, r2_base, r2_full, f_stat."""
    scaled = _w97_scaled(daily, date_col, value_col)
    rows = scaled.select(
        F.col("__u").alias("__z1"),
        (F.col("__u") * F.col("__u")).alias("__z2"),
        (F.col("__u") * F.col("__u") * F.col("__u")).alias("__z3"),
        F.col("__yn").alias("__g"),
    )
    a = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__z1").alias("s1"),
        F.sum("__z2").alias("s2"),
        F.sum("__z3").alias("s3"),
        F.sum(F.col("__z1") * F.col("__z1")).alias("s11"),
        F.sum(F.col("__z1") * F.col("__z2")).alias("s12"),
        F.sum(F.col("__z1") * F.col("__z3")).alias("s13"),
        F.sum(F.col("__z2") * F.col("__z2")).alias("s22"),
        F.sum(F.col("__z2") * F.col("__z3")).alias("s23"),
        F.sum(F.col("__z3") * F.col("__z3")).alias("s33"),
        F.sum("__g").alias("sg"),
        F.sum(F.col("__g") * F.col("__g")).alias("sgg"),
        F.sum(F.col("__z1") * F.col("__g")).alias("s1g"),
        F.sum(F.col("__z2") * F.col("__g")).alias("s2g"),
        F.sum(F.col("__z3") * F.col("__g")).alias("s3g"),
    )
    nn = F.col("n_days").cast("double")
    a11 = F.col("s11") - F.col("s1") * F.col("s1") / nn
    a12 = F.col("s12") - F.col("s1") * F.col("s2") / nn
    a13 = F.col("s13") - F.col("s1") * F.col("s3") / nn
    a22 = F.col("s22") - F.col("s2") * F.col("s2") / nn
    a23 = F.col("s23") - F.col("s2") * F.col("s3") / nn
    a33 = F.col("s33") - F.col("s3") * F.col("s3") / nn
    c1 = F.col("s1g") - F.col("s1") * F.col("sg") / nn
    c2 = F.col("s2g") - F.col("s2") * F.col("sg") / nn
    c3 = F.col("s3g") - F.col("s3") * F.col("sg") / nn
    syy = F.col("sgg") - F.col("sg") * F.col("sg") / nn
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    ess_full = (
        c1 * c1 * (a22 * a33 - a23 * a23)
        + c2 * c2 * (a11 * a33 - a13 * a13)
        + c3 * c3 * (a11 * a22 - a12 * a12)
        + F.lit(2.0) * c1 * c2 * (a13 * a23 - a12 * a33)
        + F.lit(2.0) * c1 * c3 * (a12 * a23 - a13 * a22)
        + F.lit(2.0) * c2 * c3 * (a12 * a13 - a11 * a23)
    ) / det
    ess_base = c1 * c1 / a11
    rss_base = syy - ess_base
    rss_full = syy - ess_full
    f_stat = ((rss_base - rss_full) / F.lit(2.0)) / (
        rss_full / (nn - F.lit(4.0))
    )
    return a.select(
        "n_days",
        F.round(ess_base / syy, round_to).alias("r2_base"),
        F.round(ess_full / syy, round_to).alias("r2_full"),
        F.round(f_stat, round_to).alias("f_stat"),
    )


def ramsey_reset_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ramsey_reset`."""
    scaled = _W97_SCALED_SQL.format(date_col=date_col, value_col=value_col)
    return f"""
    WITH d AS ({daily_sql}),{scaled},
    rows_ AS (
      SELECT u AS z1, u * u AS z2, u * u * u AS z3, yn AS g
      FROM scaled
    ),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(z1) AS s1, SUM(z2) AS s2, SUM(z3) AS s3,
             SUM(z1 * z1) AS s11, SUM(z1 * z2) AS s12,
             SUM(z1 * z3) AS s13, SUM(z2 * z2) AS s22,
             SUM(z2 * z3) AS s23, SUM(z3 * z3) AS s33,
             SUM(g) AS sg, SUM(g * g) AS sgg,
             SUM(z1 * g) AS s1g, SUM(z2 * g) AS s2g, SUM(z3 * g) AS s3g
      FROM rows_
    ),
    cm AS (
      SELECT n_days,
             s11 - s1 * s1 / CAST(n_days AS DOUBLE) AS a11,
             s12 - s1 * s2 / CAST(n_days AS DOUBLE) AS a12,
             s13 - s1 * s3 / CAST(n_days AS DOUBLE) AS a13,
             s22 - s2 * s2 / CAST(n_days AS DOUBLE) AS a22,
             s23 - s2 * s3 / CAST(n_days AS DOUBLE) AS a23,
             s33 - s3 * s3 / CAST(n_days AS DOUBLE) AS a33,
             s1g - s1 * sg / CAST(n_days AS DOUBLE) AS c1,
             s2g - s2 * sg / CAST(n_days AS DOUBLE) AS c2,
             s3g - s3 * sg / CAST(n_days AS DOUBLE) AS c3,
             sgg - sg * sg / CAST(n_days AS DOUBLE) AS syy
      FROM a
    ),
    sol AS (
      SELECT n_days, syy,
             c1 * c1 / a11 AS ess_base,
             (c1 * c1 * (a22 * a33 - a23 * a23)
              + c2 * c2 * (a11 * a33 - a13 * a13)
              + c3 * c3 * (a11 * a22 - a12 * a12)
              + 2.0 * c1 * c2 * (a13 * a23 - a12 * a33)
              + 2.0 * c1 * c3 * (a12 * a23 - a13 * a22)
              + 2.0 * c2 * c3 * (a12 * a13 - a11 * a23))
             / (a11 * (a22 * a33 - a23 * a23)
                - a12 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * a23 - a22 * a13)) AS ess_full
      FROM cm
    )
    SELECT n_days,
           ROUND(ess_base / syy, {round_to}) AS r2_base,
           ROUND(ess_full / syy, {round_to}) AS r2_full,
           ROUND(((syy - ess_base) - (syy - ess_full)) / 2.0
                 / ((syy - ess_full) / (CAST(n_days AS DOUBLE) - 4.0)),
                 {round_to}) AS f_stat
    FROM sol
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 107: Prais-Winsten AR(1) GLS + Pesaran-Timmermann
# ──────────────────────────────────────────────────────────────────────────


def prais_winsten(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Prais-Winsten feasible-GLS trend under AR(1) errors: the suite
    DETECTS serial correlation (durbin_watson, ljung_box) and patches
    the SEs (newey_west_trend); this is the step nobody else takes —
    RE-ESTIMATING the line itself, which under strong AR(1) is more
    efficient than OLS and shifts the point estimate. Two passes:

    1. OLS y = a + b·t, residual autocorrelation
       ρ̂ = Σ e_t e_{t−1} / Σ e_{t−1}².
    2. quasi-difference y*_t = y_t − ρ̂y_{t−1}, x*_t = t − ρ̂(t−1),
       c*_t = 1 − ρ̂, with the FIRST observation retained scaled by
       √(1−ρ̂²) (the Prais-Winsten improvement over Cochrane-Orcutt's
       row drop); then no-intercept OLS on (c*, x*) via the closed
       2×2 normal equations.

    y is mean-normalized (scale-free slopes are reported relative to
    it — the RATIO slope_pw/slope_ols is the economically meaningful
    read-out) and t enters raw; all aggregates are O(days). Output
    (one row): n_days, rho, slope_ols, slope_pw, intercept_pw —
    slopes on the normalized-y scale."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y0"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("double")
        .alias("__t"),
    )
    w_all = Window.partitionBy()
    pts = pts.select(
        "__t",
        (
            F.col("__y0")
            * F.count(F.lit(1)).over(w_all).cast("double")
            / F.sum("__y0").over(w_all)
        ).alias("__y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__t").alias("st"),
        F.sum(F.col("__t") * F.col("__t")).alias("st2"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__t") * F.col("__y")).alias("sty"),
    )
    nn = F.col("n").cast("double")
    ols = m.select(
        "n",
        (F.col("st") / nn).alias("mt"),
        (F.col("sy") / nn).alias("my"),
        (
            (F.col("sty") - F.col("st") * F.col("sy") / nn)
            / (F.col("st2") - F.col("st") * F.col("st") / nn)
        ).alias("b_ols"),
    )
    w_t = Window.orderBy("__t")
    resid = pts.crossJoin(F.broadcast(ols)).select(
        "__t",
        "__y",
        "n",
        "b_ols",
        "my",
        "mt",
        (
            F.col("__y")
            - F.col("my")
            - F.col("b_ols") * (F.col("__t") - F.col("mt"))
        ).alias("__e"),
    )
    lagged = resid.select(
        "*", F.lag("__e").over(w_t).alias("__el"),
        F.lag("__y").over(w_t).alias("__yl"),
    )
    rho_agg = lagged.agg(
        F.max("n").alias("n"),
        F.max("b_ols").alias("b_ols"),
        (
            F.sum(
                F.when(
                    F.col("__el").isNotNull(), F.col("__e") * F.col("__el")
                ).otherwise(0.0)
            )
            / F.sum(
                F.when(
                    F.col("__el").isNotNull(), F.col("__el") * F.col("__el")
                ).otherwise(0.0)
            )
        ).alias("rho"),
    )
    star = lagged.crossJoin(
        F.broadcast(rho_agg.select(F.col("rho").alias("__rho")))
    ).select(
        F.when(
            F.col("__yl").isNotNull(),
            F.col("__y") - F.col("__rho") * F.col("__yl"),
        )
        .otherwise(
            F.col("__y")
            * F.sqrt(F.lit(1.0) - F.col("__rho") * F.col("__rho"))
        )
        .alias("__ys"),
        F.when(
            F.col("__yl").isNotNull(),
            F.col("__t") - F.col("__rho") * (F.col("__t") - 1.0),
        )
        .otherwise(
            F.col("__t")
            * F.sqrt(F.lit(1.0) - F.col("__rho") * F.col("__rho"))
        )
        .alias("__xs"),
        F.when(
            F.col("__yl").isNotNull(), F.lit(1.0) - F.col("__rho")
        )
        .otherwise(F.sqrt(F.lit(1.0) - F.col("__rho") * F.col("__rho")))
        .alias("__cs"),
    )
    g = star.agg(
        F.sum(F.col("__cs") * F.col("__cs")).alias("scc"),
        F.sum(F.col("__cs") * F.col("__xs")).alias("scx"),
        F.sum(F.col("__xs") * F.col("__xs")).alias("sxx"),
        F.sum(F.col("__cs") * F.col("__ys")).alias("scy"),
        F.sum(F.col("__xs") * F.col("__ys")).alias("sxy"),
    )
    det = F.col("scc") * F.col("sxx") - F.col("scx") * F.col("scx")
    b_pw = (F.col("scc") * F.col("sxy") - F.col("scx") * F.col("scy")) / det
    a_pw = (F.col("sxx") * F.col("scy") - F.col("scx") * F.col("sxy")) / det
    final = rho_agg.crossJoin(F.broadcast(g.select(b_pw.alias("__bpw"), a_pw.alias("__apw"))))
    return final.select(
        F.col("n").alias("n_days"),
        F.round(F.col("rho"), round_to).alias("rho"),
        F.round(F.col("b_ols"), round_to).alias("slope_ols"),
        F.round(F.col("__bpw"), round_to).alias("slope_pw"),
        F.round(F.col("__apw"), round_to).alias("intercept_pw"),
    )


def prais_winsten_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`prais_winsten`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts0 AS (
      SELECT CAST({value_col} AS DOUBLE) AS y0,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS DOUBLE) AS t
      FROM d
    ),
    pts AS (
      SELECT t, y0 * CAST(COUNT(*) OVER () AS DOUBLE) / SUM(y0) OVER ()
               AS y
      FROM pts0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(t) AS st,
             SUM(t * t) AS st2, SUM(y) AS sy, SUM(t * y) AS sty
      FROM pts
    ),
    ols AS (
      SELECT n, st / CAST(n AS DOUBLE) AS mt, sy / CAST(n AS DOUBLE) AS my,
             (sty - st * sy / CAST(n AS DOUBLE))
             / (st2 - st * st / CAST(n AS DOUBLE)) AS b_ols
      FROM m
    ),
    resid AS (
      SELECT p.t, p.y, o.n, o.b_ols,
             p.y - o.my - o.b_ols * (p.t - o.mt) AS e
      FROM pts p CROSS JOIN ols o
    ),
    lagged AS (
      SELECT t, y, n, b_ols, e,
             LAG(e) OVER (ORDER BY t) AS el,
             LAG(y) OVER (ORDER BY t) AS yl
      FROM resid
    ),
    rho_t AS (
      SELECT MAX(n) AS n, MAX(b_ols) AS b_ols,
             SUM(CASE WHEN el IS NOT NULL THEN e * el ELSE 0.0 END)
             / SUM(CASE WHEN el IS NOT NULL THEN el * el ELSE 0.0 END)
               AS rho
      FROM lagged
    ),
    star AS (
      SELECT CASE WHEN l.yl IS NOT NULL THEN l.y - r.rho * l.yl
                  ELSE l.y * SQRT(1.0 - r.rho * r.rho) END AS ys,
             CASE WHEN l.yl IS NOT NULL THEN l.t - r.rho * (l.t - 1.0)
                  ELSE l.t * SQRT(1.0 - r.rho * r.rho) END AS xs,
             CASE WHEN l.yl IS NOT NULL THEN 1.0 - r.rho
                  ELSE SQRT(1.0 - r.rho * r.rho) END AS cs
      FROM lagged l CROSS JOIN rho_t r
    ),
    g AS (
      SELECT SUM(cs * cs) AS scc, SUM(cs * xs) AS scx,
             SUM(xs * xs) AS sxx, SUM(cs * ys) AS scy,
             SUM(xs * ys) AS sxy
      FROM star
    )
    SELECT r.n AS n_days,
           ROUND(r.rho, {round_to}) AS rho,
           ROUND(r.b_ols, {round_to}) AS slope_ols,
           ROUND((g.scc * g.sxy - g.scx * g.scy)
                 / (g.scc * g.sxx - g.scx * g.scx), {round_to}) AS slope_pw,
           ROUND((g.sxx * g.scy - g.scx * g.sxy)
                 / (g.scc * g.sxx - g.scx * g.scx), {round_to})
             AS intercept_pw
    FROM rho_t r CROSS JOIN g
    """


def pesaran_timmermann(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Pesaran-Timmermann (1992) directional-accuracy test of the
    momentum rule "predict today's direction by yesterday's": is the
    sign hit rate better than the no-skill rate implied by the two
    marginal up-probabilities? The market-efficiency read-out a raw
    hit percentage cannot give (a drifting series makes 70% hit rates
    trivially):

      PT = (p̂ − p*) / √(V̂(p̂) − V̂(p*)) ~ N(0, 1),
      p* = P_a·P_f + (1−P_a)(1−P_f).

    Directions are exact sign comparisons (Δ > 0; the zero-change
    convention maps to down) and every probability is a ratio of
    exact bigint counts — one window pass, one aggregate, one closing
    expression. Output (one row): n_pairs, hit_rate, p_star,
    pt_stat."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w = Window.orderBy("__t")
    # actual = sign of today's change, forecast = sign of yesterday's
    paired = pts.select(
        "__t",
        (F.col("__y") - F.lag("__y").over(w)).alias("__d"),
    ).select(
        "__t",
        (F.col("__d") > 0).cast("int").alias("__a"),
        (F.lag("__d").over(w) > 0).cast("int").alias("__f"),
    ).filter(F.col("__f").isNotNull() & F.col("__a").isNotNull())
    g = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("__a") == F.col("__f"), 1).otherwise(0)
        ).cast("bigint").alias("hits"),
        F.sum("__a").cast("bigint").alias("ups_a"),
        F.sum("__f").cast("bigint").alias("ups_f"),
    )
    nn = F.col("n_pairs").cast("double")
    p_hat = F.col("hits").cast("double") / nn
    pa = F.col("ups_a").cast("double") / nn
    pf = F.col("ups_f").cast("double") / nn
    p_star = pa * pf + (1.0 - pa) * (1.0 - pf)
    v_hat = p_star * (1.0 - p_star) / nn
    v_star = (
        (2.0 * pf - 1.0) * (2.0 * pf - 1.0) * pa * (1.0 - pa) / nn
        + (2.0 * pa - 1.0) * (2.0 * pa - 1.0) * pf * (1.0 - pf) / nn
        + 4.0 * pa * pf * (1.0 - pa) * (1.0 - pf) / (nn * nn)
    )
    pt = (p_hat - p_star) / F.sqrt(v_hat - v_star)
    return g.select(
        "n_pairs",
        F.round(p_hat, round_to).alias("hit_rate"),
        F.round(p_star, round_to).alias("p_star"),
        F.round(pt, round_to).alias("pt_stat"),
    )


def pesaran_timmermann_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`pesaran_timmermann`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    diffs AS (
      SELECT t, y - LAG(y) OVER (ORDER BY t) AS dd FROM pts
    ),
    paired AS (
      SELECT CASE WHEN dd > 0 THEN 1 ELSE 0 END AS a,
             CASE WHEN LAG(dd) OVER (ORDER BY t) > 0 THEN 1 ELSE 0 END AS f,
             LAG(dd) OVER (ORDER BY t) AS fl, dd
      FROM diffs
      QUALIFY dd IS NOT NULL AND fl IS NOT NULL
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN a = f THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
             CAST(SUM(a) AS BIGINT) AS ups_a,
             CAST(SUM(f) AS BIGINT) AS ups_f
      FROM paired
    )
    SELECT n_pairs,
           ROUND(CAST(hits AS DOUBLE) / CAST(n_pairs AS DOUBLE),
                 {round_to}) AS hit_rate,
           ROUND((CAST(ups_a AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                 * (CAST(ups_f AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                 + (1.0 - CAST(ups_a AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                   * (1.0 - CAST(ups_f AS DOUBLE)
                            / CAST(n_pairs AS DOUBLE)),
                 {round_to}) AS p_star,
           ROUND((CAST(hits AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  - ((CAST(ups_a AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                     * (CAST(ups_f AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                     + (1.0 - CAST(ups_a AS DOUBLE)
                              / CAST(n_pairs AS DOUBLE))
                       * (1.0 - CAST(ups_f AS DOUBLE)
                                / CAST(n_pairs AS DOUBLE))))
                 / SQRT(((CAST(ups_a AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                         * (CAST(ups_f AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                         + (1.0 - CAST(ups_a AS DOUBLE)
                                  / CAST(n_pairs AS DOUBLE))
                           * (1.0 - CAST(ups_f AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE)))
                        * (1.0 - ((CAST(ups_a AS DOUBLE)
                                   / CAST(n_pairs AS DOUBLE))
                                  * (CAST(ups_f AS DOUBLE)
                                     / CAST(n_pairs AS DOUBLE))
                                  + (1.0 - CAST(ups_a AS DOUBLE)
                                           / CAST(n_pairs AS DOUBLE))
                                    * (1.0 - CAST(ups_f AS DOUBLE)
                                             / CAST(n_pairs AS DOUBLE))))
                        / CAST(n_pairs AS DOUBLE)
                        - ((2.0 * CAST(ups_f AS DOUBLE)
                                  / CAST(n_pairs AS DOUBLE) - 1.0)
                           * (2.0 * CAST(ups_f AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE) - 1.0)
                           * (CAST(ups_a AS DOUBLE)
                              / CAST(n_pairs AS DOUBLE))
                           * (1.0 - CAST(ups_a AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE))
                           / CAST(n_pairs AS DOUBLE)
                           + (2.0 * CAST(ups_a AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE) - 1.0)
                             * (2.0 * CAST(ups_a AS DOUBLE)
                                      / CAST(n_pairs AS DOUBLE) - 1.0)
                             * (CAST(ups_f AS DOUBLE)
                                / CAST(n_pairs AS DOUBLE))
                             * (1.0 - CAST(ups_f AS DOUBLE)
                                      / CAST(n_pairs AS DOUBLE))
                             / CAST(n_pairs AS DOUBLE)
                           + 4.0 * (CAST(ups_a AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE))
                                 * (CAST(ups_f AS DOUBLE)
                                    / CAST(n_pairs AS DOUBLE))
                                 * (1.0 - CAST(ups_a AS DOUBLE)
                                          / CAST(n_pairs AS DOUBLE))
                                 * (1.0 - CAST(ups_f AS DOUBLE)
                                          / CAST(n_pairs AS DOUBLE))
                                 / (CAST(n_pairs AS DOUBLE)
                                    * CAST(n_pairs AS DOUBLE)))),
                 {round_to}) AS pt_stat
    FROM g
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 122: Huber M-estimator trend (IRLS, fixed unrolled iterations)
# ──────────────────────────────────────────────────────────────────────────


def huber_trend(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    k: float = 1.345,
    iters: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Huber M-estimator fit of the daily trend ``y = a + b·t`` —
    the missing member of the robust-trend family (theil_sen: rank;
    ransac: consensus; siegel: repeated medians; this: M-estimation,
    the textbook compromise keeping OLS efficiency on clean data while
    bounding any single day's influence at ``k`` scale units).

    IRLS with a FIXED, UNROLLED iteration count (deterministic — no
    data-dependent convergence test): OLS init from exact-integer /
    ordered moments, then per iteration (1) robust scale = 1.4826 x
    MAD of residuals (exact interpolated medians, identical in both
    engines), (2) Huber weights w = min(1, k*s/|r|), (3) weighted
    closed-form refit. Each iteration is two O(days) aggregates + a
    scalar broadcast — no per-candidate rescans.

    Weighted sums run in double (weights are intrinsically double);
    every ROUND target is slope/intercept/scale-magnitude (O(1e4) at
    sf0.1), far inside double resolution at 6 dp — the wave-118
    magnitude rule, checked by tools/audit_rounding.py.

    Output (one row): (n_days, slope_ols, slope_huber,
    intercept_huber, scale_mad, n_downweighted).
    """
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("double")
        .alias("__t"),
    ).localCheckpoint(eager=False)

    def _wols(df, w):
        sw = F.sum(w)
        st = F.sum(w * F.col("__t"))
        st2 = F.sum(w * F.col("__t") * F.col("__t"))
        sy = F.sum(w * F.col("__y"))
        sty = F.sum(w * F.col("__t") * F.col("__y"))
        agg = df.agg(
            sw.alias("sw"), st.alias("st"), st2.alias("st2"),
            sy.alias("sy"), sty.alias("sty"),
        )
        det = F.col("sw") * F.col("st2") - F.col("st") * F.col("st")
        b = (F.col("sw") * F.col("sty") - F.col("st") * F.col("sy")) / det
        a = (F.col("st2") * F.col("sy") - F.col("st") * F.col("sty")) / det
        return agg.select(b.alias("b"), a.alias("a"))

    fit = _wols(pts, F.lit(1.0))
    slope_ols = None
    n_down = None
    scale = None
    for it in range(iters):
        # cut lineage at every scalar hand-off: each broadcast of `fit`
        # (and of med/sc below) otherwise re-executes the ENTIRE prior
        # IRLS chain — the plan grows ~4x per iteration and the 3-round
        # fit re-runs dozens of redundant tiny aggregates (measured as
        # the dominant cost of this spec at sf0.1; the checkpointed
        # 1-row RDD is exact, so results are bit-identical)
        fit = fit.localCheckpoint(eager=True)
        with_r = pts.crossJoin(F.broadcast(fit)).withColumn(
            "__r", F.col("__y") - F.col("a") - F.col("b") * F.col("__t")
        )
        med = with_r.agg(F.percentile("__r", 0.5).alias("med"))
        with_ar = with_r.crossJoin(F.broadcast(med)).withColumn(
            "__ar", F.abs(F.col("__r") - F.col("med"))
        )
        sc = with_ar.agg(
            (F.percentile("__ar", 0.5) * 1.4826).alias("s")
        )
        weighted = with_ar.crossJoin(F.broadcast(sc)).withColumn(
            "__w",
            # zero residual -> full weight (guards ANSI div-by-zero on
            # exactly-fit days; also the correct Huber limit)
            F.when(
                F.abs(F.col("__r")) > 0.0,
                F.least(
                    F.lit(1.0), F.lit(k) * F.col("s") / F.abs(F.col("__r"))
                ),
            ).otherwise(F.lit(1.0)),
        )
        if it == 0:
            slope_ols = fit.select(F.col("b").alias("slope_ols"))
        if it == iters - 1:
            n_down = weighted.agg(
                F.sum((F.col("__w") < 1.0).cast("bigint")).alias(
                    "n_downweighted"
                ),
                F.count(F.lit(1)).cast("bigint").alias("n_days"),
            )
            scale = sc.select(F.col("s").alias("scale_mad"))
        fit = _wols(weighted, F.col("__w"))
    return (
        n_down.crossJoin(F.broadcast(slope_ols))
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(scale))
        .select(
            "n_days",
            F.round("slope_ols", round_to).alias("slope_ols"),
            F.round("b", round_to).alias("slope_huber"),
            F.round("a", round_to).alias("intercept_huber"),
            F.round("scale_mad", round_to).alias("scale_mad"),
            "n_downweighted",
        )
    )


def huber_trend_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    k: float = 1.345,
    iters: int = 3,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`huber_trend` (iterations unrolled as
    chained CTEs; quantile_cont matches Spark's interpolated
    percentile)."""

    def _wols(src, w):
        return f"""(
      SELECT (SUM({w}) * SUM({w} * t * y) - SUM({w} * t) * SUM({w} * y))
               / (SUM({w}) * SUM({w} * t * t) - SUM({w} * t) * SUM({w} * t))
               AS b,
             (SUM({w} * t * t) * SUM({w} * y) - SUM({w} * t) * SUM({w} * t * y))
               / (SUM({w}) * SUM({w} * t * t) - SUM({w} * t) * SUM({w} * t))
               AS a
      FROM {src})"""

    ctes = [
        f"""pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS DOUBLE) AS t
      FROM d
    )""",
        f"fit0 AS {_wols('pts', '1.0')}",
    ]
    prev = "fit0"
    for i in range(iters):
        ctes.append(
            f"""r{i} AS (
      SELECT pts.*, y - a - b * t AS r FROM pts CROSS JOIN {prev}
    )"""
        )
        ctes.append(
            f"""s{i} AS (
      SELECT quantile_cont(abs(r - med), 0.5) * 1.4826 AS s
      FROM r{i} CROSS JOIN
           (SELECT quantile_cont(r, 0.5) AS med FROM r{i}) m
    )"""
        )
        ctes.append(
            f"""w{i} AS (
      SELECT r{i}.*,
             CASE WHEN abs(r) > 0.0
                  THEN LEAST(1.0, {k} * s / abs(r))
                  ELSE 1.0 END AS w
      FROM r{i} CROSS JOIN s{i}
    )"""
        )
        ctes.append(f"fit{i + 1} AS {_wols(f'w{i}', 'w')}")
        prev = f"fit{i + 1}"
    last = iters - 1
    return f"""
    WITH d AS ({daily_sql}),
    {','.join(ctes)}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_days,
           ROUND((SELECT b FROM fit0), {round_to}) AS slope_ols,
           ROUND(f.b, {round_to}) AS slope_huber,
           ROUND(f.a, {round_to}) AS intercept_huber,
           ROUND((SELECT s FROM s{last}), {round_to}) AS scale_mad,
           (SELECT CAST(SUM(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM w{last}) AS n_downweighted
    FROM fit{iters} f
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 126: split conformal prediction interval for the daily trend
# ──────────────────────────────────────────────────────────────────────────


def conformal_trend_interval(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    alpha: float = 0.1,
    round_to: int = 6,
) -> DataFrame:
    """Split conformal prediction interval (Vovk; Lei et al. JASA
    2018) around the linear daily trend — DISTRIBUTION-FREE uncertainty
    with a finite-sample marginal coverage guarantee >= 1-alpha, the
    modern replacement for normal-theory prediction bands when nothing
    is Gaussian.

    Protocol: chronological thirds-ish split — FIT on days 1..n/2
    (closed-form OLS), CALIBRATE on n/2+1..3n/4 (conformal score
    |y - yhat|; q_hat = the ceil((1-alpha)(n_cal+1))-th order
    statistic, the exact finite-sample-valid quantile — an ORDER
    STATISTIC, not an interpolated percentile, so selection is
    deterministic), TEST on the rest (empirical coverage of
    yhat ± q_hat — an integer count).

    Determinism: fit moments accumulate as exact DECIMAL (wave-118
    discipline); the order-statistic selection and integer coverage
    count involve no unordered double sums. ROUND targets are y-scale
    (q_hat) or O(1) (coverage) — inside double resolution.

    Output (one row): (n_fit, n_cal, n_test, slope, q_hat,
    coverage_test).
    """
    yd = F.col(value_col).cast("decimal(18,2)")
    idx = daily.select(
        yd.alias("__y"),
        F.row_number().over(Window.orderBy(date_col)).alias("__t"),
    ).localCheckpoint(eager=False)
    n_row = idx.agg(F.max("__t").alias("__n"))
    td = F.col("__t").cast("decimal(10,0)")
    fit = (
        idx.crossJoin(F.broadcast(n_row))
        .filter(F.col("__t") * 2 <= F.col("__n"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nf"),
            F.sum("__t").cast("bigint").alias("st"),
            F.sum(F.col("__t") * F.col("__t")).cast("bigint").alias("st2"),
            F.sum("__y").alias("sy"),
            F.sum(td * F.col("__y")).alias("sty"),
        )
    )
    nn = F.col("nf").cast("double")
    st = F.col("st").cast("double")
    sxx = F.col("st2").cast("double") - st * st / nn
    sxy = F.col("sty").cast("double") - st * F.col("sy").cast("double") / nn
    ab = fit.select(
        "nf",
        (sxy / sxx).alias("b"),
        (
            (F.col("sy").cast("double") - (sxy / sxx) * st) / nn
        ).alias("a"),
    )
    scored = idx.crossJoin(F.broadcast(n_row)).crossJoin(F.broadcast(ab)).select(
        "__t",
        "__n",
        "nf",
        F.abs(
            F.col("__y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("__t").cast("double")
        ).alias("__score"),
    )
    cal = scored.filter(
        (F.col("__t") * 2 > F.col("__n")) & (F.col("__t") * 4 <= F.col("__n") * 3)
    )
    n_cal = cal.agg(F.count(F.lit(1)).cast("bigint").alias("nc"))
    # k-th order statistic, k = ceil((1-alpha)(n_cal+1)) clamped to n_cal
    ranked = cal.crossJoin(F.broadcast(n_cal)).withColumn(
        "__rk",
        F.row_number().over(Window.orderBy(F.col("__score").asc(), F.col("__t").asc())),
    )
    k = F.least(
        F.ceil(F.lit(1.0 - alpha) * (F.col("nc") + 1).cast("double")).cast(
            "bigint"
        ),
        F.col("nc"),
    )
    q_row = ranked.filter(F.col("__rk") == k).select(
        F.col("__score").alias("qh"), F.col("nc")
    )
    test = scored.filter(F.col("__t") * 4 > F.col("__n") * 3)
    cov = test.crossJoin(F.broadcast(q_row)).agg(
        F.max("nf").alias("n_fit"),
        F.max("nc").alias("n_cal"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.max("qh").alias("qh"),
        F.sum((F.col("__score") <= F.col("qh")).cast("bigint"))
        .cast("bigint")
        .alias("covered"),
    )
    return cov.crossJoin(F.broadcast(ab.select(F.col("b").alias("slope")))).select(
        "n_fit",
        "n_cal",
        "n_test",
        F.round("slope", round_to).alias("slope"),
        F.round("qh", round_to).alias("q_hat"),
        F.round(
            F.col("covered").cast("double") / F.col("n_test").cast("double"),
            round_to,
        ).alias("coverage_test"),
    )


def conformal_trend_interval_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    alpha: float = 0.1,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`conformal_trend_interval`."""
    return f"""
    WITH d AS ({daily_sql}),
    idx AS (
      SELECT CAST({value_col} AS DECIMAL(18,2)) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    n_row AS (SELECT MAX(t) AS n FROM idx),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nf,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS st2,
             CAST(SUM(y) AS DECIMAL(28,2)) AS sy,
             CAST(SUM(CAST(t AS DECIMAL(10,0)) * y) AS DECIMAL(32,2)) AS sty
      FROM idx CROSS JOIN n_row WHERE t * 2 <= n
    ),
    ab AS (
      SELECT nf,
             (CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(nf AS DOUBLE))
             / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                / CAST(nf AS DOUBLE)) AS b,
             (CAST(sy AS DOUBLE)
              - ((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(nf AS DOUBLE))
                 / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                    / CAST(nf AS DOUBLE))) * CAST(st AS DOUBLE))
             / CAST(nf AS DOUBLE) AS a
      FROM fit
    ),
    scored AS (
      SELECT t, n, nf,
             abs(CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE)) AS score
      FROM idx CROSS JOIN n_row CROSS JOIN ab
    ),
    cal AS (SELECT * FROM scored WHERE t * 2 > n AND t * 4 <= n * 3),
    n_cal AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM cal),
    ranked AS (
      SELECT cal.*, nc,
             ROW_NUMBER() OVER (ORDER BY score ASC, t ASC) AS rk
      FROM cal CROSS JOIN n_cal
    ),
    q_row AS (
      SELECT score AS qh, nc FROM ranked
      WHERE rk = LEAST(CAST(ceil({1.0 - alpha} * (nc + 1)) AS BIGINT), nc)
    ),
    test AS (SELECT * FROM scored WHERE t * 4 > n * 3)
    SELECT MAX(t.nf) AS n_fit,
           MAX(q.nc) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(MAX(ab.b), {round_to}) AS slope,
           ROUND(MAX(q.qh), {round_to}) AS q_hat,
           ROUND(CAST(SUM(CASE WHEN t.score <= q.qh THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), {round_to}) AS coverage_test
    FROM test t CROSS JOIN q_row q CROSS JOIN ab
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 159: Phillips-Perron unit-root test
# ──────────────────────────────────────────────────────────────────────────


def phillips_perron(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Phillips-Perron Z_tau unit-root test (constant, no trend) —
    the THIRD corner of the stationarity triangle beside
    :func:`adf_unit_root` (same null, parametric lag augmentation)
    and :func:`kpss_level_test` (reversed null): PP keeps ADF's
    lag-0 regression but corrects the t-statistic
    NON-parametrically for serial correlation through the Newey-West
    long-run variance of the residuals (Hamilton 1994, eq. 17.6.12,
    case 2):

      Δy_t = α + ρ·y_{t−1} + u_t  (OLS, t_ρ, s² = SSE/(T−2));
      γ̂_j = (1/T) Σ u_t u_{t−j};
      λ̂² = γ̂_0 + 2 Σ_{j≤q} (1 − j/(q+1)) γ̂_j,
      q = min(16, ⌊4(T/100)^{1/4}⌋);
      Z_τ = sqrt(γ̂_0/λ̂²)·t_ρ − (λ̂²−γ̂_0)·T·se(ρ̂) / (2·λ̂·s).

    Same static-plan bandwidth trick as KPSS: all 16 residual lag
    products are computed and the Bartlett weight
    ``greatest(0, 1−j/(q+1))`` zeroes the truncated ones (lags past
    T−1 coalesce to 0). Three passes over the DAYS-sized rollup: the
    OLS moment aggregate, a 1-row broadcast of (α, ρ), then the
    residual lag-product aggregate — closed forms with identical
    expression shapes in the twin.

    Output (one row): (n_obs, q_lag, rho, pp_ztau).
    """
    w = Window.orderBy("__d")
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__x"),
    )
    lagged = (
        pts.withColumn("__xl", F.lag("__x", 1).over(w))
        .filter(F.col("__xl").isNotNull())
        .select(
            "__d",
            (F.col("__x") - F.col("__xl")).alias("__y"),
            F.col("__xl").alias("__z"),
        )
    )
    mom = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("__z").alias("sz"),
        F.sum(F.col("__z") * F.col("__z")).alias("sz2"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).alias("sy2"),
        F.sum(F.col("__z") * F.col("__y")).alias("szy"),
    )
    mm = F.col("m").cast("double")
    szz = F.col("sz2") - F.col("sz") * F.col("sz") / mm
    szy_c = F.col("szy") - F.col("sz") * F.col("sy") / mm
    syy = F.col("sy2") - F.col("sy") * F.col("sy") / mm
    fit = mom.select(
        "m",
        (szy_c / szz).alias("b"),
        (F.col("sy") / mm - (szy_c / szz) * (F.col("sz") / mm)).alias(
            "a"
        ),
        szz.alias("szz"),
        (syy - (szy_c / szz) * szy_c).alias("sse"),
    )
    resid = lagged.crossJoin(F.broadcast(fit)).select(
        "__d",
        "m",
        "szz",
        "sse",
        "b",
        (
            F.col("__y") - F.col("a") - F.col("b") * F.col("__z")
        ).alias("__u"),
    )
    wl = Window.orderBy("__d")
    lags = resid.select(
        "m",
        "szz",
        "sse",
        "b",
        "__u",
        *[
            F.lag("__u", j).over(wl).alias(f"__ul{j}")
            for j in range(1, _KPSS_MAX_LAG + 1)
        ],
    )
    agg = lags.agg(
        F.max("m").alias("m"),
        F.max("szz").alias("szz"),
        F.max("sse").alias("sse"),
        F.max("b").alias("b"),
        F.sum(F.col("__u") * F.col("__u")).alias("g0s"),
        *[
            F.sum(F.col("__u") * F.col(f"__ul{j}")).alias(f"g{j}s")
            for j in range(1, _KPSS_MAX_LAG + 1)
        ],
    )
    tt = F.col("m").cast("double")
    q = F.least(
        F.lit(_KPSS_MAX_LAG).cast("double"),
        F.floor(4.0 * F.pow(tt / 100.0, 0.25)).cast("double"),
    )
    g0 = F.col("g0s") / tt
    lam2 = g0
    for j in range(1, _KPSS_MAX_LAG + 1):
        wj = F.greatest(F.lit(0.0), 1.0 - F.lit(float(j)) / (q + 1.0))
        lam2 = lam2 + 2.0 * wj * (
            F.coalesce(F.col(f"g{j}s"), F.lit(0.0)) / tt
        )
    s2 = F.col("sse") / (tt - 2.0)
    se_rho = F.sqrt(s2 / F.col("szz"))
    t_rho = F.col("b") / se_rho
    ztau = F.sqrt(g0 / lam2) * t_rho - (lam2 - g0) * tt * se_rho / (
        2.0 * F.sqrt(lam2) * F.sqrt(s2)
    )
    return agg.select(
        F.col("m").alias("n_obs"),
        q.cast("bigint").alias("q_lag"),
        F.round(F.col("b"), round_to).alias("rho"),
        F.round(ztau, round_to).alias("pp_ztau"),
    )


def phillips_perron_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`phillips_perron` (same OLS shapes, same
    static 16-lag Bartlett correction)."""
    mx = _KPSS_MAX_LAG
    lag_cols = ",\n             ".join(
        f"LAG(u, {j}) OVER (ORDER BY dd) AS ul{j}" for j in range(1, mx + 1)
    )
    g_cols = ",\n             ".join(
        f"SUM(u * ul{j}) AS g{j}s" for j in range(1, mx + 1)
    )
    lam_terms = "\n                 ".join(
        f"+ 2.0 * GREATEST(0.0, 1.0 - {float(j)!r} / (q + 1.0))"
        f" * (COALESCE(g{j}s, 0.0) / CAST(m AS DOUBLE))"
        for j in range(1, mx + 1)
    )
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT {date_col} AS dd, CAST({value_col} AS DOUBLE) AS x FROM d
    ),
    lagged AS (
      SELECT dd, x - xl AS y, xl AS z
      FROM (SELECT dd, x, LAG(x, 1) OVER (ORDER BY dd) AS xl FROM pts)
      WHERE xl IS NOT NULL
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(z) AS sz, SUM(z * z) AS sz2,
             SUM(y) AS sy, SUM(y * y) AS sy2,
             SUM(z * y) AS szy
      FROM lagged
    ),
    fit AS (
      SELECT m,
             (szy - sz * sy / CAST(m AS DOUBLE))
               / (sz2 - sz * sz / CAST(m AS DOUBLE)) AS b,
             sy / CAST(m AS DOUBLE)
               - ((szy - sz * sy / CAST(m AS DOUBLE))
                  / (sz2 - sz * sz / CAST(m AS DOUBLE)))
                 * (sz / CAST(m AS DOUBLE)) AS a,
             sz2 - sz * sz / CAST(m AS DOUBLE) AS szz,
             (sy2 - sy * sy / CAST(m AS DOUBLE))
               - ((szy - sz * sy / CAST(m AS DOUBLE))
                  / (sz2 - sz * sz / CAST(m AS DOUBLE)))
                 * (szy - sz * sy / CAST(m AS DOUBLE)) AS sse
      FROM mom
    ),
    resid AS (
      SELECT l.dd, f.m, f.szz, f.sse, f.b,
             l.y - f.a - f.b * l.z AS u
      FROM lagged l CROSS JOIN fit f
    ),
    lags AS (
      SELECT m, szz, sse, b, u,
             {lag_cols}
      FROM resid
    ),
    agg AS (
      SELECT MAX(m) AS m, MAX(szz) AS szz, MAX(sse) AS sse,
             MAX(b) AS b,
             SUM(u * u) AS g0s,
             {g_cols}
      FROM lags
    ),
    qq AS (
      SELECT *,
             LEAST(CAST({mx} AS DOUBLE),
                   FLOOR(4.0 * POW(CAST(m AS DOUBLE) / 100.0, 0.25)))
               AS q
      FROM agg
    ),
    lam AS (
      SELECT *,
             g0s / CAST(m AS DOUBLE) AS g0,
             g0s / CAST(m AS DOUBLE)
                 {lam_terms} AS lam2
      FROM qq
    )
    SELECT m AS n_obs,
           CAST(q AS BIGINT) AS q_lag,
           ROUND(b, {round_to}) AS rho,
           ROUND(SQRT(g0 / lam2)
                 * (b / SQRT((sse / (CAST(m AS DOUBLE) - 2.0)) / szz))
                 - (lam2 - g0) * CAST(m AS DOUBLE)
                   * SQRT((sse / (CAST(m AS DOUBLE) - 2.0)) / szz)
                   / (2.0 * SQRT(lam2)
                      * SQRT(sse / (CAST(m AS DOUBLE) - 2.0))),
                 {round_to}) AS pp_ztau
    FROM lam
    """

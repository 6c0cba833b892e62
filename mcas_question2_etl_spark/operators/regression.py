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

"""Kaplan-Meier survival estimation over user lifetimes.

The product-limit estimator (Kaplan & Meier 1958) is the standard
right-censored retention curve: users whose last activity is recent
have not "churned" yet — treating them as churned biases every naive
retention metric downward. Lifetimes are measured in calendar days
between a user's first and last event; a user is an observed churn
only if their last event predates the corpus horizon by more than
``censor_days`` (otherwise the lifetime is censored at its current
length).

Determinism discipline: lifetimes are integer ``datediff`` days and
the at-risk/death counts are exact integer aggregates, so every
(t, n_risk, n_events) triple is engine-exact. The survival curve
multiplies (1 - d/n) factors; that cumulative product is computed as
``exp(sum(ln ...))`` over the TINY distinct-lifetime table (bounded by
the observation span in days, a few hundred rows) — the only
float-ordering freedom is a window over that table, identical in both
engines, and the 9-significant-digit compare absorbs libm ulp. The
degenerate last step d == n gives ln(0) = -inf and exp(-inf) = 0.0 in
both engines — survival correctly hits zero, no NaN.

Scale shape: one groupBy shuffle on the user key reduces the corpus
to one row per user; everything after (distinct-lifetime counts, the
risk-set suffix sum, the log-survival prefix sum) operates on the
days-spanned-sized table, where single-task windows are free. The
global horizon is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """(t_days, n_risk, n_events, survival) at each observed-churn
    lifetime t, survival = S(t) = prod_{t_i <= t} (1 - d_i / n_i)."""
    per_user = df.groupBy(user_col).agg(
        F.min(F.col(ts_col).cast("date")).alias("__fd"),
        F.max(F.col(ts_col).cast("date")).alias("__ld"),
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("date")).alias("__hz"))
    lifetimes = (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("__ld", "__fd").cast("bigint").alias("t_days"),
            (F.col("__ld") <= F.date_sub(F.col("__hz"), censor_days))
            .cast("int")
            .alias("__obs"),
        )
    )
    counts = lifetimes.groupBy("t_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_all"),
        F.sum("__obs").cast("bigint").alias("n_events"),
    )
    # suffix sum over the distinct-lifetime table: users at risk at t =
    # everyone whose lifetime reached t (still small-table, ordered desc)
    w_risk = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_surv = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.withColumn("n_risk", F.sum("__n_all").over(w_risk))
        .filter(F.col("n_events") > 0)
        .withColumn(
            "survival",
            F.exp(
                F.sum(
                    F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk"))
                ).over(w_surv)
            ),
        )
        .select("t_days", "n_risk", "n_events", "survival")
    )


def kaplan_meier_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> str:
    """DuckDB twin of :func:`kaplan_meier`."""
    return f"""
    WITH pu AS (
      SELECT {user_col},
             MIN(CAST({ts_col} AS DATE)) AS fd,
             MAX(CAST({ts_col} AS DATE)) AS ld
      FROM {table} GROUP BY {user_col}
    ),
    hz AS (SELECT MAX(CAST({ts_col} AS DATE)) AS hz FROM {table}),
    lt AS (
      SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t_days,
             CASE WHEN ld <= hz - INTERVAL {censor_days} DAY
                  THEN 1 ELSE 0 END AS obs
      FROM pu, hz
    ),
    c AS (
      SELECT t_days, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(obs) AS BIGINT) AS n_events
      FROM lt GROUP BY t_days
    ),
    r AS (
      SELECT t_days, n_events,
             CAST(SUM(n_all) OVER (
               ORDER BY t_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_risk
      FROM c
    )
    SELECT t_days, n_risk, n_events,
           exp(SUM(ln(1.0 - n_events / CAST(n_risk AS DOUBLE))) OVER (
             ORDER BY t_days
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS survival
    FROM r WHERE n_events > 0
    """


def logrank_test(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    n_arms: int = 2,
    round_to: int = 9,
) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the retention curves of an
    md5 two-arm split of users — "is arm A churning faster than arm
    B" with censoring handled correctly, the inferential companion
    to :func:`kaplan_meier` (which only draws the curves).

    Same lifetime construction as kaplan_meier (integer-day
    first-to-last spans, horizon-censored). At every observed-churn
    time t: O1 = arm-1 deaths, E1 = n1*d/n, V = n1*n2*d*(n-d) /
    (n^2*(n-1)) — each term exact-integer-input IEEE; the sums over
    the distinct-lifetime table are ROUNDed (default 9dp), then
    chi2 = (O1-E1)^2 / V with a 1-df 5%% flag.

    Output: one row (n_a, n_b, observed_a, expected_a, variance,
    chi2, significant).
    """
    from .sampling import hash_bucket

    per_user = df.groupBy(user_col).agg(
        F.min(F.col(ts_col).cast("date")).alias("__fd"),
        F.max(F.col(ts_col).cast("date")).alias("__ld"),
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("date")).alias("__hz"))
    lifetimes = (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("__ld", "__fd").cast("bigint").alias("t"),
            (F.col("__ld") <= F.date_sub(F.col("__hz"), censor_days))
            .cast("int")
            .alias("obs"),
            (hash_bucket(user_col, n_arms) == 0).cast("int").alias("a"),
        )
    )
    counts = lifetimes.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_all"),
        F.sum("a").cast("bigint").alias("m_a"),
        F.sum(F.col("obs")).cast("bigint").alias("d"),
        F.sum(F.col("obs") * F.col("a")).cast("bigint").alias("d_a"),
    )
    # risk sets: users with lifetime >= t (suffix sums over the tiny
    # distinct-lifetime table)
    w = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risk = counts.select(
        "t",
        "d",
        "d_a",
        F.sum("m_all").over(w).cast("bigint").alias("n"),
        F.sum("m_a").over(w).cast("bigint").alias("n_a"),
    ).where(F.col("d") > 0)
    nd = F.col("n").cast("double")
    e1 = F.col("n_a").cast("double") * F.col("d") / nd
    v = F.when(
        F.col("n") > 1,
        F.col("n_a").cast("double")
        * (F.col("n") - F.col("n_a"))
        * F.col("d")
        * (F.col("n") - F.col("d"))
        / (nd * nd * (nd - 1)),
    ).otherwise(F.lit(0.0))
    sums = risk.agg(
        F.sum("d_a").cast("bigint").alias("observed_a"),
        F.round(F.sum(e1), round_to).alias("expected_a"),
        F.round(F.sum(v), round_to).alias("variance"),
    )
    arms = lifetimes.agg(
        F.sum("a").cast("bigint").alias("n_arm_a"),
        F.sum(1 - F.col("a")).cast("bigint").alias("n_arm_b"),
    )
    dev = F.col("observed_a").cast("double") - F.col("expected_a")
    chi2 = F.when(
        F.col("variance") > 0, dev * dev / F.col("variance")
    ).otherwise(F.lit(0.0))
    return sums.crossJoin(F.broadcast(arms)).select(
        F.col("n_arm_a").alias("n_a"),
        F.col("n_arm_b").alias("n_b"),
        "observed_a",
        "expected_a",
        "variance",
        chi2.alias("chi2"),
        (chi2 > 3.841).alias("significant"),
    )


def logrank_test_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    n_arms: int = 2,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`logrank_test`."""
    from .sampling import hash_bucket_sql

    hb = hash_bucket_sql(user_col, n_arms)
    return f"""
    WITH per_user AS (
      SELECT {user_col},
             MIN(CAST({ts_col} AS DATE)) AS fd,
             MAX(CAST({ts_col} AS DATE)) AS ld
      FROM {table} GROUP BY {user_col}
    ),
    horizon AS (SELECT MAX(CAST({ts_col} AS DATE)) AS hz FROM {table}),
    lifetimes AS (
      SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t,
             CASE WHEN ld <= hz - INTERVAL {censor_days} DAY
                  THEN 1 ELSE 0 END AS obs,
             CASE WHEN ({hb}) = 0 THEN 1 ELSE 0 END AS a
      FROM per_user CROSS JOIN horizon
    ),
    counts AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS m_all,
             CAST(SUM(a) AS BIGINT) AS m_a,
             CAST(SUM(obs) AS BIGINT) AS d,
             CAST(SUM(obs * a) AS BIGINT) AS d_a
      FROM lifetimes GROUP BY t
    ),
    risk AS (
      SELECT t, d, d_a,
             CAST(SUM(m_all) OVER (ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n,
             CAST(SUM(m_a) OVER (ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n_a
      FROM counts
    ),
    terms AS (
      SELECT d_a,
             CAST(n_a AS DOUBLE) * d / CAST(n AS DOUBLE) AS e1,
             CASE WHEN n > 1
                  THEN CAST(n_a AS DOUBLE) * (n - n_a) * d * (n - d)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) - 1))
                  ELSE 0.0 END AS v
      FROM risk WHERE d > 0
    ),
    sums AS (
      SELECT CAST(SUM(d_a) AS BIGINT) AS observed_a,
             ROUND(SUM(e1), {round_to}) AS expected_a,
             ROUND(SUM(v), {round_to}) AS variance
      FROM terms
    ),
    arms AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n_arm_a,
             CAST(SUM(1 - a) AS BIGINT) AS n_arm_b
      FROM lifetimes
    )
    SELECT arms.n_arm_a AS n_a, arms.n_arm_b AS n_b,
           sums.observed_a, sums.expected_a, sums.variance,
           CASE WHEN sums.variance > 0
                THEN (CAST(sums.observed_a AS DOUBLE) - sums.expected_a)
                     * (CAST(sums.observed_a AS DOUBLE) - sums.expected_a)
                     / sums.variance
                ELSE 0.0 END AS chi2,
           CASE WHEN sums.variance > 0
                THEN (CAST(sums.observed_a AS DOUBLE) - sums.expected_a)
                     * (CAST(sums.observed_a AS DOUBLE) - sums.expected_a)
                     / sums.variance
                ELSE 0.0 END > 3.841 AS significant
    FROM sums CROSS JOIN arms
    """


def weibull_lifetime_fit(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Weibull fit of the user-lifetime distribution via the classic
    probability-plot regression: ln(-ln S(t)) is linear in ln t under
    a Weibull, so an OLS on the Kaplan-Meier curve's (ln t,
    ln(-ln S)) points yields shape k (slope) and scale lambda
    (exp(-intercept/k)) — the one-line parametric summary of churn
    (k < 1 infant-mortality, k ~ 1 memoryless, k > 1 wear-out) on top
    of the non-parametric curve.

    Determinism: the KM machinery matches :func:`kaplan_meier`
    (exact risk sets; survival via exp-sum-ln over the tiny lifetime
    table) with survival ROUNDED 9dp before the log-log transform
    (ulp drift amplifies near S ~ 1); the OLS moment sums over the
    <= span-in-days points are rounded too. Points need t > 0 and
    0 < S < 1. Output: one row (n_points, shape, scale).
    """
    per_user = df.groupBy(user_col).agg(
        F.min(F.col(ts_col).cast("date")).alias("__fd"),
        F.max(F.col(ts_col).cast("date")).alias("__ld"),
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("date")).alias("__hz"))
    lifetimes = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("__ld", "__fd").cast("bigint").alias("t"),
        (F.col("__ld") <= F.date_sub(F.col("__hz"), censor_days))
        .cast("int")
        .alias("obs"),
    )
    counts = lifetimes.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("obs").cast("bigint").alias("d"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = counts.select(
        "t", "d", F.sum("m").over(w).cast("bigint").alias("n")
    )
    surv = risk.select(
        "t",
        "d",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        1 - F.col("d").cast("double") / F.col("n")
                    )
                ).over(wcum)
            ),
            9,
        ).alias("s"),
    )
    pts = surv.where(
        (F.col("t") > 0)
        & (F.col("s") > 0)
        & (F.col("s") < 1)
        & (F.col("d") > 0)
    ).select(
        F.log(F.col("t").cast("double")).alias("x"),
        F.log(-F.log(F.col("s"))).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.round(F.sum("x"), round_to).alias("sx"),
        F.round(F.sum("y"), round_to).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), round_to).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), round_to).alias("sxy"),
    )
    k = F.col("k").cast("double")
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / k
    return mom.select(
        F.col("k").alias("n_points"),
        F.round(slope, round_to).alias("shape"),
        F.round(F.exp(-intercept / slope), round_to).alias("scale"),
    )


def weibull_lifetime_fit_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`weibull_lifetime_fit`."""
    return f"""
    WITH per_user AS (
      SELECT {user_col},
             MIN(CAST({ts_col} AS DATE)) AS fd,
             MAX(CAST({ts_col} AS DATE)) AS ld
      FROM {table} GROUP BY {user_col}
    ),
    horizon AS (SELECT MAX(CAST({ts_col} AS DATE)) AS hz FROM {table}),
    lifetimes AS (
      SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t,
             CASE WHEN ld <= hz - INTERVAL {censor_days} DAY
                  THEN 1 ELSE 0 END AS obs
      FROM per_user CROSS JOIN horizon
    ),
    counts AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(obs) AS BIGINT) AS d
      FROM lifetimes GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(m) OVER (ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n
      FROM counts
    ),
    surv AS (
      SELECT t, d,
             ROUND(exp(SUM(ln(1 - CAST(d AS DOUBLE) / n)) OVER
                       (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)), 9) AS s
      FROM risk
    ),
    pts AS (
      SELECT ln(CAST(t AS DOUBLE)) AS x, ln(-ln(s)) AS y
      FROM surv WHERE t > 0 AND s > 0 AND s < 1 AND d > 0
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             ROUND(SUM(x), {round_to}) AS sx,
             ROUND(SUM(y), {round_to}) AS sy,
             ROUND(SUM(x * x), {round_to}) AS sxx,
             ROUND(SUM(x * y), {round_to}) AS sxy
      FROM pts
    )
    SELECT k AS n_points,
           ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
                 / (CAST(k AS DOUBLE) * sxx - sx * sx), {round_to}) AS shape,
           ROUND(exp(-(((sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                              / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
                        / CAST(k AS DOUBLE)))
                     / ((CAST(k AS DOUBLE) * sxy - sx * sy)
                        / (CAST(k AS DOUBLE) * sxx - sx * sx))),
                 {round_to}) AS scale
    FROM mom
    """


def nelson_aalen(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same
    right-censored lifetime construction as :func:`kaplan_meier`:
    ``H(t) = sum_{t_i <= t} d_i / n_i`` with the Fleming-Harrington
    survival ``S_FH(t) = exp(-H(t))`` — the estimator of choice when
    risk sets are small (no product-limit zero-collapse) and the
    standard input to Cox-model baselines.

    Same scale shape as KM: the corpus reduces once to per-user
    lifetimes, then every statistic lives on the tiny distinct-
    lifetime table (suffix-sum risk sets, ordered cumulative hazard).

    Output: (t_days, n_risk, n_events, cum_hazard, survival_fh) at
    each observed-event lifetime.
    """
    per_user = df.groupBy(user_col).agg(
        F.min(F.col(ts_col).cast("date")).alias("__fd"),
        F.max(F.col(ts_col).cast("date")).alias("__ld"),
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("date")).alias("__hz"))
    lifetimes = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("__ld", "__fd").cast("bigint").alias("t_days"),
        (F.col("__ld") <= F.date_sub(F.col("__hz"), censor_days))
        .cast("int")
        .alias("__obs"),
    )
    counts = lifetimes.groupBy("t_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_all"),
        F.sum("__obs").cast("bigint").alias("n_events"),
    )
    w_risk = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counts.withColumn("n_risk", F.sum("__n_all").over(w_risk))
        .filter(F.col("n_events") > 0)
        .withColumn(
            "cum_hazard",
            F.sum(
                F.col("n_events") / F.col("n_risk").cast("double")
            ).over(w_cum),
        )
        .select(
            "t_days",
            "n_risk",
            "n_events",
            F.round("cum_hazard", 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("cum_hazard")), 6).alias("survival_fh"),
        )
    )


def nelson_aalen_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> str:
    """DuckDB twin of :func:`nelson_aalen`."""
    return f"""
    WITH pu AS (
      SELECT {user_col},
             MIN(CAST({ts_col} AS DATE)) AS fd,
             MAX(CAST({ts_col} AS DATE)) AS ld
      FROM {table} GROUP BY {user_col}
    ),
    hz AS (SELECT MAX(CAST({ts_col} AS DATE)) AS hz FROM {table}),
    lt AS (
      SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t_days,
             CASE WHEN ld <= hz - INTERVAL {censor_days} DAY
                  THEN 1 ELSE 0 END AS obs
      FROM pu, hz
    ),
    c AS (
      SELECT t_days, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(obs) AS BIGINT) AS n_events
      FROM lt GROUP BY t_days
    ),
    r AS (
      SELECT t_days, n_events,
             CAST(SUM(n_all) OVER (
               ORDER BY t_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_risk
      FROM c
    ),
    h AS (
      SELECT t_days, n_risk, n_events,
             SUM(n_events / CAST(n_risk AS DOUBLE)) OVER (
               ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_hazard
      FROM r WHERE n_events > 0
    )
    SELECT t_days, n_risk, n_events,
           ROUND(cum_hazard, 6) AS cum_hazard,
           ROUND(exp(-cum_hazard), 6) AS survival_fh
    FROM h
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 93: restricted mean survival time (area under the KM curve)
# ──────────────────────────────────────────────────────────────────────────


def rmst(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    tau: int = 14,
    round_to: int = 6,
) -> DataFrame:
    """Restricted mean survival time to horizon ``tau``: the area under
    the Kaplan-Meier step curve, ``∫₀^τ Ŝ(t) dt`` — "expected retained
    days within the first τ", the single-number survival summary that
    stays defined under censoring where the plain mean does not
    (Royston & Parmar 2013).

    Step integration over the KM table (event times only): segment
    [t_{i-1}, t_i) contributes S(t_{i-1})·(t_i - t_{i-1}) with
    S(before first event) = 1, plus the tail S(t_last)·(τ - t_last).
    The KM table is days-sized, so the lag window is a bounded kernel.
    Output (one row): tau_days, n_event_times (≤ τ), rmst_days,
    survival_at_tau."""
    km = kaplan_meier(df, user_col, ts_col, censor_days).filter(
        F.col("t_days") <= tau
    )
    w = Window.orderBy("t_days")
    seg = km.select(
        "t_days",
        "survival",
        F.lag("t_days", 1, 0).over(w).alias("__pt"),
        F.lag("survival", 1, 1.0).over(w).alias("__ps"),
    )
    agg = seg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_event_times"),
        F.sum(
            F.col("__ps") * (F.col("t_days") - F.col("__pt")).cast("double")
        ).alias("__steps"),
        F.max(F.struct(F.col("t_days"), F.col("survival"))).alias("__last"),
    )
    tail = F.col("__last.survival") * (
        F.lit(float(tau)) - F.col("__last.t_days").cast("double")
    )
    rmst_val = F.when(
        F.col("n_event_times") > 0, F.col("__steps") + tail
    ).otherwise(F.lit(float(tau)))
    s_at_tau = F.coalesce(F.col("__last.survival"), F.lit(1.0))
    return agg.select(
        F.lit(tau).cast("bigint").alias("tau_days"),
        "n_event_times",
        F.round(rmst_val, round_to).alias("rmst_days"),
        F.round(s_at_tau, round_to).alias("survival_at_tau"),
    )


def rmst_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    tau: int = 14,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`rmst` (wraps the KM twin as a subquery)."""
    km = kaplan_meier_sql(table, user_col, ts_col, censor_days)
    return f"""
    WITH km AS (
      SELECT * FROM ({km}) AS km_inner WHERE t_days <= {tau}
    ),
    seg AS (
      SELECT t_days, survival,
             LAG(t_days, 1, 0) OVER (ORDER BY t_days) AS pt,
             LAG(survival, 1, 1.0) OVER (ORDER BY t_days) AS ps
      FROM km
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
             SUM(ps * CAST(t_days - pt AS DOUBLE)) AS steps,
             MAX(t_days) AS last_t,
             ARG_MAX(survival, t_days) AS last_s
      FROM seg
    )
    SELECT CAST({tau} AS BIGINT) AS tau_days,
           n_event_times,
           ROUND(CASE WHEN n_event_times > 0
                      THEN steps + last_s
                           * ({float(tau)!r} - CAST(last_t AS DOUBLE))
                      ELSE {float(tau)!r} END, {round_to}) AS rmst_days,
           ROUND(COALESCE(last_s, 1.0), {round_to}) AS survival_at_tau
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 112: Greenwood variance + log-log confidence bands
# ──────────────────────────────────────────────────────────────────────────

#: two-sided 95% normal quantile, as a literal (probability.py rule:
#: neither engine computes an inverse CDF in the hot path)
_Z95 = 1.959963984540054


def km_greenwood_ci(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier with Greenwood variance and the log(−log)
    95% confidence band — the uncertainty kaplan_meier_retention's
    point curve doesn't carry, in the transformed form every survival
    package defaults to because it respects the [0, 1] range (a plain
    ±z·se band crosses 1 near the origin):

      v̂(t) = Σ_{t_i ≤ t} d_i/(n_i(n_i−d_i))          (Greenwood)
      CI(t) = S(t)^exp(±z·√v̂ / ln S)                 (log-log)

    Same lifetimes/risk-set construction as kaplan_meier (suffix-sum
    over the distinct-lifetime rollup; prefix ln-sum for S); the
    band collapses to NULL once S hits 0 or stays at 1 (ln S = 0),
    the standard convention. Output per event time: (t_days, n_risk,
    n_events, survival, se_greenwood, ci_lo, ci_hi)."""
    km = kaplan_meier(df, user_col, ts_col, censor_days)
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_v = km.withColumn(
        "__v",
        F.sum(
            F.col("n_events").cast("double")
            / (
                F.col("n_risk").cast("double")
                * (F.col("n_risk") - F.col("n_events")).cast("double")
            )
        ).over(w_cum),
    )
    s = F.col("survival")
    se = s * F.sqrt(F.col("__v"))
    ok = (s > 0) & (s < 1)
    # ln S < 0, so the +z exponent SHRINKS theta below 1 and raises
    # S^theta above S: +z is the upper bound, -z the lower
    theta_up = F.exp(F.lit(_Z95) * F.sqrt(F.col("__v")) / F.log(s))
    theta_dn = F.exp(-F.lit(_Z95) * F.sqrt(F.col("__v")) / F.log(s))
    return with_v.select(
        "t_days",
        "n_risk",
        "n_events",
        F.round(s, round_to).alias("survival"),
        F.round(se, round_to).alias("se_greenwood"),
        F.round(
            F.when(ok, F.pow(s, theta_dn)).otherwise(
                F.lit(None).cast("double")
            ),
            round_to,
        ).alias("ci_lo"),
        F.round(
            F.when(ok, F.pow(s, theta_up)).otherwise(
                F.lit(None).cast("double")
            ),
            round_to,
        ).alias("ci_hi"),
    ).orderBy("t_days")


def km_greenwood_ci_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`km_greenwood_ci`."""
    km = kaplan_meier_sql(table, user_col, ts_col, censor_days)
    return f"""
    WITH km AS ({km}),
    with_v AS (
      SELECT t_days, n_risk, n_events, survival,
             SUM(CAST(n_events AS DOUBLE)
                 / (CAST(n_risk AS DOUBLE)
                    * CAST(n_risk - n_events AS DOUBLE)))
               OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS v
      FROM km
    )
    SELECT t_days, n_risk, n_events,
           ROUND(survival, {round_to}) AS survival,
           ROUND(survival * SQRT(v), {round_to}) AS se_greenwood,
           ROUND(CASE WHEN survival > 0 AND survival < 1
                      THEN POWER(survival,
                                 EXP(-{_Z95!r} * SQRT(v) / LN(survival)))
                      ELSE NULL END, {round_to}) AS ci_lo,
           ROUND(CASE WHEN survival > 0 AND survival < 1
                      THEN POWER(survival,
                                 EXP({_Z95!r} * SQRT(v) / LN(survival)))
                      ELSE NULL END, {round_to}) AS ci_hi
    FROM with_v ORDER BY t_days
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 167: Aalen-Johansen competing-risks cumulative incidence
# ──────────────────────────────────────────────────────────────────────────


def aalen_johansen_cif(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    cause_a: str = "purchase",
    cause_b: str = "error",
    round_to: int = 6,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under COMPETING risks —
    the estimator :func:`kaplan_meier` users reach for next and get
    wrong first: with two absorbing outcomes (first ``cause_a`` vs
    first ``cause_b`` after signup), "1 − KM of cause A with B
    censored" OVERSTATES A's incidence because it treats users
    claimed by B as still at risk. Aalen-Johansen partitions the
    hazard correctly:

      CIF_k(t) = Σ_{t_i ≤ t} S(t_i−) · d_{k,i} / n_i,
      S = Kaplan-Meier of the ANY-cause event;
      CIF_a + CIF_b + S = 1 at every t (the identity the wave test
      pins — the three curves tile probability).

    Per user: the clock starts at the first event, the outcome is
    whichever cause strikes first, censoring at the horizon. The
    lifetimes table rolls up to DISTINCT event times (bounded by the
    calendar), so the suffix-risk window, the lagged-KM exp/log
    cumulative product, and the CIF prefix sums all run over a tiny
    ordered table — the kaplan_meier scale shape exactly.

    Output per distinct event day: (t_days, n_risk, d_a, d_b,
    surv_any, cif_a, cif_b), ordered by t_days.
    """
    dd = F.col(ts_col).cast("date")
    per_user = df.groupBy(user_col).agg(
        F.min(dd).alias("__fd"),
        F.min(F.when(F.col("event_type") == cause_a, dd)).alias("__da"),
        F.min(F.when(F.col("event_type") == cause_b, dd)).alias("__db"),
    )
    ev_a = (F.col("__da").isNotNull()) & (
        F.col("__db").isNull() | (F.col("__da") <= F.col("__db"))
    )
    ev_b = (F.col("__db").isNotNull()) & ~ev_a
    lifetimes = per_user.select(
        F.when(ev_a, F.datediff(F.col("__da"), F.col("__fd")))
        .when(ev_b, F.datediff(F.col("__db"), F.col("__fd")))
        .cast("bigint")
        .alias("t_days"),
        ev_a.cast("int").alias("__a"),
        ev_b.cast("int").alias("__b"),
    ).fillna({"t_days": -1})
    # censored users (no competing event) carry t_days = -1 and enter
    # only the risk denominator (risk set = everyone, shrinking at
    # each event time from below never applies: censoring at horizon
    # means they remain at risk through every observed event time)
    counts = (
        lifetimes.filter(F.col("t_days") >= 0)
        .groupBy("t_days")
        .agg(
            F.sum("__a").cast("bigint").alias("d_a"),
            F.sum("__b").cast("bigint").alias("d_b"),
        )
    )
    n_cens = lifetimes.filter(F.col("t_days") < 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nc")
    )
    w_risk = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_ord = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the final event time can consume the WHOLE risk set (d = n):
    # ln(1-d/n) is ln(0) there — Spark nulls it, DuckDB raises — so
    # extinction is handled explicitly: the hazard term is taken only
    # while d < n and a cumulative dead-flag pins S to exactly 0 from
    # the extinction time on
    dtot = F.col("d_a") + F.col("d_b")
    dead = (dtot == F.col("n_risk")).cast("int")
    risked = (
        counts.crossJoin(F.broadcast(n_cens))
        .withColumn(
            "n_risk",
            F.sum(F.col("d_a") + F.col("d_b")).over(w_risk)
            + F.col("__nc"),
        )
        .withColumn(
            "__haz",
            F.when(
                dtot < F.col("n_risk"),
                F.log(F.lit(1.0) - dtot / F.col("n_risk")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("__dead", F.max(dead).over(w_ord))
        .withColumn("__dead_prev", F.coalesce(F.max(dead).over(w_prev), F.lit(0)))
        .withColumn(
            "surv_any",
            F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum("__haz").over(w_ord))
            ),
        )
        .withColumn(
            "__s_prev",
            F.when(F.col("__dead_prev") == 1, F.lit(0.0)).otherwise(
                F.coalesce(
                    F.exp(F.sum("__haz").over(w_prev)), F.lit(1.0)
                )
            ),
        )
    )
    out = risked.select(
        "t_days",
        "n_risk",
        "d_a",
        "d_b",
        F.round(F.col("surv_any"), round_to).alias("surv_any"),
        F.round(
            F.sum(
                F.col("__s_prev") * F.col("d_a") / F.col("n_risk")
            ).over(w_ord),
            round_to,
        ).alias("cif_a"),
        F.round(
            F.sum(
                F.col("__s_prev") * F.col("d_b") / F.col("n_risk")
            ).over(w_ord),
            round_to,
        ).alias("cif_b"),
    )
    return out.orderBy("t_days")


def aalen_johansen_cif_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    cause_a: str = "purchase",
    cause_b: str = "error",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`aalen_johansen_cif`."""
    return f"""
    WITH per_user AS (
      SELECT {user_col},
             MIN(CAST({ts_col} AS DATE)) AS fd,
             MIN(CASE WHEN event_type = '{cause_a}'
                 THEN CAST({ts_col} AS DATE) END) AS da,
             MIN(CASE WHEN event_type = '{cause_b}'
                 THEN CAST({ts_col} AS DATE) END) AS db
      FROM {table} GROUP BY 1
    ),
    lifetimes AS (
      SELECT CASE
               WHEN da IS NOT NULL AND (db IS NULL OR da <= db)
                 THEN CAST(date_diff('day', fd, da) AS BIGINT)
               WHEN db IS NOT NULL
                 THEN CAST(date_diff('day', fd, db) AS BIGINT)
               ELSE CAST(-1 AS BIGINT)
             END AS t_days,
             CASE WHEN da IS NOT NULL AND (db IS NULL OR da <= db)
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN db IS NOT NULL
                       AND NOT (da IS NOT NULL
                                AND (db IS NULL OR da <= db))
                  THEN 1 ELSE 0 END AS b
      FROM per_user
    ),
    counts AS (
      SELECT t_days,
             CAST(SUM(a) AS BIGINT) AS d_a,
             CAST(SUM(b) AS BIGINT) AS d_b
      FROM lifetimes WHERE t_days >= 0 GROUP BY 1
    ),
    cens AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nc
      FROM lifetimes WHERE t_days < 0
    ),
    risked AS (
      SELECT t_days, d_a, d_b,
             CAST(SUM(d_a + d_b) OVER (ORDER BY t_days DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) + cens.nc
                  AS BIGINT) AS n_risk
      FROM counts CROSS JOIN cens
    ),
    km AS (
      SELECT t_days, d_a, d_b, n_risk,
             CASE WHEN MAX(CASE WHEN d_a + d_b = n_risk THEN 1
                           ELSE 0 END)
                       OVER (ORDER BY t_days
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) = 1
                  THEN 0.0
                  ELSE EXP(SUM(CASE WHEN d_a + d_b < n_risk
                               THEN LN(1.0 - CAST(d_a + d_b AS DOUBLE)
                                       / n_risk) ELSE 0.0 END)
                      OVER (ORDER BY t_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW))
             END AS surv_any,
             CASE WHEN COALESCE(MAX(CASE WHEN d_a + d_b = n_risk
                                    THEN 1 ELSE 0 END)
                       OVER (ORDER BY t_days
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) = 1
                  THEN 0.0
                  ELSE COALESCE(EXP(SUM(CASE WHEN d_a + d_b < n_risk
                               THEN LN(1.0 - CAST(d_a + d_b AS DOUBLE)
                                       / n_risk) ELSE 0.0 END)
                      OVER (ORDER BY t_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)), 1.0)
             END AS s_prev
      FROM risked
    )
    SELECT t_days, n_risk, d_a, d_b,
           ROUND(surv_any, {round_to}) AS surv_any,
           ROUND(SUM(s_prev * d_a / n_risk)
                 OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW), {round_to}) AS cif_a,
           ROUND(SUM(s_prev * d_b / n_risk)
                 OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW), {round_to}) AS cif_b
    FROM km ORDER BY t_days
    """

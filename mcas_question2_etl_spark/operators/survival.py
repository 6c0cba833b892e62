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

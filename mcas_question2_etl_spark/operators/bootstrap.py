"""One-pass Poisson bootstrap: distributed confidence intervals
without resampling passes.

Classic bootstrap draws R resamples-with-replacement — R full shuffles
of the data. The Poisson bootstrap (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams", Google 2012) replaces the
multinomial resample with independent per-(row, replica) Poisson(1)
weights: one scan emits every replica's sufficient statistics at once,
and each replica's weighted estimate converges to a true bootstrap
replicate. This is THE way to put error bars on a 100 TB aggregate —
R× map-side work, zero extra passes, and the shuffle carries only
R × n_groups partial sums.

Determinism: the Poisson draw is the inverse CDF applied to a uniform
derived from md5(key:replica) — same engine-portable hash family as
operators/sampling.py — so both engines (and any two cluster runs)
produce bit-identical weights. Weighted sums stay in BIGINT (weight and
value both integers); only the final mean divides, and an identical
integer division yields identical doubles everywhere.

Reference parity: the reference reports point estimates only (e.g.
z-scores in etl/transform_msgp.py); uncertainty is an extension in the
training-data-engine charter (data-quality metrics need error bars
before they gate a corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: cumulative Poisson(1) CDF at k = 0..7; weights > 8 have probability
#: < 1e-5 and the tail clamps to 8. Literal doubles — identical
#: comparison constants in Spark and DuckDB.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)

#: 60-bit hash -> uniform denominator (15 hex chars)
_DENOM = float(1 << 60)


def _uniform_expr(key_col: str, replica_col: str) -> str:
    """Engine-portable uniform in [0,1): md5 of 'key:replica'."""
    return (
        f"cast(conv(substring(md5(concat(cast({key_col} as string), ':', "
        f"cast({replica_col} as string))), 1, 15), 16, 10) as bigint)"
        f" / {_DENOM}"
    )


def _uniform_sql(key_col: str, replica_col: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR) || ':' || "
        f"CAST({replica_col} AS VARCHAR)), 1, 15)) AS BIGINT) / {_DENOM}"
    )


def _weight_cases(u: str) -> str:
    """Inverse-CDF Poisson(1) as a CASE chain over literal thresholds."""
    whens = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    )
    return f"(CASE {whens} ELSE 8 END)"


def poisson_bootstrap_means(
    df: DataFrame,
    key_col: str,
    value_col: str,
    replicas: int = 32,
) -> DataFrame:
    """Per-replica bootstrap estimates of mean(value_col):
    ``(replica, n_eff, wsum, est_mean)``, one row per replica.

    One scan: each row fans out to ``replicas`` (replica, weight)
    pairs map-side (sequence+explode — no shuffle of the fan-out), and
    ONE aggregation reduces to R rows. The spread of ``est_mean``
    across replicas IS the sampling distribution of the mean.
    """
    u = _uniform_expr(key_col, "__r")
    fanned = df.select(
        F.col(key_col),
        F.col(value_col).cast("long").alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r"),
    ).withColumn("__w", F.expr(_weight_cases(u)).cast("long"))
    return (
        fanned.groupBy(F.col("__r").alias("replica"))
        .agg(
            F.sum("__w").alias("n_eff"),
            F.sum(F.col("__w") * F.col("__v")).alias("wsum"),
        )
        .withColumn("est_mean", F.col("wsum") / F.col("n_eff"))
    )


def poisson_bootstrap_means_sql(
    table: str, key_col: str, value_col: str, replicas: int = 32
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_means`."""
    u = _uniform_sql(key_col, "r")
    return f"""
    WITH fanned AS (
      SELECT {key_col}, CAST({value_col} AS BIGINT) AS v, t.r,
             CAST({_weight_cases(u)} AS BIGINT) AS w
      FROM {table}, unnest(range(0, {replicas})) AS t(r)
    )
    SELECT CAST(r AS INTEGER) AS replica,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * v) AS BIGINT) AS wsum,
           CAST(SUM(w * v) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS est_mean
    FROM fanned GROUP BY r
    """

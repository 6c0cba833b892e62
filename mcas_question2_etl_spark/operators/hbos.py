"""HBOS — Histogram-Based Outlier Score (Goldstein & Dengel, KI 2012):
the linear-time unsupervised anomaly scorer. Per feature, an
equal-width histogram estimates the density; a record's score is

    HBOS(x) = sum_f log( max_density_f / density_f(x) )

high where ANY feature lands in a thin bin. The standard cheap
screening pass before expensive per-record review — at corpus scale it
is two shuffles regardless of row count (per-feature bin counts, then
a broadcast join back), versus kNN/IsolationForest's per-record
neighborhoods.

Determinism discipline: features must be EXACT INTEGERS (cents, day
indexes, counts — the caller casts), and the bin index is pure integer
math ``bin = (x - min) * B // (max - min + 1)`` — no float boundary can
disagree between engines (wave-118 rule). Only the final log-ratio
score is double, computed from exact integer counts in a fixed closed
form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hbos_scores(
    df: DataFrame,
    id_col: str,
    features: Sequence[str],
    bins: int = 16,
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_k`` HBOS anomalies. ``features`` must already be exact
    integer-valued columns (bigint). Returns (id, score, per-feature
    bin indexes) ordered by (score desc, id asc) — a total order, so
    the cut is deterministic.

    Plan: one aggregate for per-feature (min, max), broadcast; one
    groupBy per feature for bin counts (B rows each), broadcast back;
    scoring is then a scan-stage projection + TakeOrdered(top_k).
    """
    pts = df.select(
        F.col(id_col).alias("__id"),
        *[
            F.col(feat).cast("bigint").alias(f"__f{i}")
            for i, feat in enumerate(features)
        ],
    )
    aggs = []
    for i in range(len(features)):
        aggs += [
            F.min(f"__f{i}").alias(f"mn{i}"),
            F.max(f"__f{i}").alias(f"mx{i}"),
            F.count(F.lit(1)).cast("bigint").alias(f"n{i}"),
        ]
    rng = pts.agg(*aggs)
    binned = pts.crossJoin(F.broadcast(rng))
    score_terms = []
    for i in range(len(features)):
        # integral division (matches DuckDB's //) — float-free binning
        b = F.expr(
            f"((__f{i} - mn{i}) * {bins}) div (mx{i} - mn{i} + 1)"
        ).cast("bigint")
        binned = binned.withColumn(f"__b{i}", b)
    counts = {}
    for i in range(len(features)):
        counts[i] = (
            binned.groupBy(f"__b{i}")
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"cnt{i}"))
            .withColumnRenamed(f"__b{i}", f"__bk{i}")
        )
        mx = counts[i].agg(F.max(f"cnt{i}").alias(f"cmax{i}"))
        counts[i] = counts[i].crossJoin(F.broadcast(mx))
    scored = binned
    for i in range(len(features)):
        scored = scored.join(
            F.broadcast(counts[i]),
            scored[f"__b{i}"] == counts[i][f"__bk{i}"],
        )
        score_terms.append(
            F.log(
                F.col(f"cmax{i}").cast("double")
                / F.col(f"cnt{i}").cast("double")
            )
        )
    total = score_terms[0]
    for t in score_terms[1:]:
        total = total + t
    out = scored.select(
        F.col("__id").alias(id_col),
        F.round(total, round_to).alias("hbos_score"),
        *[F.col(f"__b{i}").alias(f"bin_{i}") for i in range(len(features))],
    )
    return out.orderBy(
        F.col("hbos_score").desc(), F.col(id_col).asc()
    ).limit(top_k)


def hbos_scores_sql(
    table_sql: str,
    id_col: str,
    features: Sequence[str],
    bins: int = 16,
    top_k: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`hbos_scores` (same integer bin math, same
    closed-form log-ratio score, same total order)."""
    fsel = ", ".join(
        f"CAST({f} AS BIGINT) AS f{i}" for i, f in enumerate(features)
    )
    rsel = ", ".join(
        f"MIN(f{i}) AS mn{i}, MAX(f{i}) AS mx{i}" for i in range(len(features))
    )
    bsel = ", ".join(
        f"CAST((f{i} - mn{i}) * {bins} // (mx{i} - mn{i} + 1) AS BIGINT)"
        f" AS b{i}"
        for i in range(len(features))
    )
    cnt_ctes = ",\n    ".join(
        f"c{i} AS (SELECT b{i} AS bk{i}, CAST(COUNT(*) AS BIGINT) AS cnt{i} "
        f"FROM binned GROUP BY 1), "
        f"m{i} AS (SELECT MAX(cnt{i}) AS cmax{i} FROM c{i})"
        for i in range(len(features))
    )
    joins = " ".join(
        f"JOIN c{i} ON c{i}.bk{i} = binned.b{i} CROSS JOIN m{i}"
        for i in range(len(features))
    )
    score = " + ".join(
        f"ln(CAST(cmax{i} AS DOUBLE) / cnt{i})" for i in range(len(features))
    )
    bout = ", ".join(f"b{i} AS bin_{i}" for i in range(len(features)))
    return f"""
    WITH src AS ({table_sql}),
    pts AS (SELECT {id_col} AS id, {fsel} FROM src),
    rng AS (SELECT {rsel} FROM pts),
    binned AS (SELECT id, {bsel} FROM pts CROSS JOIN rng),
    {cnt_ctes}
    SELECT id AS {id_col},
           ROUND({score}, {round_to}) AS hbos_score,
           {bout}
    FROM binned {joins}
    ORDER BY hbos_score DESC, id ASC
    LIMIT {top_k}
    """

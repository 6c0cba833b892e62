"""Bloom-filter join prefiltering with a measurable false-positive rate.

The classic distributed-join optimization: hash the small (build) side's
keys into a bit set with ``k`` independent hash functions, broadcast the
bit set, and drop probe rows whose ``k`` positions are not all set
BEFORE the shuffle/exact join. Spark's runtime row-level bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opaquely inside the optimizer; this operator is the explicit, portable
version whose filter decisions — and therefore its false-positive rate —
are reproducible on any engine, so the FPR itself is oracle-checkable.

Scale shape: the build side reduces to at most ``k * |build|`` distinct
bit positions (bounded by ``m``), a table that broadcasts at any corpus
size once ``m`` is fixed; the probe side is filtered in the scan stage
with zero shuffle. Only survivors (true matches + FPR-bounded false
positives) pay the exact-join shuffle — at 100 TB with a selective
build side this cuts the shuffled volume by orders of magnitude.

Hashing is the repo's salted-md5 portable idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos_expr(col: str, salt: int, m: int) -> str:
    return (
        f"cast(conv(substring(md5(concat('bf{salt}:', cast({col} as string))),"
        f" 1, 15), 16, 10) as bigint) % {m}"
    )


def _pos_sql(col: str, salt: int, m: int) -> str:
    return (
        f"CAST(('0x' || substring(md5(concat('bf{salt}:', "
        f"CAST({col} AS VARCHAR))), 1, 15)) AS BIGINT) % {m}"
    )


def bloom_bits(build: DataFrame, key: str, k: int = 3, m: int = 4096) -> DataFrame:
    """The bit set: distinct positions ``(bf_pos)`` hit by the build keys."""
    parts = None
    for s in range(k):
        p = build.select(F.expr(_pos_expr(key, s, m)).alias("bf_pos"))
        parts = p if parts is None else parts.unionByName(p)
    return parts.distinct()


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Probe rows whose ``k`` positions are ALL set in the build-side
    bloom (true matches plus bloom false positives)."""
    bits = bloom_bits(build, build_key, k=k, m=m)
    # semi-join once per hash function: a row survives iff every one of
    # its k positions is present in the (broadcast) bit set — duplicate
    # probe rows each keep their own fate, unlike a groupBy-count scheme
    marked = probe
    for s in range(k):
        marked = marked.withColumn(f"__p{s}", F.expr(_pos_expr(probe_key, s, m)))
    for s in range(k):
        marked = marked.join(
            F.broadcast(bits.withColumnRenamed("bf_pos", f"__p{s}")),
            f"__p{s}",
            "left_semi",
        )
    for s in range(k):
        marked = marked.join(
            F.broadcast(bits.withColumnRenamed("bf_pos", f"__p{s}")),
            f"__p{s}",
            "left_semi",
        )
    return marked.drop(*[f"__p{s}" for s in range(k)])


def bloom_join_report(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """One-row audit of the prefilter: probe rows in/out, true matches,
    false positives, and the realized false-positive rate (rounded;
    FPR = false_pos / bloom-passing non-matches' candidate pool)."""
    passed = bloom_prefilter(probe, build, probe_key, build_key, k=k, m=m)
    build_keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    truth = probe.join(F.broadcast(build_keys), probe_key, "left_semi")
    n_probe = probe.count()
    n_pass = passed.count()
    n_true = truth.count()
    spark = probe.sparkSession
    fpr = (n_pass - n_true) / (n_probe - n_true) if n_probe > n_true else 0.0
    return spark.createDataFrame(
        [(n_probe, n_pass, n_true, n_pass - n_true, round(fpr, 6))],
        "n_probe long, n_pass long, n_true long, n_false_pos long, fpr double",
    )


def bloom_join_report_sql(
    probe_table: str,
    build_table: str,
    probe_key: str,
    build_key: str,
    build_where: str = "TRUE",
    k: int = 3,
    m: int = 4096,
) -> str:
    """DuckDB twin of :func:`bloom_join_report`."""
    bits_union = "\nUNION\n".join(
        f"SELECT {_pos_sql(build_key, s, m)} AS bf_pos "
        f"FROM {build_table} WHERE {build_where}"
        for s in range(k)
    )
    all_set = " AND ".join(
        f"{_pos_sql(probe_key, s, m)} IN (SELECT bf_pos FROM bits)"
        for s in range(k)
    )
    return f"""
    WITH bits AS ({bits_union}),
    passed AS (
      SELECT * FROM {probe_table} WHERE {all_set}
    ),
    truth AS (
      SELECT * FROM {probe_table}
      WHERE {probe_key} IN (SELECT {build_key} FROM {build_table}
                            WHERE {build_where})
    ),
    c AS (
      SELECT CAST((SELECT COUNT(*) FROM {probe_table}) AS BIGINT) AS n_probe,
             CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass,
             CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true
    )
    SELECT n_probe, n_pass, n_true,
           n_pass - n_true AS n_false_pos,
           round(CASE WHEN n_probe > n_true
                      THEN (n_pass - n_true) / CAST(n_probe - n_true AS DOUBLE)
                      ELSE 0.0 END, 6) AS fpr
    FROM c
    """

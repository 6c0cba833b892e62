"""Schema-level data profiling: functional-dependency and key-candidate
discovery.

The two profiling questions every inherited dataset gets asked first:
which columns determine which (functional dependencies — the basis
for normalization, join-key selection, and "is this denormalized
copy consistent" checks), and which columns could serve as keys
(uniqueness profiling). Both are pure COUNT/COUNT DISTINCT pipelines —
exact bigints, single final ratios, nothing to round.

Scale shape: each FD pair is one (lhs) groupBy over the table with
map-side combine followed by a class-table reduction; the key profile
is ONE pass computing all per-column distincts in a single aggregate
(Spark expands multi-distinct aggregates via grouping-id, still one
scan), then a static unpivot of the 1-row result.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def functional_dependency_audit(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
) -> DataFrame:
    """One row per candidate FD lhs -> rhs: (lhs_col, rhs_col,
    n_classes, n_violating, max_rhs_per_class, fd_holds)."""
    outs = []
    for lhs, rhs in pairs:
        classes = df.groupBy(lhs).agg(
            F.countDistinct(rhs).cast("bigint").alias("__l")
        )
        outs.append(
            classes.agg(
                F.lit(lhs).alias("lhs_col"),
                F.lit(rhs).alias("rhs_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                F.sum((F.col("__l") > 1).cast("bigint"))
                .cast("bigint")
                .alias("n_violating"),
                F.max("__l").alias("max_rhs_per_class"),
                (F.max("__l") == 1).alias("fd_holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def functional_dependency_audit_sql(
    table: str,
    pairs: Sequence[tuple[str, str]],
) -> str:
    """DuckDB twin of :func:`functional_dependency_audit`."""
    parts = []
    for lhs, rhs in pairs:
        parts.append(f"""
    SELECT '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN l > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(MAX(l) AS BIGINT) AS max_rhs_per_class,
           MAX(l) = 1 AS fd_holds
    FROM (SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS l
          FROM {table} GROUP BY {lhs})""")
    return "\nUNION ALL\n".join(parts)


def key_candidate_profile(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """One row per column: (column, n_rows, n_distinct, n_nulls,
    uniqueness, is_key) — is_key when every row carries a distinct
    non-null value. All distincts computed in a single aggregate pass."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__d_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__z_{c}")
        )
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', __d_{c}, __z_{c}")
    stacked = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS (column_name, n_distinct, n_nulls)",
    )
    return stacked.select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_distinct",
        "n_nulls",
        (F.col("n_distinct").cast("double") / F.col("__n")).alias("uniqueness"),
        ((F.col("n_distinct") == F.col("__n")) & (F.col("n_nulls") == 0)).alias(
            "is_key"
        ),
    )


def key_candidate_profile_sql(
    table: str,
    cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`key_candidate_profile`."""
    parts = []
    for c in cols:
        parts.append(f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*) AS uniqueness,
           COUNT(DISTINCT {c}) = COUNT(*)
             AND SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) = 0 AS is_key
    FROM {table}""")
    return "\nUNION ALL\n".join(parts)


def string_pattern_profile(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """Format-mask profiling of a string column: uppercase -> 'A',
    lowercase -> 'a', digits -> '9' (other characters kept), then
    masks counted — the classic wrangling view that surfaces mixed
    formats ("Customer#000000001" vs "cust-1") in one table instead
    of eyeballing samples.

    Output: (pattern, n_rows, n_distinct, example) with example = MIN
    value (deterministic representative). Pure string expressions +
    one pattern-grain aggregation; exact everywhere.
    """
    mask = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(col), "[A-Z]", "A"), "[a-z]", "a"
        ),
        "[0-9]",
        "9",
    )
    return (
        df.select(mask.alias("pattern"), F.col(col).alias("__v"))
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("__v").cast("bigint").alias("n_distinct"),
            F.min("__v").alias("example"),
        )
    )


def string_pattern_profile_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`string_pattern_profile`."""
    return f"""
    SELECT regexp_replace(regexp_replace(regexp_replace(
             {col}, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '9', 'g')
             AS pattern,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           MIN({col}) AS example
    FROM {table}
    GROUP BY 1
    """


def id_gap_audit(
    df: DataFrame,
    id_col: str,
) -> DataFrame:
    """Contiguity audit of an integer id column WITHOUT a global sort:
    (n_ids, id_min, id_max, n_missing, n_gaps, max_gap) where a gap is
    a maximal run of absent ids between two present ones — the
    sequence-integrity check for ingest pipelines (dropped batches
    show up as gaps, double-loads as n_missing < 0 never happening
    because ids are DISTINCT'd first).

    Distributed construction: a plain ``lead() OVER (ORDER BY id)``
    is a single-task window, so instead the ids are range-shuffled
    (balanced, ordered partitions), each partition computes its
    internal consecutive deltas in parallel, and the cross-partition
    boundary deltas come from the #partitions-row (min, max) table —
    the same two-phase shape as the repo's global ranks. All-integer,
    exact.
    """
    ids = df.select(F.col(id_col).cast("bigint").alias("__id")).distinct()
    parts = ids.repartitionByRange("__id").withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy("__id")
    internal = parts.withColumn(
        "__gap", F.lead("__id", 1).over(w_in) - F.col("__id") - 1
    ).filter(F.col("__gap").isNotNull())
    bounds = parts.groupBy("__pid").agg(
        F.min("__id").alias("__lo"), F.max("__id").alias("__hi")
    )
    w_b = Window.orderBy("__pid")
    boundary = (
        bounds.withColumn("__next_lo", F.lead("__lo", 1).over(w_b))
        .filter(F.col("__next_lo").isNotNull())
        .select((F.col("__next_lo") - F.col("__hi") - 1).alias("__gap"))
    )
    gaps = internal.select("__gap").unionByName(boundary)
    gap_stats = gaps.agg(
        F.coalesce(F.sum("__gap"), F.lit(0)).cast("bigint").alias("n_missing"),
        F.coalesce(
            F.sum((F.col("__gap") > 0).cast("bigint")), F.lit(0)
        ).cast("bigint").alias("n_gaps"),
        F.coalesce(F.max("__gap"), F.lit(0)).cast("bigint").alias("max_gap"),
    )
    totals = ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ids"),
        F.min("__id").alias("id_min"),
        F.max("__id").alias("id_max"),
    )
    return totals.crossJoin(F.broadcast(gap_stats))


def id_gap_audit_sql(table: str, id_col: str) -> str:
    """DuckDB twin of :func:`id_gap_audit` (plain global window — the
    oracle does not need the distributed construction)."""
    return f"""
    WITH ids AS (SELECT DISTINCT CAST({id_col} AS BIGINT) AS id FROM {table}),
    d AS (
      SELECT lead(id) OVER (ORDER BY id) - id - 1 AS gap FROM ids
    ),
    g AS (
      SELECT COALESCE(CAST(SUM(gap) AS BIGINT), 0) AS n_missing,
             COALESCE(CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT),
                      0) AS n_gaps,
             COALESCE(CAST(MAX(gap) AS BIGINT), 0) AS max_gap
      FROM d WHERE gap IS NOT NULL
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_ids,
             CAST(MIN(id) AS BIGINT) AS id_min,
             CAST(MAX(id) AS BIGINT) AS id_max
      FROM ids
    )
    SELECT t.n_ids, t.id_min, t.id_max, g.n_missing, g.n_gaps, g.max_gap
    FROM t CROSS JOIN g
    """


def integer_moments_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Skewness / excess-kurtosis profile of an INTEGER column per
    group — the shape statistics a length/count distribution audit
    needs beyond summary_stats' mean/stddev (heavy right tail?
    truncation? bimodality hints via g2 < 0).

    Exactness: power sums S1..S4 accumulate in DECIMAL(38,0) (an
    integer x <= ~1e4 keeps x^4 <= 1e16, far inside 38 digits even
    summed over billions of rows); the central-moment and g1/g2
    formulas are then FIXED IEEE expressions over exact-valued
    doubles, parenthesized identically in both engines — zero
    rounding. Groups with zero variance emit 0 for both statistics.

    Scale: one map-side-combined aggregation; four decimal sums per
    group is the whole shuffle payload.
    """
    dec = "decimal(38,0)"
    x = F.col(value_col).cast("bigint")
    agg = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast(dec)).alias("s1"),
        F.sum((x * x).cast(dec)).alias("s2"),
        F.sum((x * x * x).cast(dec)).alias("s3"),
        F.sum((x * x * x * x).cast(dec)).alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    q2 = F.col("s2").cast("double") / n
    q3 = F.col("s3").cast("double") / n
    q4 = F.col("s4").cast("double") / n
    based = agg.select(
        "g", "n", mean.alias("mean"), q2.alias("q2"), q3.alias("q3"),
        q4.alias("q4"),
    )
    m = F.col("mean")
    m2 = F.col("q2") - m * m
    m3 = F.col("q3") - 3 * m * F.col("q2") + 2 * m * m * m
    m4 = (
        F.col("q4")
        - 4 * m * F.col("q3")
        + 6 * (m * m) * F.col("q2")
        - 3 * ((m * m) * (m * m))
    )
    shaped = based.select(
        "g", "n", "mean", m2.alias("m2"), m3.alias("m3"), m4.alias("m4")
    )
    return shaped.select(
        F.col("g").alias(group_col),
        "n",
        "mean",
        F.sqrt(F.col("m2")).alias("stddev_pop"),
        F.when(
            F.col("m2") > 0,
            F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))),
        )
        .otherwise(F.lit(0.0))
        .alias("skewness"),
        F.when(
            F.col("m2") > 0,
            F.col("m4") / (F.col("m2") * F.col("m2")) - 3,
        )
        .otherwise(F.lit(0.0))
        .alias("excess_kurtosis"),
    )


def integer_moments_profile_sql(
    table: str,
    group_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`integer_moments_profile` — identical
    parenthesization throughout."""
    return f"""
    WITH agg AS (
      SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST({value_col} AS BIGINT) AS DECIMAL(38,0))) AS s1,
             SUM(CAST(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                      AS DECIMAL(38,0))) AS s2,
             SUM(CAST(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                      * CAST({value_col} AS BIGINT) AS DECIMAL(38,0))) AS s3,
             SUM(CAST(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                      * CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                      AS DECIMAL(38,0))) AS s4
      FROM {table} GROUP BY 1
    ),
    based AS (
      SELECT g, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS q2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS q3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS q4
      FROM agg
    ),
    shaped AS (
      SELECT g, n, mean,
             q2 - mean * mean AS m2,
             q3 - 3 * mean * q2 + 2 * mean * mean * mean AS m3,
             q4 - 4 * mean * q3 + 6 * (mean * mean) * q2
                - 3 * ((mean * mean) * (mean * mean)) AS m4
      FROM based
    )
    SELECT g AS {group_col}, n, mean,
           sqrt(m2) AS stddev_pop,
           CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) ELSE 0.0 END
             AS skewness,
           CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 ELSE 0.0 END
             AS excess_kurtosis
    FROM shaped
    """


def qq_compare(
    df: DataFrame,
    group_col: str,
    value_col: str,
    step: int = 5,
) -> DataFrame:
    """Quantile-quantile comparison table: each group's percentile
    ladder (p = step, 2*step, ..., 100-step) of ``value_col`` against
    the pooled ladder — the numeric drift report behind a QQ plot,
    complementing PSI (bucketed densities) with tail-resolved
    positions.

    Exactness: quantiles are TYPE-1 (lower) element PICKS —
    index = 1 + ((n-1)*p) div 100 over the value-ordered rows — never
    interpolated, so every output is an actual data value; the diff
    column is an exact subtraction. Ties don't matter for the picked
    VALUE (equal values are interchangeable at the index).

    Scale: one rank window per group (per-group series assumption,
    same caveat as spearman) + one over the pooled distinct ... the
    pooled ladder reuses the value-grain rollup device: cumulative
    counts over the DISTINCT value table, no global row ranking.
    Output: (group, p, q_value, pooled_q, diff).
    """
    n_g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wg = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
        F.row_number().over(wg).cast("bigint").alias("rn"),
    )
    ps = [p for p in range(step, 100, step)]
    pdf = n_g.select(
        "g", "n", F.explode(F.array(*[F.lit(p) for p in ps])).alias("p")
    ).select(
        "g",
        "p",
        (1 + F.expr("((n - 1) * p) div 100")).cast("bigint").alias("idx"),
    )
    group_q = pdf.join(
        ranked,
        (pdf["g"] == ranked["g"]) & (pdf["idx"] == ranked["rn"]),
    ).select(pdf["g"].alias("g"), "p", F.col("v").alias("q_value"))
    # pooled ladder from the value-grain rollup (no global row window)
    vals = df.groupBy(F.col(value_col).cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "v", F.sum("c").over(wv).cast("bigint").alias("cum")
    )
    ntot = df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pooled_idx = ntot.select(
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
        F.col("n"),
    ).select("p", (1 + F.expr("((n - 1) * p) div 100")).cast("bigint").alias("idx"))
    # pooled quantile = min value whose cumulative count reaches idx
    pooled_q = (
        pooled_idx.join(cum, F.col("cum") >= F.col("idx"))
        .groupBy("p")
        .agg(F.min("v").alias("pooled_q"))
    )
    return group_q.join(F.broadcast(pooled_q), "p").select(
        F.col("g").alias(group_col),
        "p",
        "q_value",
        "pooled_q",
        (F.col("q_value") - F.col("pooled_q")).alias("diff"),
    )


def qq_compare_sql(
    table: str,
    group_col: str,
    value_col: str,
    step: int = 5,
) -> str:
    """DuckDB twin of :func:`qq_compare`."""
    ps = ", ".join(str(p) for p in range(step, 100, step))
    return f"""
    WITH ranked AS (
      SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v,
             CAST(row_number() OVER (PARTITION BY {group_col}
                  ORDER BY {value_col}) AS BIGINT) AS rn
      FROM {table}
    ),
    ng AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM ranked GROUP BY g),
    pdf AS (
      SELECT g, p, CAST(1 + ((n - 1) * p) // 100 AS BIGINT) AS idx
      FROM ng CROSS JOIN (SELECT unnest([{ps}]) AS p)
    ),
    group_q AS (
      SELECT pdf.g, pdf.p, ranked.v AS q_value
      FROM pdf JOIN ranked ON ranked.g = pdf.g AND ranked.rn = pdf.idx
    ),
    vals AS (
      SELECT CAST({value_col} AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1
    ),
    cum AS (
      SELECT v, CAST(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
      FROM vals
    ),
    ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
    pooled_idx AS (
      SELECT p, CAST(1 + ((n - 1) * p) // 100 AS BIGINT) AS idx
      FROM ntot CROSS JOIN (SELECT unnest([{ps}]) AS p)
    ),
    pooled_q AS (
      SELECT p, MIN(v) AS pooled_q
      FROM pooled_idx JOIN cum ON cum.cum >= pooled_idx.idx
      GROUP BY p
    )
    SELECT group_q.g AS {group_col}, group_q.p, group_q.q_value,
           pooled_q.pooled_q, group_q.q_value - pooled_q.pooled_q AS diff
    FROM group_q JOIN pooled_q ON pooled_q.p = group_q.p
    """


def partition_skew_report(
    df: DataFrame,
    key_col: str,
    buckets: int = 32,
    top_k: int = 5,
) -> DataFrame:
    """Shuffle-partition skew diagnosis for a prospective join/agg
    key: hash every row's key into ``buckets`` portable md5 buckets
    (the stand-in for Spark's hash partitioner, engine-portable so
    the oracle can replay it), report each bucket's load plus the
    skew headline — max/avg ratio and whether the bucket's heaviest
    single key dominates it (the hot-key-vs-hot-bucket distinction
    that decides between salting and AQE skew handling).

    Exact integer counts end to end; the ratio is one division.
    Output: one row per bucket — (bucket, n_rows, n_keys,
    top_key_rows, skew_ratio).
    """
    from .sampling import hash_bucket

    keyed = df.select(
        F.col(key_col).alias("k"), hash_bucket(key_col, buckets).alias("b")
    )
    per_key = keyed.groupBy("b", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_bucket = per_key.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("top_key_rows"),
    )
    tot = per_bucket.agg(
        F.sum("n_rows").cast("bigint").alias("__t"),
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
    )
    return per_bucket.crossJoin(F.broadcast(tot)).select(
        F.col("b").alias("bucket"),
        "n_rows",
        "n_keys",
        "top_key_rows",
        (
            F.col("n_rows").cast("double")
            / (F.col("__t").cast("double") / F.col("__nb"))
        ).alias("skew_ratio"),
    )


def partition_skew_report_sql(
    table: str,
    key_col: str,
    buckets: int = 32,
) -> str:
    """DuckDB twin of :func:`partition_skew_report`."""
    from .sampling import hash_bucket_sql

    hb = hash_bucket_sql(key_col, buckets)
    return f"""
    WITH keyed AS (
      SELECT {key_col} AS k, {hb} AS b FROM {table}
    ),
    per_key AS (
      SELECT b, k, CAST(COUNT(*) AS BIGINT) AS c FROM keyed GROUP BY b, k
    ),
    per_bucket AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS top_key_rows
      FROM per_key GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM per_bucket
    )
    SELECT per_bucket.b AS bucket, per_bucket.n_rows, per_bucket.n_keys,
           per_bucket.top_key_rows,
           CAST(per_bucket.n_rows AS DOUBLE)
             / (CAST(tot.t AS DOUBLE) / tot.nb) AS skew_ratio
    FROM per_bucket CROSS JOIN tot
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 109: inclusion-dependency discovery
# ──────────────────────────────────────────────────────────────────────────


def inclusion_dependency_report(
    pairs,
    round_to: int = 6,
):
    """Inclusion-dependency (IND) discovery over a candidate battery:
    for each (label, df_a, col_a, df_b, col_b) candidate, does the
    value set of A embed in B? Completes the classical profiling
    trio next to unique-column discovery (key_candidate_orders) and
    functional dependencies (functional_dependency_parts) — INDs are
    the joinability/FK map a schema-less lake needs before any join
    is trusted, and fk_orphan_report's single-FK check generalized
    to a sweep.

    Per candidate: distinct projections of both sides, a LEFT ANTI
    join for violations (the distinct-then-anti-join shape shuffles
    value sets, never fact rows), exact bigint counts, coverage =
    1 − violations/|A|. The battery is a fixed literal list — the
    loop is over candidates, never data. Output per candidate:
    (candidate, distinct_a, distinct_b, violations, coverage,
    holds), label-ordered."""
    out = None
    for label, df_a, col_a, df_b, col_b in pairs:
        a = (
            df_a.select(F.col(col_a).cast("bigint").alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
        )
        b = (
            df_b.select(F.col(col_b).cast("bigint").alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
        )
        viol = a.join(b, "__v", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("violations")
        )
        counts = a.agg(
            F.count(F.lit(1)).cast("bigint").alias("distinct_a")
        ).crossJoin(
            F.broadcast(
                b.agg(F.count(F.lit(1)).cast("bigint").alias("distinct_b"))
            )
        )
        row = counts.crossJoin(F.broadcast(viol)).select(
            F.lit(label).alias("candidate"),
            "distinct_a",
            "distinct_b",
            "violations",
            F.round(
                F.lit(1.0)
                - F.col("violations").cast("double")
                / F.col("distinct_a").cast("double"),
                round_to,
            ).alias("coverage"),
            (F.col("violations") == 0).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


def inclusion_dependency_report_sql(
    pairs,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`inclusion_dependency_report`. ``pairs``
    entries are (label, table_a, col_a, table_b, col_b) strings."""
    subs = []
    for label, ta, ca, tb, cb in pairs:
        subs.append(f"""
      SELECT '{label}' AS candidate,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT DISTINCT CAST({ca} AS BIGINT) AS v FROM {ta}
                    WHERE {ca} IS NOT NULL)) AS distinct_a,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT DISTINCT CAST({cb} AS BIGINT) AS v FROM {tb}
                    WHERE {cb} IS NOT NULL)) AS distinct_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT CAST({ca} AS BIGINT) AS v FROM {ta}
                WHERE {ca} IS NOT NULL) a
               WHERE NOT EXISTS (SELECT 1 FROM {tb} b
                                 WHERE CAST(b.{cb} AS BIGINT) = a.v))
               AS violations""")
    union = "\n      UNION ALL".join(subs)
    return f"""
    WITH raw AS ({union}
    )
    SELECT candidate, distinct_a, distinct_b, violations,
           ROUND(1.0 - CAST(violations AS DOUBLE)
                       / CAST(distinct_a AS DOUBLE), {round_to})
             AS coverage,
           violations = 0 AS holds
    FROM raw ORDER BY candidate
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 171: column encoding advisor
# ──────────────────────────────────────────────────────────────────────────


def encoding_advisor(
    df: DataFrame,
    order_col: str,
    cols: "Sequence[str]",
    round_to: int = 6,
) -> DataFrame:
    """Storage-encoding advisor over a fixed column list — the
    lakehouse question every compaction job answers implicitly and
    no one audits explicitly: per column, would DICTIONARY or
    RUN-LENGTH encoding beat PLAIN, and by how much?

      plain_bytes = Σ value widths (strings: byte length + 4-byte
                    length prefix; numerics: 8);
      dict_bytes  = Σ distinct-value widths + n·⌈log2(ndv)⌉/8
                    (codes bit-packed);
      rle_runs    = runs of equal values in ``order_col`` order
                    (RLE is an ORDERING property — the same column
                    RLEs 100× differently sorted vs shuffled, which
                    is why the advisor pins the scan order
                    explicitly);
      rle_bytes   = runs · (value width + 4).

    The recommendation is argmin bytes. Everything is exact integer
    counting: one pass per metric family over the scan with a lag
    window in the pinned order for runs; the unpivot is a fixed
    column list (one `stack`), so the plan is static. Ratios round
    at 6dp.

    Output per column: (column, n, ndv, plain_bytes, dict_bytes,
    rle_runs, rle_bytes, best, best_ratio), ordered by column.
    """
    from pyspark.sql import Window

    pieces = []
    w = Window.orderBy(order_col)
    for c in cols:
        v = F.col(c).cast("string")
        width = F.coalesce(F.length(v).cast("bigint") + 4, F.lit(4))
        run_start = (
            ~(v.eqNullSafe(F.lag(v).over(w)))
        ).cast("int")
        per = df.select(
            F.lit(c).alias("column"),
            v.alias("__v"),
            width.alias("__w"),
            run_start.alias("__rs"),
        )
        pieces.append(per)
    stacked = pieces[0]
    for extra in pieces[1:]:
        stacked = stacked.unionByName(extra)
    agg = stacked.groupBy("column").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("__v").cast("bigint").alias("ndv"),
        F.sum("__w").cast("bigint").alias("plain_bytes"),
        F.sum("__rs").cast("bigint").alias("rle_runs"),
    )
    dvw = (
        stacked.select("column", "__v", "__w")
        .distinct()
        .groupBy("column")
        .agg(F.sum("__w").cast("bigint").alias("__dict_values"))
    )
    j = agg.join(dvw, "column")
    # pure integer arithmetic throughout: a double->bigint cast
    # TRUNCATES in Spark but ROUNDS in DuckDB, so fractional bytes
    # must never exist to begin with
    code_bits = F.ceil(
        F.log2(F.greatest(F.col("ndv").cast("double"), F.lit(2.0)))
    ).cast("bigint")
    dict_bytes = F.col("__dict_values") + F.expr(
        "(n * __code_bits + 7) DIV 8"
    )
    rle_bytes = F.col("rle_runs") * 4 + F.expr(
        "(rle_runs * plain_bytes) DIV n"
    )
    scored = j.withColumn("__code_bits", code_bits).select(
        "column",
        "n",
        "ndv",
        "plain_bytes",
        dict_bytes.alias("dict_bytes"),
        "rle_runs",
        rle_bytes.alias("rle_bytes"),
    )
    best = (
        F.when(
            (F.col("dict_bytes") <= F.col("plain_bytes"))
            & (F.col("dict_bytes") <= F.col("rle_bytes")),
            F.lit("dict"),
        )
        .when(F.col("rle_bytes") <= F.col("plain_bytes"), F.lit("rle"))
        .otherwise(F.lit("plain"))
    )
    return scored.select(
        "*",
        best.alias("best"),
        F.round(
            F.least("dict_bytes", "rle_bytes", "plain_bytes").cast(
                "double"
            )
            / F.col("plain_bytes").cast("double"),
            round_to,
        ).alias("best_ratio"),
    ).orderBy("column")


def encoding_advisor_sql(
    table: str,
    order_col: str,
    cols: "Sequence[str]",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`encoding_advisor` (same widths, same
    pinned run order, same argmin tie-breaks)."""
    selects = []
    for c in cols:
        selects.append(
            f"""
      SELECT '{c}' AS col,
             CAST({c} AS VARCHAR) AS v,
             COALESCE(CAST(LENGTH(CAST({c} AS VARCHAR)) AS BIGINT)
                      + 4, 4) AS w,
             CAST(CASE WHEN CAST({c} AS VARCHAR)
                            IS DISTINCT FROM
                            LAG(CAST({c} AS VARCHAR))
                              OVER (ORDER BY {order_col})
                       THEN 1 ELSE 0 END AS INTEGER) AS rs
      FROM {table}"""
        )
    stacked = "\n      UNION ALL".join(selects)
    return f"""
    WITH stacked AS ({stacked}
    ),
    agg AS (
      SELECT col,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
             CAST(SUM(w) AS BIGINT) AS plain_bytes,
             CAST(SUM(rs) AS BIGINT) AS rle_runs
      FROM stacked GROUP BY col
    ),
    dv AS (
      SELECT col, CAST(SUM(w) AS BIGINT) AS dict_values
      FROM (SELECT DISTINCT col, v, w FROM stacked) GROUP BY col
    ),
    scored AS (
      SELECT a.col AS "column", a.n, a.ndv, a.plain_bytes,
             dv.dict_values
               + (a.n * CAST(CEIL(LOG2(GREATEST(
                     CAST(a.ndv AS DOUBLE), 2.0))) AS BIGINT) + 7)
                 // 8 AS dict_bytes,
             a.rle_runs,
             a.rle_runs * 4
               + (a.rle_runs * a.plain_bytes) // a.n AS rle_bytes
      FROM agg a JOIN dv ON dv.col = a.col
    )
    SELECT "column", n, ndv, plain_bytes, dict_bytes, rle_runs,
           rle_bytes,
           CASE WHEN dict_bytes <= plain_bytes
                     AND dict_bytes <= rle_bytes THEN 'dict'
                WHEN rle_bytes <= plain_bytes THEN 'rle'
                ELSE 'plain' END AS best,
           ROUND(CAST(LEAST(dict_bytes, rle_bytes, plain_bytes)
                      AS DOUBLE) / CAST(plain_bytes AS DOUBLE),
                 {round_to}) AS best_ratio
    FROM scored ORDER BY "column"
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 175: golden-record survivorship consolidation
# ──────────────────────────────────────────────────────────────────────────


def golden_record(
    df: DataFrame,
    cluster_col: str,
    recency_col: str,
    tiebreak_col: str,
    latest_cols: "Sequence[str]",
    mode_cols: "Sequence[str]",
    max_cols: "Sequence[str]",
) -> DataFrame:
    """Golden-record survivorship — the consolidation step after
    entity resolution (the suite's CC/linkage family produces the
    CLUSTERS; this produces the one surviving row per cluster that
    MDM pipelines actually ship): per cluster, each attribute
    survives by its own documented rule —

      latest_cols : value from the most RECENT record
                    (recency, tiebreak) — last-write-wins;
      mode_cols   : most FREQUENT value (count desc, value asc —
                    a total order, no arbitrary pick);
      max_cols    : extremum (MAX).

    Every rule is a deterministic total order, so the golden row is
    engine-exact. One groupBy for the latest/max rules (max_by via
    max-of-struct keeps it a single aggregate — no window, no
    self-join); the mode rule is one (cluster, value) rollup + one
    row_number per cluster over value counts. Lineage counts
    (n_records, n_distinct per moded attribute) ride along because a
    golden record without provenance is un-audit-able.

    Output per cluster: (cluster, n_records, <latest cols>,
    <mode cols>, <mode col>_ndv, <max cols>), ordered by cluster.
    """
    from pyspark.sql import Window as W

    ordkey = F.struct(
        F.col(recency_col).alias("r"), F.col(tiebreak_col).alias("t")
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_records")]
    for c in latest_cols:
        aggs.append(
            F.max(F.struct(ordkey.alias("k"), F.col(c).alias("v")))
            .getField("v")
            .alias(c)
        )
    for c in max_cols:
        aggs.append(F.max(c).alias(c))
    base = df.groupBy(F.col(cluster_col).alias("cluster")).agg(*aggs)
    out = base
    for c in mode_cols:
        counts = df.groupBy(
            F.col(cluster_col).alias("cluster"), F.col(c).alias("v")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        wm = W.partitionBy("cluster").orderBy(
            F.col("cnt").desc(), F.col("v").asc()
        )
        ndv = counts.groupBy("cluster").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{c}_ndv")
        )
        top = (
            counts.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .select("cluster", F.col("v").alias(c))
        )
        out = out.join(top, "cluster").join(ndv, "cluster")
    return out.orderBy("cluster")


def golden_record_sql(
    src_sql: str,
    cluster_col: str,
    recency_col: str,
    tiebreak_col: str,
    latest_cols: "Sequence[str]",
    mode_cols: "Sequence[str]",
    max_cols: "Sequence[str]",
) -> str:
    """DuckDB twin of :func:`golden_record` (same total orders)."""
    latest = ",\n             ".join(
        f"(MAX(struct_pack(r := {recency_col}, t := {tiebreak_col},"
        f" v := {c}))).v AS {c}"
        for c in latest_cols
    )
    maxes = ",\n             ".join(
        f"MAX({c}) AS {c}" for c in max_cols
    )
    base_cols = ",\n             ".join(
        x for x in [latest, maxes] if x
    )
    mode_joins = ""
    mode_sel = ""
    for c in mode_cols:
        mode_joins += f"""
    JOIN (
      SELECT cluster, v AS {c}
      FROM (
        SELECT {cluster_col} AS cluster, {c} AS v,
               ROW_NUMBER() OVER (PARTITION BY {cluster_col}
                                  ORDER BY COUNT(*) DESC, {c} ASC)
                 AS rn
        FROM src GROUP BY {cluster_col}, {c}
      ) WHERE rn = 1
    ) m_{c} USING (cluster)
    JOIN (
      SELECT {cluster_col} AS cluster,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_ndv
      FROM src GROUP BY {cluster_col}
    ) d_{c} USING (cluster)"""
        mode_sel += f", m_{c}.{c}, d_{c}.{c}_ndv"
    return f"""
    WITH src AS ({src_sql}),
    base AS (
      SELECT {cluster_col} AS cluster,
             CAST(COUNT(*) AS BIGINT) AS n_records,
             {base_cols}
      FROM src GROUP BY {cluster_col}
    )
    SELECT base.*{mode_sel}
    FROM base{mode_joins}
    ORDER BY cluster
    """

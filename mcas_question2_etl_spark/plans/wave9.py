"""Wave-9 extension specs: within-document repetition metrics (the
Gopher repetition-filter family) and a Z-order pruning-effectiveness
probe that quantifies what the layout operator buys.

Both specs are integer-exact end to end — ratios ship as
numerator/denominator pairs and per-doc threshold flags use
cross-multiplied integer comparisons — so the DuckDB twins match
bit-for-bit with no float discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.zorder import morton_key, morton_key_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "repetition_quality_report",
    """
    WITH toks AS (
      SELECT source,
             string_split(text, ' ') AS w
      FROM documents
    ),
    per_doc AS (
      SELECT source,
             len(w) AS n_tok,
             len(list_distinct(w)) AS n_distinct,
             len(w) - 1 AS n_bi,
             len(list_distinct(list_transform(
               range(2, len(w) + 1),
               i -> w[i - 1] || ' ' || w[i]))) AS n_bi_distinct
      FROM toks WHERE len(w) >= 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok - n_distinct) AS BIGINT) AS repeated_tokens,
           CAST(SUM(n_bi - n_bi_distinct) AS BIGINT) AS repeated_bigrams,
           CAST(SUM(CASE WHEN 10 * (n_tok - n_distinct) > 5 * n_tok
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_dup_tokens,
           CAST(SUM(CASE WHEN 10 * (n_bi - n_bi_distinct) > 8 * n_bi
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged_dup_bigrams
    FROM per_doc GROUP BY 1 ORDER BY 1
    """,
    "training-data op — within-document repetition metrics, the "
    "Gopher repetition-filter family (duplicate-token and "
    "duplicate-bigram mass per doc, docs over the 50%/80% repetition "
    "thresholds). Pure array expressions (split / array_distinct / "
    "transform) inside the scan stage — no explode, no shuffle of "
    "token rows, one group-by on source; thresholds are "
    "cross-multiplied INTEGER comparisons so the oracle is exact",
)
def repetition_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE per row, then build the bigram array off the array
    # column (a lambda that re-invokes split(text) per element is
    # O(len^2) splits per document)
    toked = docs.select("source", F.split("text", " ").alias("w"))
    d = toked.select(
        "source",
        F.size("w").alias("n_tok"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        (F.size("w") - 1).alias("n_bi"),
        F.size(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(w[i - 1], ' ', w[i]))"
                )
            )
        ).alias("n_bi_distinct"),
    ).filter(F.col("n_tok") >= 2)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum(F.col("n_tok") - F.col("n_distinct"))
            .cast("long")
            .alias("repeated_tokens"),
            F.sum(F.col("n_bi") - F.col("n_bi_distinct"))
            .cast("long")
            .alias("repeated_bigrams"),
            F.sum(
                (
                    10 * (F.col("n_tok") - F.col("n_distinct"))
                    > 5 * F.col("n_tok")
                ).cast("int")
            )
            .cast("long")
            .alias("n_flagged_dup_tokens"),
            F.sum(
                (
                    10 * (F.col("n_bi") - F.col("n_bi_distinct"))
                    > 8 * F.col("n_bi")
                ).cast("int")
            )
            .cast("long")
            .alias("n_flagged_dup_bigrams"),
        )
        .orderBy("source")
    )


#: pruning-probe geometry: 10-bit dims -> 20-bit morton key, top-6-bit
#: buckets (64 tiles); query box on both dimensions
_ZP_BITS = 10
_ZP_BUCKETS_SHIFT = 2 * _ZP_BITS - 6
_ZP_BOX = (100, 199, 300, 399)  # x_lo, x_hi, y_lo, y_hi inclusive


def _zp_oracle() -> str:
    x_lo, x_hi, y_lo, y_hi = _ZP_BOX
    mk = morton_key_sql(
        f"(l_partkey % {1 << _ZP_BITS})",
        f"(l_orderkey % {1 << _ZP_BITS})",
        bits=_ZP_BITS,
    )
    return f"""
    WITH pts AS (
      SELECT l_partkey % {1 << _ZP_BITS} AS x,
             l_orderkey % {1 << _ZP_BITS} AS y,
             {mk} AS zkey
      FROM lineitem
    ),
    layouts AS (
      SELECT 'zorder' AS layout, zkey // {1 << _ZP_BUCKETS_SHIFT} AS bucket,
             x, y FROM pts
      UNION ALL
      SELECT 'linear', x // {1 << (_ZP_BITS - 6)}, x, y FROM pts
    ),
    per_bucket AS (
      SELECT layout, bucket,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN x BETWEEN {x_lo} AND {x_hi}
                       AND y BETWEEN {y_lo} AND {y_hi}
                      THEN 1 ELSE 0 END) AS n_match
      FROM layouts GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN min_x <= {x_hi} AND max_x >= {x_lo}
                          AND min_y <= {y_hi} AND max_y >= {y_lo}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_hit,
           CAST(SUM(CASE WHEN min_x <= {x_hi} AND max_x >= {x_lo}
                          AND min_y <= {y_hi} AND max_y >= {y_lo}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM per_bucket GROUP BY 1 ORDER BY 1
    """


@_spec(
    "zorder_pruning_stats",
    _zp_oracle(),
    "extension — layout-effectiveness probe for the Z-order operator "
    "(operators/zorder.py): bucket the fact table under (a) the Morton "
    "key and (b) a single-column linear layout, compute each bucket's "
    "min/max envelope (exactly the parquet footer statistics a file "
    "would carry), and count buckets/rows a 2-D box predicate must "
    "scan under each. The zorder row shows strictly fewer scanned "
    "rows — the measured justification for the layout rewrite. All "
    "integer bit arithmetic, no UDF",
)
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    x_lo, x_hi, y_lo, y_hi = _ZP_BOX
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.pmod("l_partkey", F.lit(1 << _ZP_BITS)).cast("long").alias("x"),
        F.pmod("l_orderkey", F.lit(1 << _ZP_BITS)).cast("long").alias("y"),
    ).withColumn(
        "zkey", morton_key(F.col("x"), F.col("y"), bits=_ZP_BITS)
    )
    layouts = pts.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"zkey div {1 << _ZP_BUCKETS_SHIFT}").alias("bucket"),
        "x",
        "y",
    ).unionByName(
        pts.select(
            F.lit("linear").alias("layout"),
            F.expr(f"x div {1 << (_ZP_BITS - 6)}").alias("bucket"),
            "x",
            "y",
        )
    )
    in_box = (
        F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
    )
    per_bucket = layouts.groupBy("layout", "bucket").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(in_box.cast("int")).alias("n_match"),
    )
    hit = (
        (F.col("min_x") <= x_hi)
        & (F.col("max_x") >= x_lo)
        & (F.col("min_y") <= y_hi)
        & (F.col("max_y") >= y_lo)
    )
    return (
        per_bucket.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(hit.cast("int")).cast("long").alias("n_buckets_hit"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matching"),
        )
        .orderBy("layout")
    )

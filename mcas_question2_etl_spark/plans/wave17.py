"""Wave-17 extension specs: Hilbert-curve layout keys (the
locality-optimal clustering order) and Fellegi-Sunter record-linkage
scoring over blocked candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import editjoin, hilbert
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "hilbert_curve_keys",
    hilbert.hilbert_oracle_sql(
        "customer", "c_custkey", "c_nationkey", "c_custkey, c_nationkey", 16
    ),
    "extension — Hilbert-curve clustering keys (operators/hilbert.py): "
    "the locality-optimal upgrade of zorder_morton_keys (consecutive "
    "keys are grid-ADJACENT cells, so a box query touches ~2x fewer "
    "contiguous key runs than under Morton — Moon et al. 2001, "
    "measured in pytest — i.e. fewer file-range seeks in a "
    "range-partitioned layout; the order Delta Liquid clustering "
    "defaults to). One aggregate-fold "
    "expression under codegen, zero shuffle; bit-identical across the "
    "Spark fold, the DuckDB recursive-CTE twin, and a pure-Python "
    "replay pinned in pytest together with the curve's defining "
    "bijectivity + unit-step-adjacency properties",
)
def hilbert_curve_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        hilbert.hilbert_key("c_custkey", "c_nationkey", 16).alias("hkey"),
    )


#: Fellegi-Sunter integer agreement weights (log-odds scaled x10, the
#: Splink/recordlinkage convention): exact arithmetic in any engine
_W = {
    "name_exact": 40,
    "name_fuzzy": 25,
    "nation_hit": 15,
    "nation_miss": -5,
    "seg_hit": 10,
    "seg_miss": -3,
    "bal_hit": 8,
    "bal_miss": -2,
}
_MATCH_T = 55

_FS_SCORE_SQL = f"""
      CASE WHEN dist = 0 THEN {_W['name_exact']} ELSE {_W['name_fuzzy']} END
      + CASE WHEN a_nation = b_nation THEN {_W['nation_hit']} ELSE {_W['nation_miss']} END
      + CASE WHEN a_seg = b_seg THEN {_W['seg_hit']} ELSE {_W['seg_miss']} END
      + CASE WHEN FLOOR(a_bal / 1000) = FLOOR(b_bal / 1000)
             THEN {_W['bal_hit']} ELSE {_W['bal_miss']} END
"""


@_spec(
    "fellegi_sunter_linkage",
    f"""
    WITH cands AS (
      SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
             levenshtein(a.c_name, b.c_name) AS dist,
             a.c_nationkey AS a_nation, b.c_nationkey AS b_nation,
             a.c_mktsegment AS a_seg, b.c_mktsegment AS b_seg,
             a.c_acctbal AS a_bal, b.c_acctbal AS b_bal
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    scored AS (
      SELECT a_id, b_id, CAST({_FS_SCORE_SQL} AS INTEGER) AS score
      FROM cands
    )
    SELECT score, score >= {_MATCH_T} AS is_match,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(a_id + b_id) AS BIGINT) AS sum_keys
    FROM scored GROUP BY 1, 2
    """,
    "extension — Fellegi-Sunter probabilistic record linkage (1969; "
    "the Splink decision model): blocked candidates from the "
    "exact-recall deletion-neighborhood join (operators/editjoin.py) "
    "scored with per-field integer agreement/disagreement weights — "
    "name edit distance, nation, segment, balance band — and "
    "thresholded into match verdicts. Integer weights keep the oracle "
    "exact; the oracle re-scores the brute-force candidate set, so "
    "equality also re-proves blocking recall. At scale the expensive "
    "part stays the candidate join; scoring is a scan-stage CASE chain",
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pairs = editjoin.edit_distance_pairs(cust, "c_custkey", "c_name")
    attrs = cust.select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    cands = (
        pairs.join(
            attrs.select(
                F.col("c_custkey").alias("a_id"),
                F.col("c_nationkey").alias("a_nation"),
                F.col("c_mktsegment").alias("a_seg"),
                F.col("c_acctbal").alias("a_bal"),
            ),
            "a_id",
        )
        .join(
            attrs.select(
                F.col("c_custkey").alias("b_id"),
                F.col("c_nationkey").alias("b_nation"),
                F.col("c_mktsegment").alias("b_seg"),
                F.col("c_acctbal").alias("b_bal"),
            ),
            "b_id",
        )
    )
    scored = cands.select(
        "a_id", "b_id", F.expr(_FS_SCORE_SQL).cast("int").alias("score")
    )
    return scored.groupBy(
        "score", (F.col("score") >= _MATCH_T).alias("is_match")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("a_id") + F.col("b_id")).alias("sum_keys"),
    )

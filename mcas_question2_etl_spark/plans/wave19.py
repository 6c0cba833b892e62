"""Wave-19 extension specs: chi-square independence test (source x
lang contingency), per-group heavy hitters, and null-safe join
semantics (<=> / IS NOT DISTINCT FROM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "chi_square_source_lang",
    """
    WITH obs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    row_tot AS (SELECT source, SUM(o) AS r FROM obs GROUP BY 1),
    col_tot AS (SELECT lang, SUM(o) AS c FROM obs GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM obs),
    grid AS (
      SELECT rt.source, ct.lang, COALESCE(obs.o, 0) AS o,
             CAST(rt.r AS DOUBLE) * ct.c / t.n AS e
      FROM row_tot rt CROSS JOIN col_tot ct CROSS JOIN tot t
      LEFT JOIN obs ON obs.source = rt.source AND obs.lang = ct.lang
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           SUM((o - e) * (o - e) / e) AS chi2,
           CAST((SELECT COUNT(*) FROM row_tot) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM col_tot) - 1 AS BIGINT) AS dof
    FROM grid
    """,
    "extension — Pearson chi-square independence test over the "
    "source x lang contingency table: is language mix independent of "
    "crawl source (if not, per-source language rebalancing is needed "
    "before mixing). The contingency table is ONE aggregation over "
    "the corpus; marginals and expecteds derive from that tiny table; "
    "the full grid (incl. zero cells, which a naive join would drop) "
    "comes from the marginal cross join. Complements welch_ttest "
    "(means) with the categorical-association test",
)
def chi_square_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialize the tiny contingency table: marginals/totals/grid all
    # reuse it, and without the checkpoint each re-scans the corpus
    obs = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    row_tot = obs.groupBy("source").agg(F.sum("o").alias("r"))
    col_tot = obs.groupBy("lang").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        row_tot.crossJoin(F.broadcast(col_tot))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("r").cast("double") * F.col("c") / F.col("n")).alias("e"),
        )
    )
    n_rows = row_tot.agg(F.count(F.lit(1)).alias("nr"))
    n_cols = col_tot.agg(F.count(F.lit(1)).alias("nc"))
    return (
        grid.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(
                (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
            ).alias("chi2"),
        )
        .crossJoin(F.broadcast(n_rows))
        .crossJoin(F.broadcast(n_cols))
        .select(
            "n_cells",
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        )
    )


@_spec(
    "top_tokens_per_source",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1, 2
    )
    SELECT source, term, cnt,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY cnt DESC, term) AS rnk
      FROM counts
    ) WHERE rnk <= 3
    """,
    "extension — per-GROUP heavy hitters: top-3 tokens per source via "
    "rank-limited window over the AGGREGATED (source, term) counts. "
    "Spark plans the rn<=3 filter as WindowGroupLimit, so each "
    "partition keeps a 3-row heap instead of sorting its whole vocab "
    "slice — the grouped analogue of zipf_token_ranks (global) and "
    "heavy_hitters_users (sketch-verified). One explode shuffle with "
    "map-side combine; the window runs over vocab-sized data",
)
def top_tokens_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("source", "term", "cnt", "rnk")
    )


@_spec(
    "null_safe_join_semantics",
    """
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 5 END AS k
      FROM orders
    ),
    r AS (
      SELECT CASE WHEN v = 9 THEN NULL ELSE v END AS k,
             CASE WHEN v = 9 THEN 'null-bucket' ELSE 'mod-' || v END AS label
      FROM (SELECT unnest([0, 1, 2, 3, 4, 9]) AS v)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1
    """,
    "extension — null-safe equi-join (Spark's <=> / eqNullSafe, SQL's "
    "IS NOT DISTINCT FROM): NULL keys MATCH each other instead of "
    "vanishing, the semantics CDC/entity pipelines need when NULL is "
    "a real category (unknown region, missing parent). Catalyst "
    "plans <=> as a hash join on a null-tolerant key — still an "
    "equi-join, no nested loop; a plain = join would silently drop "
    "every seventh row here, which is exactly the bug class this "
    "operator removes",
)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    left = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderkey") % 5
        ).alias("k"),
    )
    right = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,), (9,)], "v long"
    ).select(
        F.when(F.col("v") == 9, F.lit(None)).otherwise(F.col("v")).alias("k"),
        F.when(F.col("v") == 9, F.lit("null-bucket"))
        .otherwise(F.concat(F.lit("mod-"), F.col("v").cast("string")))
        .alias("label"),
    )
    joined = left.join(F.broadcast(right), left["k"].eqNullSafe(right["k"]))
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
    )

"""Wave-42 extension specs: association rules, naive-Bayes source
confusion, HITS authorities, label-propagation communities, token
diversity.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's market-basket, text-classification, graph,
and corpus-profiling surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import assoc, community, entropy, graph_metrics, nbayes
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "copurchase_association_rules",
    assoc.association_rules_sql("lineitem", "l_orderkey", "l_partkey"),
    "basket op — Agrawal-Srikant pair rules (support/confidence/lift) "
    "over order baskets: basket-level exact-bigint supports, "
    "max_group clique guard on the self-join, single final divisions "
    "so no float accumulation anywhere.",
)
def copurchase_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return assoc.association_rules(li, "l_orderkey", "l_partkey")


@_spec(
    "nbayes_source_confusion",
    nbayes.nbayes_confusion_sql(),
    "text-ml op — add-one multinomial naive Bayes trained on "
    "(source, token) counts, resubstitution confusion matrix of the "
    "argmax: per-(doc,label) scores are EXACT decimal sums of "
    "once-cast DECIMAL(20,12) log-probs (argmax never rides float "
    "accumulation order), unseen-token mass factored into a per-label "
    "constant so the broadcast join stays vocabulary-sized.",
)
def nbayes_source_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return nbayes.nbayes_confusion(docs)


_HITS_EDGES_CTE = """
    e AS MATERIALIZED (
      SELECT o.o_custkey AS hub, l.l_suppkey AS auth,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )"""


@_spec(
    "hits_supplier_authority",
    graph_metrics.hits_authorities_sql(_HITS_EDGES_CTE, rounds=2),
    "graph op — HITS authority scores on the weighted customer -> "
    "supplier purchase graph, 2 unrolled un-normalized rounds: every "
    "score stays an exact integer-valued DECIMAL(38,0) (matmul-by-"
    "join, order-free), one normalization by max at the end in "
    "double on bit-identical inputs.",
)
def hits_supplier_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("hub"), F.col("l_suppkey").alias("auth")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return graph_metrics.hits_authorities(edges, rounds=2)


_LPA_EDGES_CTE = """
    members AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ), bounded AS MATERIALIZED (
      SELECT g, item FROM members
      WHERE g IN (SELECT g FROM members GROUP BY g
                  HAVING COUNT(*) <= 8)
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT a.item AS a, b.item AS b
      FROM bounded a JOIN bounded b ON a.g = b.g AND a.item < b.item
    )"""


@_spec(
    "lpa_copurchase_communities",
    community.label_propagation_sql(_LPA_EDGES_CTE, rounds=2),
    "graph op — deterministic synchronous label propagation (modal "
    "neighbor label, ties count-desc-then-label-asc) on the "
    "co-purchase graph, 2 unrolled rounds: per round one symmetric-"
    "edge join + (node,label) count + per-node top-1 window over "
    "distinct neighbor labels; community-size rollup output.",
)
def lpa_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_metrics.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return community.label_propagation(edges, rounds=2)


@_spec(
    "token_diversity_by_source",
    entropy.token_diversity_by_source_sql(),
    "corpus-profiling op — per-source Hill-number diversity: raw "
    "vocab (q=0) and inverse-Simpson effective vocab (q=2) as a "
    "ratio of exact bigint moments (no ln, no rounding), template-"
    "dominance tripwire; one vocab-sized count aggregation.",
)
def token_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return entropy.token_diversity_by_source(docs)

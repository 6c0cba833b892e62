"""Wave-22 extension specs: hierarchy transitive closure (the
recursive-CTE workload) and GROUPING SETS multi-grain reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.closure import transitive_closure
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: synthetic category forest over parts: parent(p) = p // 7 for p > 0
#: (root 0), depth ~ log7(n) — a realistic shallow-wide hierarchy
_EDGE_SQL = "SELECT p_partkey AS child, p_partkey // 7 AS parent FROM part WHERE p_partkey > 0"


@_spec(
    "hierarchy_closure_rollup",
    f"""
    WITH RECURSIVE e AS ({_EDGE_SQL}),
    reach(ancestor, descendant, depth) AS (
      SELECT parent, child, 1 FROM e
      UNION
      SELECT e.parent, r.descendant, r.depth + 1
      FROM reach r JOIN e ON e.child = r.ancestor
    ),
    closure AS (
      SELECT ancestor, descendant, MIN(depth) AS depth
      FROM reach GROUP BY 1, 2
    )
    SELECT CAST(depth AS INTEGER) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ancestor) AS BIGINT) AS sum_anc,
           CAST(SUM(descendant) AS BIGINT) AS sum_desc
    FROM closure GROUP BY 1
    """,
    "extension — transitive closure (operators/closure.py): the "
    "recursive-CTE workload Spark lacks natively, as iterative "
    "frontier expansion (depth joins over (node,node,depth) triples, "
    "localCheckpoint per round, explicit non-drained guard). The "
    "closure table answers roll-up-to-any-ancestor-level with one "
    "join — org charts, BOM explosion, category trees. Oracle is "
    "DuckDB's native WITH RECURSIVE over the same synthetic forest; "
    "agreement proves the iteration = the fixpoint semantics",
)
def hierarchy_closure_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    edges = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("child"),
        (F.col("p_partkey") / 7).cast("long").alias("parent"),
    )
    closure = transitive_closure(edges)
    return closure.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("ancestor").alias("sum_anc"),
        F.sum("descendant").alias("sum_desc"),
    )


@_spec(
    "grouping_sets_report",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grp_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "extension — GROUPING SETS multi-grain reporting: detail, "
    "subtotal, and grand-total grains in ONE aggregation pass "
    "(Spark expands the sets into a single Expand+Aggregate — one "
    "scan, one shuffle — where naive SQL would union three "
    "aggregations = three scans). GROUPING() disambiguates real "
    "NULLs from subtotal rows; DECIMAL sum keeps the measure exact "
    "across engines. Complements the rollup_totals / cube_grouping "
    "specs with the explicit-sets form",
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                 AS grp_id,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )

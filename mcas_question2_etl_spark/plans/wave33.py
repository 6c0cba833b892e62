"""Wave-33 extension spec: IPF raking of the source x lang table to
uniform margins (survey-weighting / mixture-balancing primitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.raking import ipf_fit_uniform, ipf_fit_uniform_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_ITERS = 4


@_spec(
    "ipf_raking_weights",
    f"""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS w
      FROM documents GROUP BY 1, 2
    ),
    {ipf_fit_uniform_sql('cells', 'source', 'lang', _ITERS)}
    """,
    "extension — iterative proportional fitting / raking "
    "(operators/raking.py, Deming-Stephan): adjust the source x lang "
    "cell weights until BOTH margins are uniform — the "
    "survey-weighting primitive, and the principled way to balance a "
    "training mixture on two attributes at once (temperature_sample "
    "balances one). Fixed 4-round unrolled fixpoint (the k-means/"
    "PageRank determinism discipline); margins are tiny broadcast "
    "aggregations, cells aggregate from the corpus ONCE. Oracle = "
    "the same rounds unrolled as CTEs",
)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("w"))
    return ipf_fit_uniform(cells, "source", "lang", "w", _ITERS)

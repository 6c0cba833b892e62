"""Wave-58 extension specs: Bradley-Terry ratings, position-based
attribution, conversion paths, synthetic-control effect, price
indices.

Reference scope: all beyond-reference (SURVEY §2.13) — BT extends the
ranking family with strength-of-opposition, the attribution/path ops
complete the marketing journey family, synthetic control completes
the causal family, price indices add the econ view of the orders
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import attribution, econ, markov, pairwise, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_BT_PAIRS_SQL = """
SELECT a.l_suppkey AS i, b.l_suppkey AS j,
       CAST(SUM(CASE WHEN a.l_shipdate < b.l_shipdate THEN 1 ELSE 0 END)
            AS BIGINT) AS wins_i,
       CAST(SUM(CASE WHEN b.l_shipdate < a.l_shipdate THEN 1 ELSE 0 END)
            AS BIGINT) AS wins_j
FROM lineitem a
JOIN lineitem b ON b.l_orderkey = a.l_orderkey
               AND a.l_suppkey < b.l_suppkey
WHERE a.l_shipdate <> b.l_shipdate
GROUP BY 1, 2
"""


@_spec(
    "bradley_terry_suppliers",
    pairwise.bradley_terry_ratings_sql(_BT_PAIRS_SQL),
    "ranking op — Bradley-Terry supplier speed ratings from head-to-"
    "head ship-date outcomes within shared orders (ties excluded): "
    "exact bigint pair aggregates, 6 unrolled MM rounds with mean-1 "
    "normalization (same fixed-iteration discipline as IPF/Markov), "
    "final ratings rounded 6dp.",
)
def bradley_terry_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # in-array pair expansion: ONE shuffle on the order key, then the
    # O(k^2) games expand inside each order's tiny line array — no
    # sorted self-join of the fact table (k = lines/order ~ 4..7)
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_suppkey").alias("s"), F.col("l_shipdate").alias("d"))
        ).alias("items")
    )
    games = per_order.select(
        F.explode(
            F.expr(
                """
                filter(
                  flatten(transform(items,
                    x -> transform(items, y -> struct(x AS a, y AS b)))),
                  p -> p.a.s < p.b.s AND p.a.d != p.b.d)
                """
            )
        ).alias("g")
    )
    pairs = (
        games.select(
            F.col("g.a.s").alias("i"),
            F.col("g.b.s").alias("j"),
            (F.col("g.a.d") < F.col("g.b.d")).cast("long").alias("w"),
        )
        .groupBy("i", "j")
        .agg(
            F.sum("w").cast("bigint").alias("wins_i"),
            (F.count(F.lit(1)) - F.sum("w")).cast("bigint").alias("wins_j"),
        )
    )
    return pairwise.bradley_terry_ratings(pairs)


@_spec(
    "position_based_attribution",
    attribution.position_based_attribution_sql(),
    "marketing op — U-shaped 40/20/40 multi-touch attribution over "
    "click/view touches within a 72h lookback of each purchase: "
    "(ts, event_id)-deterministic position ranks, fixed IEEE credit "
    "fractions, per-type credit sums rounded 6dp; extends "
    "last_touch_attribution.",
)
def position_based_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return attribution.position_based_attribution(events)


@_spec(
    "paths_to_purchase",
    markov.paths_to_conversion_sql(),
    "journey op — top depth-3 event paths immediately preceding each "
    "purchase ('a>b>c' strings, (ts, event_id)-deterministic, "
    "concat_ws NULL-skipping identical in both engines), counts >= "
    "5; the sequence complement to the transition matrix.",
)
def paths_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return markov.paths_to_conversion(events)


@_spec(
    "synthetic_control_effect",
    timeseries.synthetic_control_effect_sql(),
    "causal op — scaled-control counterfactual between corpus time "
    "halves (purchase vs signup volumes): exact bigint half totals, "
    "single IEEE ratio/effect expressions, zero rounding; the "
    "placebo expectation on unperturbed data is effect ~ 0.",
)
def synthetic_control_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.synthetic_control_effect(events)


@_spec(
    "price_index_halves",
    econ.price_index_halves_sql(
        "lineitem", "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    ),
    "econ op — Laspeyres/Paasche/Fisher price indices between corpus "
    "time halves over parts sold in both: DECIMAL-exact spends and "
    "bigint quantities, exact-input unit prices, basket sums rounded "
    "6dp before the index ratios.",
)
def price_index_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return econ.price_index_halves(
        li, "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    )

"""Wave-47 extension specs: shoelace area/centroid, burstiness,
inter-arrival profile, degree assortativity, quantile normalization.

Reference scope: the shoelace op extends the reference's GIS surface
(dags/district_gis_etl.py measures shapes implicitly via GeoPandas);
the rest have no analogue (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import encoding, graph_metrics, spatial, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: same synthetic shape fixture as geo_reproject_validity
#: (plans/ml_geo_media.py): 1 km squares per nation, every 7th a
#: zero-area ring, every 11th a self-intersecting bowtie.
_SHAPES_CTE = """
    shapes AS (
      SELECT n_nationkey,
             CASE
               WHEN n_nationkey % 7 = 0 THEN
                 printf('POLYGON ((%d %d, %d %d, %d %d, %d %d))',
                        x0, y0, x0, y0, x0, y0, x0, y0)
               WHEN n_nationkey % 11 = 0 THEN
                 printf('POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))',
                        x0, y0, x0 + 1000, y0 + 1000, x0 + 1000, y0,
                        x0, y0 + 1000, x0, y0)
               ELSE
                 printf('POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))',
                        x0, y0, x0 + 1000, y0, x0 + 1000, y0 + 1000,
                        x0, y0 + 1000, x0, y0)
             END AS wkt
      FROM (SELECT n_nationkey,
                   n_nationkey * 5000 + 200000 AS x0,
                   n_nationkey * 4000 + 750000 AS y0
            FROM nation)
    )"""


@_spec(
    "shoelace_area_centroid",
    spatial.shoelace_area_centroid_sql(_SHAPES_CTE),
    "geo op — polygon doubled-signed-area and centroid via the "
    "shoelace formula as pure higher-order array expressions over "
    "integer WKT coordinates (exact bigint cross terms, centroid one "
    "division of exact ints; degenerate/bowtie rings yield area2 = 0 "
    "and NULL centroid); zero shuffle, whole-stage codegen.",
)
def shoelace_area_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    x0 = F.col("n_nationkey") * 5000 + 200000
    y0 = F.col("n_nationkey") * 4000 + 750000
    valid_wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        x0, y0, x0 + 1000, y0, x0 + 1000, y0 + 1000, x0, y0 + 1000, x0, y0,
    )
    degenerate_wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d))", x0, y0, x0, y0, x0, y0, x0, y0
    )
    bowtie_wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        x0, y0, x0 + 1000, y0 + 1000, x0 + 1000, y0, x0, y0 + 1000, x0, y0,
    )
    shapes = nation.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 7 == 0, degenerate_wkt)
        .when(F.col("n_nationkey") % 11 == 0, bowtie_wkt)
        .otherwise(valid_wkt)
        .alias("wkt"),
    )
    return spatial.shoelace_area_centroid(shapes, "wkt")


@_spec(
    "user_burstiness_histogram",
    timeseries.user_burstiness_histogram_sql(),
    "behavioral op — Goh-Barabasi burstiness B = (sigma-mu)/(sigma+mu) "
    "per user from exact integer-micros gap moments (B is one IEEE "
    "expression on identical inputs; the 10-bucket floor cannot "
    "flip), bot-vs-human activity fingerprint; one user-keyed "
    "shuffle + 10-row rollup.",
)
def user_burstiness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.user_burstiness_histogram(events)


@_spec(
    "interarrival_profile",
    timeseries.interarrival_profile_sql(),
    "capacity op — per-event-type arrival profile: exact-bigint mean "
    "gap and an explicit element-pick lower median (row_number "
    "rank = (n+1) div 2, never an interpolating percentile that "
    "rounds differently across engines); two group-keyed shuffles.",
)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.interarrival_profile(events)


_EDGES_CTE = """
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
    "copurchase_assortativity",
    graph_metrics.degree_assortativity_sql(_EDGES_CTE),
    "graph op — Newman degree assortativity of the co-purchase "
    "graph: endpoint-degree Pearson over the symmetric edge list "
    "with all five moments in exact DECIMAL(38,0) (order-free), one "
    "IEEE final expression, no rounding; one degree aggregation + "
    "two node-id equi-joins.",
)
def copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_metrics.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return graph_metrics.degree_assortativity(edges)


@_spec(
    "quantile_normalize_doclen",
    encoding.quantile_normalize_sql("documents", "source", "n_chars", "doc_id"),
    "preprocessing op — quantile normalization of document lengths "
    "across sources (batch-effect correction): within-group rank -> "
    "pooled position via EXACT integer index math (1 + (r-1)(N-1) "
    "div (n_g-1), no float quantile boundary), pooled map built with "
    "the distributed two-phase global rank.",
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return encoding.quantile_normalize(docs, "source", "n_chars", "doc_id")

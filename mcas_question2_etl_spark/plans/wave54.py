"""Wave-54 extension specs: haversine nearest-neighbor join, frequent
triples, cohort LTV curve, fingerprint clustering, partition-skew
report.

Reference scope: the NN join extends the geo family (G1-G3,
dags/district_gis_etl.py's spatial layer) with the nearest-facility
assignment; fingerprint clustering is the data-cleaning pass the
reference's school-name munging implies; the rest are beyond-
reference BI/ops analytics (SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import assoc, profiling, segmentation, spatial, text
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# Deterministic synthetic coordinates (no lat/lon in the star schema):
# integer modular spreads, exact halves — identical in both engines.
_CLAT = "((c_custkey * 37) % 120) / 2.0 - 30"
_CLON = "((c_custkey * 73) % 720) / 2.0 - 180"
_SLAT = "((s_suppkey * 41) % 120) / 2.0 - 30"
_SLON = "((s_suppkey * 79) % 720) / 2.0 - 180"


@_spec(
    "haversine_nearest_supplier",
    f"""
    WITH p AS (SELECT c_custkey, {_CLAT} AS lat, {_CLON} AS lon
               FROM customer),
    s AS (SELECT s_suppkey, {_SLAT} AS lat, {_SLON} AS lon FROM supplier),
    scored AS (
      SELECT p.c_custkey, s.s_suppkey,
             ROUND({spatial.haversine_m_sql("p.lat", "p.lon", "s.lat", "s.lon")},
                   6) AS d
      FROM p CROSS JOIN s
    )
    SELECT c_custkey,
           MIN(s_suppkey) FILTER (WHERE d = md) AS s_suppkey,
           MIN(md) AS distance_m
    FROM (SELECT *, MIN(d) OVER (PARTITION BY c_custkey) AS md FROM scored)
    GROUP BY c_custkey
    """,
    "spatial op — haversine nearest-supplier assignment per customer "
    "over deterministic synthetic coordinates: broadcast site "
    "dimension (points never shuffle), 6dp-rounded distances so a "
    "last-ulp trig difference cannot flip the winner, min_by with "
    "site-id tie-break.",
)
def haversine_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    points = cust.select(
        "c_custkey",
        F.expr(_CLAT).alias("lat"),
        F.expr(_CLON).alias("lon"),
    )
    sites = supp.select(
        "s_suppkey",
        F.expr(_SLAT).alias("lat"),
        F.expr(_SLON).alias("lon"),
    )
    return spatial.nearest_neighbor_join(points, sites, "c_custkey", "s_suppkey")


@_spec(
    "haversine_nn_bucketed",
    f"""
    WITH p AS (SELECT c_custkey, {_CLAT} AS lat, {_CLON} AS lon
               FROM customer),
    s AS (SELECT s_suppkey, {_SLAT} AS lat, {_SLON} AS lon FROM supplier),
    scored AS (
      SELECT p.c_custkey, s.s_suppkey,
             ROUND({spatial.haversine_m_sql("p.lat", "p.lon", "s.lat", "s.lon")},
                   6) AS d
      FROM p CROSS JOIN s
    )
    SELECT c_custkey,
           MIN(s_suppkey) FILTER (WHERE d = md) AS s_suppkey,
           MIN(md) AS distance_m
    FROM (SELECT *, MIN(d) OVER (PARTITION BY c_custkey) AS md FROM scored)
    GROUP BY c_custkey
    """,
    "spatial op (round 4, VERDICT r3 #6) — grid-bucketed haversine "
    "nearest-neighbor join: the scale path when sites exceed broadcast "
    "size. Sites explode x9 onto a 15-degree cell neighborhood (with "
    "longitude wrap); ONE shuffle equi-join on the cell id replaces "
    "the cross join; each winner is certified against a provable "
    "lower bound on any outside-block site's distance, with the "
    "uncertified tail falling back to the exact scan. The oracle is "
    "the same exact-NN SQL as haversine_nearest_supplier — the "
    "bucketed plan must produce IDENTICAL assignments (equality also "
    "pinned against the broadcast form in tests/test_wave54.py).",
)
def haversine_nn_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    points = cust.select(
        "c_custkey",
        F.expr(_CLAT).alias("lat"),
        F.expr(_CLON).alias("lon"),
    )
    sites = supp.select(
        "s_suppkey",
        F.expr(_SLAT).alias("lat"),
        F.expr(_SLON).alias("lon"),
    )
    return spatial.nearest_neighbor_join_bucketed(
        points, sites, "c_custkey", "s_suppkey"
    )


@_spec(
    "event_triple_patterns",
    assoc.frequent_triples_sql(
        "SELECT user_id, CAST(ts AS DATE) AS d, event_type FROM events",
        ["user_id", "d"],
        "event_type",
    ),
    "behavior op — Apriori level-3: unordered event-type TRIPLES "
    "co-present in a (user, day) basket with support >= 2: distinct "
    "basket-item reduction first, 3-way self-equi-join with an "
    "ordering chain (C(k,3) per basket, k <= taxonomy size); the set "
    "complement of wave-39's sequence trigrams.",
)
def event_triple_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = events.select(
        "user_id", F.col("ts").cast("date").alias("d"), "event_type"
    )
    return assoc.frequent_triples(b, ["user_id", "d"], "event_type")


@_spec(
    "cohort_ltv_curve",
    segmentation.cohort_ltv_curve_sql(),
    "BI op — cohort lifetime-value triangle: users cohorted by first-"
    "activity month, cumulative value at each month-since: exact "
    "integer month arithmetic, monthly sums rounded 6dp BEFORE the "
    "ordered cumulative window so running totals are bit-identical; "
    "the unit-economics companion to cohort_retention_matrix.",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return segmentation.cohort_ltv_curve(events)


@_spec(
    "part_fingerprint_clusters",
    text.fingerprint_clusters_sql(
        """(SELECT p_partkey AS id, p_name AS name FROM part
            UNION ALL
            SELECT p_partkey + 1000000000 AS id, upper(p_name) AS name
            FROM part WHERE p_partkey % 10 = 0)""",
        "id",
        "name",
    ),
    "cleaning op — OpenRefine fingerprint clustering (sorted distinct "
    "lowercase token key) over part names with deterministic case-"
    "variant rows planted (every 10th part uppercased): clusters = "
    "keys with >= 2 distinct raw spellings; scan-stage expressions, "
    "fingerprints shuffle, never raw strings twice.",
)
def part_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    base = part.select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    )
    variants = (
        part.where(F.col("p_partkey") % 10 == 0)
        .select(
            (F.col("p_partkey") + 1000000000).alias("id"),
            F.upper(F.col("p_name")).alias("name"),
        )
    )
    return text.fingerprint_clusters(base.unionByName(variants), "id", "name")


@_spec(
    "partition_skew_report",
    profiling.partition_skew_report_sql("events", "user_id"),
    "engine-ops op — shuffle-partition skew diagnosis for the "
    "events.user_id key: portable md5 bucketing (stand-in for the "
    "hash partitioner), per-bucket load, hot-key-vs-hot-bucket "
    "distinction (top_key_rows), max/avg skew ratio; exact integers, "
    "one division.",
)
def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return profiling.partition_skew_report(events, "user_id")

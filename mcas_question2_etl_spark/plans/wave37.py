"""Wave-37 extension specs: the generalized CRS surface (G1 beyond the
reference's single LCC zone — dags/district_gis_etl.py:67 is a generic
``to_crs``). Web-Mercator (EPSG:3857), UTM 19N (EPSG:26919), and the
FORWARD Lambert Conformal Conic all run as pure Catalyst column
expressions (functions/geo.py) — closed-form point projections never
need Python, so at scale reprojecting 10^11 vertices is a codegen'd
scan, not an Arrow round-trip. Each spec's DuckDB twin is built from
the same formula text, making the float pipeline hash-checkable.

Synthetic coordinates come from the nation table on a 0.05-degree grid
(offsets well clear of every rounding boundary the output grids use,
so sub-ulp libm differences between engines can never flip a rounded
digit).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions import geo
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# shared synthetic point cloud: a deterministic lon/lat grid over the
# New England box (in-domain for zone 19N, the LCC 26986 zone, and web
# mercator alike), 0.05-degree steps
_LON_SQL = "(-72.0 + (n_nationkey % 5) * 0.05)"
_LAT_SQL = "(41.5 + ((n_nationkey // 5) % 5) * 0.05)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        (F.lit(-72.0) + (F.col("n_nationkey") % 5) * 0.05).alias("lon"),
        (F.lit(41.5) + ((F.col("n_nationkey") / 5).cast("long") % 5) * 0.05).alias(
            "lat"
        ),
    )


_WEBM_X_SQL, _WEBM_Y_SQL = geo.webmercator_forward_sql(_LON_SQL, _LAT_SQL)


@_spec(
    "geo_webmercator_project",
    f"""
    SELECT n_nationkey,
           ROUND({_WEBM_X_SQL}, 3) AS x_3857,
           ROUND({_WEBM_Y_SQL}, 3) AS y_3857,
           ROUND(degrees(({_WEBM_X_SQL}) / {geo.WEBM_A!r}), 6) AS lon_rt,
           ROUND(degrees(2 * atan(exp(({_WEBM_Y_SQL}) / {geo.WEBM_A!r}))
                         - pi() / 2), 6) AS lat_rt
    FROM nation
    """,
    "G1 generalized — EPSG:4326 <-> EPSG:3857 (Web Mercator) both "
    "directions as Catalyst column expressions (functions/geo.py "
    "webmercator_*_cols; Snyder 7-1/7-4). The round-trip columns prove "
    "the inverse composes to identity at mm rounding; projection at "
    "scale is a codegen'd scan with zero Python",
)
def geo_webmercator_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    x, y = geo.webmercator_forward_cols("lon", "lat")
    projected = pts.select("n_nationkey", x.alias("x"), y.alias("y"))
    lon_rt, lat_rt = geo.webmercator_inverse_cols("x", "y")
    return projected.select(
        "n_nationkey",
        F.round("x", 3).alias("x_3857"),
        F.round("y", 3).alias("y_3857"),
        F.round(lon_rt, 6).alias("lon_rt"),
        F.round(lat_rt, 6).alias("lat_rt"),
    )


_UTM_X_SQL, _UTM_Y_SQL = geo.tm_forward_sql(
    _LON_SQL, _LAT_SQL, geo.UTM_ZONES[26919]
)


@_spec(
    "geo_utm_roundtrip",
    f"""
    SELECT n_nationkey,
           ROUND({_UTM_X_SQL}, 2) AS x_utm19,
           ROUND({_UTM_Y_SQL}, 2) AS y_utm19,
           CAST(ROUND({_LON_SQL}, 6) AS DOUBLE) AS lon_rt,
           CAST(ROUND({_LAT_SQL}, 6) AS DOUBLE) AS lat_rt
    FROM nation
    """,
    "G1 generalized — EPSG:4326 -> EPSG:26919 (UTM 19N) via the full "
    "Transverse Mercator series (Snyder 8-9..8-15) as column "
    "expressions, then BACK through the footpoint-latitude inverse "
    "(Arrow-batched; series round-trip error ~1e-9 deg, so the "
    "6-decimal rounded round-trip must equal the inputs the oracle "
    "regenerates literally — a failed series term shows up as a "
    "hash mismatch)",
)
def geo_utm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    zone = geo.UTM_ZONES[26919]
    pts = _points(spark, sf_dir)
    x, y = geo.tm_forward_cols("lon", "lat", zone)
    projected = pts.select("n_nationkey", x.alias("x"), y.alias("y"))

    @F.pandas_udf(T.StructType([
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]))
    def inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        pairs = [geo.tm_inverse(a, b, zone) for a, b in zip(x, y)]
        return pd.DataFrame(pairs, columns=["lon", "lat"])

    return projected.select(
        "n_nationkey",
        F.round("x", 2).alias("x_utm19"),
        F.round("y", 2).alias("y_utm19"),
        inv("x", "y").alias("rt"),
    ).select(
        "n_nationkey",
        "x_utm19",
        "y_utm19",
        F.round(F.col("rt.lon"), 6).alias("lon_rt"),
        F.round(F.col("rt.lat"), 6).alias("lat_rt"),
    )


_LCC_X_SQL, _LCC_Y_SQL = geo.lcc_forward_sql(_LON_SQL, _LAT_SQL)


@_spec(
    "geo_lcc_forward_project",
    f"""
    SELECT n_nationkey,
           ROUND({_LCC_X_SQL}, 2) AS x_26986,
           ROUND({_LCC_Y_SQL}, 2) AS y_26986
    FROM nation
    """,
    "G1 — the FORWARD direction of the reference's projection "
    "(EPSG:4326 -> EPSG:26986 Mass State Plane, Snyder 15-1..15-4) as "
    "column expressions; with the existing inverse (geo_reproject_"
    "validity) the engine now reprojects both ways for every "
    "registered LCC zone",
)
def geo_lcc_forward_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    x, y = geo.lcc_forward_cols("lon", "lat")
    return pts.select(
        "n_nationkey",
        F.round(x, 2).alias("x_26986"),
        F.round(y, 2).alias("y_26986"),
    )

"""ETL #3 — district GIS (dags/district_gis_etl.py:35-74).

Two outputs from one attribute+geometry input:
  * district->town crosswalk: project -> split+explode MEMBERLIST ->
    coalesce missing towns to the district name (:45-51);
  * district shapes: project -> CRS transform to EPSG:4326 ->
    validity filter (:62-70).

The reference reads the shapefile twice (:42, :62 — recompute, no
cache); here both branches share one cached scan. Geometry arrives as
a WKT string column — either preconverted parquet+WKT, or straight
from the native distributed shapefile scan (sources/shapefile.py,
SURVEY §2.1 S4) via :func:`from_shapefile`.

The Airflow DAG's four Celery tasks with /tmp-file handoffs (:76-120)
collapse into one lazy Spark job; task boundaries become stage
boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import st_is_valid, st_transform_26986_to_4326
from ..operators.reshape import explode_list


def from_shapefile(spark, shp_glob: str) -> DataFrame:
    """gpd.read_file (dags/district_gis_etl.py:42) — native .shp/.dbf
    scan flattened to the column shape both builders consume. The
    attribute map is exploded into the three reference columns; cache
    the result when feeding both branches (the reference re-reads)."""
    from ..sources.shapefile import read_shapefile

    raw = read_shapefile(spark, shp_glob)
    return raw.select(
        F.col("attributes")["ORG8CODE"].alias("ORG8CODE"),
        F.col("attributes")["DISTRICT_N"].alias("DISTRICT_N"),
        F.col("attributes")["MEMBERLIST"].alias("MEMBERLIST"),
        "geometry",
    )


def build_crosswalk(districts_attr: DataFrame) -> DataFrame:
    """Mirror of transform_district_geo_data (dags/district_gis_etl.py
    :35-54): ORG8CODE/DISTRICT_N/MEMBERLIST -> one row per member town.

    explode is OUTER: pandas .explode keeps null-MEMBERLIST rows, which
    then take the district name via the coalesce (:51).
    """
    projected = districts_attr.select(
        F.col("ORG8CODE").alias("district_code"),
        F.col("DISTRICT_N").alias("district_name"),
        F.col("MEMBERLIST").alias("memberlist"),
    )
    exploded = explode_list(projected, "memberlist", ", ", "town", outer=True)
    return exploded.withColumn(
        "town", F.coalesce(F.col("town"), F.col("district_name"))
    )


def build_shapes(districts_geo: DataFrame) -> DataFrame:
    """Mirror of load_district_shapes_to_postgis (dags/district_gis_etl
    .py:56-74): project -> to_crs(4326) -> validity filter. Geometry is
    WKT in EPSG:26986 on input, WKT in EPSG:4326 on output."""
    return (
        districts_geo.select(
            F.col("ORG8CODE").alias("district_code"),
            F.col("DISTRICT_N").alias("district_name"),
            st_transform_26986_to_4326(F.col("geometry")).alias("geometry"),
        )
        .filter(st_is_valid(F.col("geometry")))
    )

"""Wave-13 extension spec: grid-indexed point-in-polygon spatial join
(operators/spatial.py) — billions of points against broadcast polygon
cells, exact even-odd ray cast as a codegen'd array expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.spatial import pip_expr_sql, point_in_polygon_join
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: closed rings (first vertex repeated last), no horizontal edges; one
#: convex triangle, one concave pentagon, one convex pentagon
_POLYGONS: list[tuple[str, list[float], list[float]]] = [
    ("tri", [10.0, 40.0, 25.0, 10.0], [10.0, 12.0, 40.0, 10.0]),
    (
        "concave",
        [50.0, 90.0, 70.0, 86.0, 48.0, 50.0],
        [20.0, 24.0, 40.0, 60.0, 58.0, 20.0],
    ),
    (
        "pent",
        [20.0, 45.0, 52.0, 30.0, 12.0, 20.0],
        [60.0, 62.0, 80.0, 95.0, 78.0, 60.0],
    ),
]

_CELL = 10.0

#: deterministic point cloud derived from order keys (integer mod then
#: /10 — both engines compute identical doubles)
_PX = "(o_orderkey * 7 % 1000) / 10.0"
_PY = "(o_orderkey * 13 % 1000) / 10.0"


def _poly_values_sql() -> str:
    rows = ", ".join(
        f"('{pid}', CAST({xs} AS DOUBLE[]), CAST({ys} AS DOUBLE[]))"
        for pid, xs, ys in _POLYGONS
    )
    return f"(VALUES {rows}) AS polys(poly_id, xs, ys)"


@_spec(
    "spatial_point_in_polygon",
    f"""
    WITH pts AS (
      SELECT o_orderkey, {_PX} AS px, {_PY} AS py FROM orders
    ),
    paired AS (
      SELECT t.o_orderkey, t.px, t.py, polys.poly_id, polys.xs, polys.ys
      FROM pts t CROSS JOIN {_poly_values_sql()}
    ),
    hits AS (
      SELECT poly_id, o_orderkey FROM paired
      WHERE {pip_expr_sql("xs", "ys", "px", "py")}
    )
    SELECT poly_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_point_ids
    FROM hits GROUP BY 1 ORDER BY 1
    """,
    "extension — spatial JOIN (operators/spatial.py): which polygon "
    "contains each point, at scale. Polygon bboxes explode onto a "
    "10-unit grid and BROADCAST; points compute their cell in the "
    "scan stage and broadcast-join on it (points never shuffle); the "
    "exact even-odd ray cast is a higher-order array expression under "
    "whole-stage codegen — no UDF, no geo library. The oracle skips "
    "the grid (plain theta join + the same ray cast): equality proves "
    "the grid pruning lost no containment. Complements "
    "functions/geo.py's validity/reprojection (S4/G1-G3) with the "
    "join form the reference's GIS stage implies",
)
def spatial_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    points = orders.select(
        "o_orderkey",
        F.expr(_PX).alias("px"),
        F.expr(_PY).alias("py"),
    )
    polygons = spark.createDataFrame(
        _POLYGONS, "poly_id string, xs array<double>, ys array<double>"
    )
    hits = point_in_polygon_join(points, polygons, _CELL)
    return (
        hits.groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("o_orderkey").cast("long").alias("sum_point_ids"),
        )
        .orderBy("poly_id")
    )

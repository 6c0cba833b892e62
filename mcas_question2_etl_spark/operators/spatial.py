"""Distributed spatial join: grid-indexed point-in-polygon, ray casting
as pure SQL expressions — no UDF, no geo library.

The reference's GIS stage tests point/shape containment implicitly via
GeoPandas (dags/district_gis_etl.py); `functions/geo.py` covers its
validity/reprojection semantics with pandas UDFs. This module adds the
JOIN form — "which polygon contains each of N billion points" — in the
shape that scales:

1. polygons (few, small) carry coordinate ARRAYS; their bounding boxes
   are exploded onto a fixed grid (one row per covered cell) and
   BROADCAST;
2. points compute their grid cell in the scan stage and join on the
   cell id — the only join, and it is broadcast, so points never
   shuffle;
3. the exact even-odd ray cast runs as a higher-order array expression
   (filter + CASE over the edge list) inside the same stage —
   whole-stage-codegen, not Python.

The ray cast is the textbook even-odd rule: count edges whose y-span
straddles the point and whose x-intercept at the point's y lies right
of the point. The edge test sits under a CASE guard so the intercept
division only evaluates on straddling edges (also how we stay safe
under ANSI division; fixtures avoid horizontal edges, which the guard
skips anyway). Both engines evaluate the identical arithmetic, so the
oracle matches exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pip_expr_spark(xs: str, ys: str, px: str, py: str) -> Column:
    """Even-odd point-in-polygon as a Spark higher-order expression.

    ``xs``/``ys`` name closed-ring coordinate array columns (first
    vertex repeated last); ``px``/``py`` name point columns. Spark
    arrays are 0-indexed: edges are (i, i+1) for i in 0..n-2.
    """
    return F.expr(
        f"""
        size(filter(sequence(0, size({xs}) - 2), i ->
          CASE WHEN ({ys}[i] > {py}) != ({ys}[i + 1] > {py})
               THEN {px} < {xs}[i] + ({xs}[i + 1] - {xs}[i])
                          * ({py} - {ys}[i]) / ({ys}[i + 1] - {ys}[i])
               ELSE false END)) % 2 = 1
        """
    )


def pip_expr_sql(xs: str, ys: str, px: str, py: str) -> str:
    """DuckDB twin of :func:`pip_expr_spark` (1-indexed lists)."""
    return f"""
        len(list_filter(range(1, len({xs})), i ->
          CASE WHEN ({ys}[i] > {py}) != ({ys}[i + 1] > {py})
               THEN {px} < {xs}[i] + ({xs}[i + 1] - {xs}[i])
                          * ({py} - {ys}[i]) / ({ys}[i + 1] - {ys}[i])
               ELSE false END)) % 2 = 1
    """


def polygon_grid_cells(polygons: DataFrame, cell: float) -> DataFrame:
    """Explode each polygon's bounding box onto grid cells: one row per
    (poly_id, cx, cy) the bbox covers. Polygons are few; the result is
    the small broadcast side of the spatial join."""
    return polygons.select(
        "poly_id",
        "xs",
        "ys",
        F.explode(
            F.sequence(
                F.floor(F.array_min("xs") / cell),
                F.floor(F.array_max("xs") / cell),
            )
        ).alias("cx"),
    ).select(
        "poly_id",
        "xs",
        "ys",
        "cx",
        F.explode(
            F.sequence(
                F.floor(F.array_min("ys") / cell),
                F.floor(F.array_max("ys") / cell),
            )
        ).alias("cy"),
    )


def point_in_polygon_join(
    points: DataFrame, polygons: DataFrame, cell: float
) -> DataFrame:
    """(point columns..., poly_id) for every point inside a polygon.

    ``points`` needs double columns px, py; ``polygons`` needs poly_id
    and closed-ring double arrays xs, ys. Exact even-odd containment;
    the grid prunes the candidate set and the polygon side broadcasts.
    """
    cells = polygon_grid_cells(polygons, cell)
    pts = points.withColumn(
        "cx", F.floor(F.col("px") / cell)
    ).withColumn("cy", F.floor(F.col("py") / cell))
    return (
        pts.join(F.broadcast(cells), ["cx", "cy"])
        .filter(pip_expr_spark("xs", "ys", "px", "py"))
        .drop("cx", "cy", "xs", "ys")
    )


def shoelace_area_centroid(
    df: DataFrame,
    wkt_col: str,
    id_cols: Sequence[str] = ("n_nationkey",),
) -> DataFrame:
    """Polygon area + centroid via the shoelace formula as pure
    higher-order array expressions over integer WKT coordinates — the
    measurement step after validity/reprojection in any GIS pipeline,
    kept UDF-free so it rides whole-stage codegen.

    With integer coordinates every cross term x_i*y_{i+1} -
    x_{i+1}*y_i is an exact bigint, so the doubled signed area
    ``area2`` is exact and the centroid is a single division of exact
    bigints by 3*area2 — engine-deterministic with no rounding.
    Degenerate rings (area2 = 0) yield NULL centroids explicitly.

    Output: id cols + (area2, cx, cy). Scale: per-row expressions
    only, zero shuffle.
    """
    nums = F.expr(
        f"transform(regexp_extract_all({wkt_col}, '-?[0-9]+', 0), "
        "s -> cast(s as bigint))"
    )
    d = df.withColumn("__n", nums)
    # vertex i is (__n[2i], __n[2i+1]); ring closes at the last vertex
    cross_terms = F.expr(
        "transform(sequence(0, int(size(__n)/2) - 2), i -> "
        "__n[2*i] * __n[2*i+3] - __n[2*i+2] * __n[2*i+1])"
    )
    d = d.withColumn("__cross", cross_terms)
    area2 = F.expr("aggregate(__cross, cast(0 as bigint), (a, x) -> a + x)")
    cx_num = F.expr(
        "aggregate(transform(sequence(0, int(size(__n)/2) - 2), i -> "
        "(__n[2*i] + __n[2*i+2]) * (__n[2*i] * __n[2*i+3] - __n[2*i+2] * __n[2*i+1])), "
        "cast(0 as bigint), (a, x) -> a + x)"
    )
    cy_num = F.expr(
        "aggregate(transform(sequence(0, int(size(__n)/2) - 2), i -> "
        "(__n[2*i+1] + __n[2*i+3]) * (__n[2*i] * __n[2*i+3] - __n[2*i+2] * __n[2*i+1])), "
        "cast(0 as bigint), (a, x) -> a + x)"
    )
    d = d.withColumn("__a2", area2)
    return d.select(
        *[F.col(c) for c in id_cols],
        F.col("__a2").alias("area2"),
        F.when(
            F.col("__a2") != 0, cx_num.cast("double") / (3 * F.col("__a2"))
        ).alias("cx"),
        F.when(
            F.col("__a2") != 0, cy_num.cast("double") / (3 * F.col("__a2"))
        ).alias("cy"),
    )


def shoelace_area_centroid_sql(
    shapes_cte: str,
    id_cols: Sequence[str] = ("n_nationkey",),
) -> str:
    """DuckDB twin of :func:`shoelace_area_centroid`. ``shapes_cte``
    must define a CTE named ``shapes`` with the id columns and a
    ``wkt`` column."""
    ids = ", ".join(id_cols)
    return f"""
    WITH {shapes_cte.strip().lstrip(',')},
    n AS (
      SELECT {ids},
             list_transform(regexp_extract_all(wkt, '-?[0-9]+'),
                            s -> CAST(s AS BIGINT)) AS nn
      FROM shapes
    ),
    c AS (
      SELECT {ids},
             [nn[2*i + 1] * nn[2*i + 4] - nn[2*i + 3] * nn[2*i + 2]
              for i in generate_series(0, CAST(len(nn)/2 AS INTEGER) - 2)]
               AS cross_terms,
             [(nn[2*i + 1] + nn[2*i + 3])
              * (nn[2*i + 1] * nn[2*i + 4] - nn[2*i + 3] * nn[2*i + 2])
              for i in generate_series(0, CAST(len(nn)/2 AS INTEGER) - 2)]
               AS cxs,
             [(nn[2*i + 2] + nn[2*i + 4])
              * (nn[2*i + 1] * nn[2*i + 4] - nn[2*i + 3] * nn[2*i + 2])
              for i in generate_series(0, CAST(len(nn)/2 AS INTEGER) - 2)]
               AS cys
      FROM n
    ),
    s AS (
      SELECT {ids},
             CAST(list_sum(cross_terms) AS BIGINT) AS area2,
             CAST(list_sum(cxs) AS BIGINT) AS cxn,
             CAST(list_sum(cys) AS BIGINT) AS cyn
      FROM c
    )
    SELECT {ids}, COALESCE(area2, 0) AS area2,
           CASE WHEN COALESCE(area2, 0) <> 0
                THEN CAST(cxn AS DOUBLE) / (3 * area2) END AS cx,
           CASE WHEN COALESCE(area2, 0) <> 0
                THEN CAST(cyn AS DOUBLE) / (3 * area2) END AS cy
    FROM s
    """


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (haversine, WGS84 mean radius
    6371008.8 m) as a Column expression — written in one fixed
    operation order so both engines produce bit-identical doubles on
    identical inputs (each trig call is a single libm op on an exact
    value; cross-engine last-ulp drift is possible, so CALLERS that
    compare/rank distances should round first)."""
    rad = 3.141592653589793 / 180
    r2 = 6371008.8 * 2
    dlat = (lat2 - lat1) * rad / 2
    dlon = (lon2 - lon1) * rad / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(r2) * F.asin(F.sqrt(a))


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin of :func:`haversine_m` — identical structure."""
    rad = "3.141592653589793 / 180"
    return (
        f"6371008.8 * 2 * asin(sqrt("
        f"sin((({lat2}) - ({lat1})) * ({rad}) / 2)"
        f" * sin((({lat2}) - ({lat1})) * ({rad}) / 2)"
        f" + cos(({lat1}) * ({rad})) * cos(({lat2}) * ({rad}))"
        f" * sin((({lon2}) - ({lon1})) * ({rad}) / 2)"
        f" * sin((({lon2}) - ({lon1})) * ({rad}) / 2)))"
    )


def round_fast(col, round_to: int = 6):
    """Pure-double half-up rounding ``floor(x * 10^k + 0.5) / 10^k``
    for NON-NEGATIVE doubles — Spark's ROUND(double, k) allocates a
    BigDecimal per row, and on a 15M-row distance column that GC
    pressure degraded the NN join from ~2 s to 35 s within a few
    executions (round-5 finding). The floor form is three double ops,
    allocation-free, and is spelled IDENTICALLY in the DuckDB twin so
    cross-engine determinism is preserved (ulp edge cases land the
    same on both sides because both compute the same IEEE chain)."""
    scale = float(10**round_to)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def round_fast_sql(expr: str, round_to: int = 6) -> str:
    """DuckDB twin of :func:`round_fast`."""
    scale = float(10**round_to)
    return (
        f"FLOOR(({expr}) * CAST({scale!r} AS DOUBLE) + 0.5)"
        f" / CAST({scale!r} AS DOUBLE)"
    )


def nearest_neighbor_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    round_to: int = 6,
) -> DataFrame:
    """Nearest-site assignment: for every point (id, lat, lon) pick
    the closest site (id, lat, lon) by haversine distance — the
    store-assignment / nearest-facility join.

    Strategy: ``sites`` is a DIMENSION (broadcast); every point scans
    the broadcast site list once — no shuffle of the point table at
    all, the right plan when sites fit an executor (thousands). For
    site tables beyond broadcast size, use the grid-bucketed
    point_in_polygon_join machinery instead. Selection is min_by over
    (ROUNDed distance, site id) so a last-ulp trig difference can
    never flip the winner across engines. Output: (point_id, site_id,
    distance_m).
    """
    p = points.select(
        F.col(point_id).alias("pid"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
    )
    s = sites.select(
        F.col(site_id).alias("sid"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
    )
    d = round_fast(
        haversine_m(
            F.col("plat"), F.col("plon"), F.col("slat"), F.col("slon")
        ),
        round_to,
    )
    # a small point table often arrives as one input split; spread it
    # so the O(points x sites) trig stage parallelizes (measured
    # 33s -> ~3s at sf0.1 on local[16])
    par = points.sparkSession.sparkContext.defaultParallelism * 2
    scored = p.repartition(par).crossJoin(F.broadcast(s)).select(
        "pid", "sid", d.alias("d")
    )
    return scored.groupBy("pid").agg(
        F.min_by("sid", F.struct(F.col("d"), F.col("sid"))).alias("nearest"),
        F.min("d").alias("distance_m"),
    ).select(
        F.col("pid").alias(point_id),
        F.col("nearest").alias(site_id),
        "distance_m",
    )


def nearest_neighbor_join_bucketed(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    cell_deg: float = 15.0,
    round_to: int = 6,
) -> DataFrame:
    """Grid-bucketed nearest-site assignment — the scale path when the
    site table does NOT fit an executor broadcast (VERDICT r3 #6;
    complements :func:`nearest_neighbor_join`, which broadcasts sites).

    Strategy:
      1. Sites explode onto their 3x3 neighborhood of ``cell_deg``
         lat/lon grid cells (x9 the SITE table — never the point
         table — with longitude wraparound) and points compute their
         single cell in the scan stage; one shuffle equi-join on the
         cell id replaces the all-pairs cross join, so work is
         O(points x sites-per-neighborhood) instead of
         O(points x sites).
      2. Each point's best in-neighborhood candidate is CERTIFIED
         against a provable lower bound on the distance to any site
         outside the 3x3 block: a site outside the block differs by
         >= margin_lat in latitude (central angle >= delta-lat, so
         d >= R * margin_lat_rad) or >= margin_lon in longitude within
         the block's latitude range (haversine identity gives
         d >= 2R * asin(cos(phi_max) * sin(margin_lon_rad / 2))).
         If best <= bound - 1mm, no outside site can win (the 1 mm
         slack keeps the 6dp round + site-id tie-break from ever
         flipping a winner across the certified/global forms).
      3. The uncertified residual (points in empty neighborhoods, or
         whose margin bound is weak — a vanishing tail when cell_deg
         is sized to site density) falls back to the exact broadcast
         scan. On a cluster where even the residual scan is too big,
         iterate step 1-2 with a widened ring (3 -> 9 -> 27 cells)
         before the final fallback; the certification bound is
         unchanged, only the block width grows.

    Results are EXACTLY equal to :func:`nearest_neighbor_join` (same
    rounding, same tie-break) — pinned by the equality test in
    tests/test_wave54.py and the shared oracle row.
    """
    import math

    r_earth = 6371008.8
    rad = math.pi / 180.0
    n_lon = max(1, int(round(360.0 / cell_deg)))

    p = points.select(
        F.col(point_id).alias("pid"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        F.floor(F.col("lat") / cell_deg).cast("bigint").alias("clat"),
        (
            (F.floor(F.col("lon") / cell_deg).cast("bigint") % n_lon + n_lon)
            % n_lon
        ).alias("clon"),
    )
    s = sites.select(
        F.col(site_id).alias("sid"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
        F.floor(F.col("lat") / cell_deg).cast("bigint").alias("sclat"),
        F.floor(F.col("lon") / cell_deg).cast("bigint").alias("sclon"),
    )
    # sites x9 onto the neighborhood so the point side joins on ITS own
    # cell — the big (point) table is never exploded, and the join key
    # (clat, clon) distributes by geography
    offs = F.array(
        *[
            F.struct(F.lit(a).alias("da"), F.lit(b).alias("db"))
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
        ]
    )
    s9 = (
        s.select("sid", "slat", "slon", "sclat", "sclon",
                 F.explode(offs).alias("o"))
        .select(
            "sid",
            "slat",
            "slon",
            (F.col("sclat") + F.col("o.da")).alias("clat"),
            (
                ((F.col("sclon") + F.col("o.db")) % n_lon + n_lon) % n_lon
            ).alias("clon"),
        )
    )
    d_raw = haversine_m(
        F.col("plat"), F.col("plon"), F.col("slat"), F.col("slon")
    )
    best = (
        p.join(s9, ["clat", "clon"])
        .select(
            "pid",
            "plat",
            "plon",
            "clat",
            "sid",
            round_fast(d_raw, round_to).alias("d"),
            d_raw.alias("d_raw"),
        )
        .groupBy("pid", "plat", "plon", "clat")
        .agg(
            F.min_by("sid", F.struct(F.col("d"), F.col("sid"))).alias("nearest"),
            F.min("d").alias("distance_m"),
            F.min("d_raw").alias("best_raw"),
        )
    )
    # certification bound: margins to the 3x3 block edge (offset within
    # own cell is o in [0, cell); the block edge is a full cell beyond)
    o_lat = F.col("plat") - F.col("clat") * cell_deg
    m_lat = F.lit(cell_deg) + F.least(o_lat, F.lit(cell_deg) - o_lat)
    o_lon = F.col("plon") - F.floor(F.col("plon") / cell_deg) * cell_deg
    m_lon = F.lit(cell_deg) + F.least(o_lon, F.lit(cell_deg) - o_lon)
    phi_max = F.least(
        F.greatest(
            F.abs((F.col("clat") - 1) * cell_deg),
            F.abs((F.col("clat") + 2) * cell_deg),
        ),
        F.lit(90.0),
    )
    bound_lat = F.lit(r_earth) * m_lat * rad
    bound_lon = (
        F.lit(2.0 * r_earth)
        * F.asin(
            F.least(
                F.lit(1.0),
                F.cos(phi_max * rad) * F.sin(m_lon * rad / 2.0),
            )
        )
    )
    # a 3x3 block spanning >= 180 deg of longitude has no outside-in-lon
    # region at all — treat the lon bound as infinite then
    bound_lon = F.when(
        F.lit(3 * cell_deg) >= 360.0 / 2, F.lit(float("inf"))
    ).otherwise(bound_lon)
    bound = F.least(bound_lat, bound_lon)
    # consumed by BOTH the certified projection and the residual
    # anti-join — materialize once (fixed-width per-point rows) so the
    # candidate join doesn't run twice; executor-local, see the
    # dynamic-allocation caveat in operators/clustering.py
    flagged = best.withColumn(
        "__ok", F.col("best_raw") <= bound - 0.001
    ).localCheckpoint(eager=False)
    certified = flagged.where("__ok").select(
        F.col("pid").alias(point_id),
        F.col("nearest").alias(site_id),
        "distance_m",
    )
    residual = points.join(
        flagged.where("__ok").select(F.col("pid").alias(point_id)),
        point_id,
        "left_anti",
    )
    fallback = nearest_neighbor_join(
        residual, sites, point_id, site_id, round_to=round_to
    )
    return certified.unionByName(fallback)


def grid_density_hotspots(
    points: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Grid-density hotspot report: bucket points into
    ``cell_deg``-degree cells, rank cells by count — the spatial
    aggregation behind every density heat map, and the pre-clustering
    step that bounds DBSCAN-style neighborhoods at scale (work per
    cell, not per point pair).

    Exact integer floor-division cells and counts; ranking is
    count-desc with (cell_lat, cell_lon) tie-break over the tiny cell
    table, top ``top_k`` kept. Output: (cell_lat, cell_lon,
    n_points, rank).
    """
    cells = points.groupBy(
        F.floor(F.col(lat_col) / cell_deg).cast("bigint").alias("cell_lat"),
        F.floor(F.col(lon_col) / cell_deg).cast("bigint").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    w = Window.orderBy(
        F.col("n_points").desc(), F.col("cell_lat"), F.col("cell_lon")
    )
    return (
        cells.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_k)
    )


def grid_density_hotspots_sql(
    points_sql: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: int = 5,
    top_k: int = 10,
) -> str:
    """DuckDB twin of :func:`grid_density_hotspots`; ``points_sql``
    yields (lat, lon) rows."""
    return f"""
    WITH cells AS (
      SELECT CAST(floor({lat_col} / {cell_deg}) AS BIGINT) AS cell_lat,
             CAST(floor({lon_col} / {cell_deg}) AS BIGINT) AS cell_lon,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM ({points_sql})
      GROUP BY 1, 2
    )
    SELECT cell_lat, cell_lon, n_points,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY n_points DESC,
                    cell_lat, cell_lon) AS rank
          FROM cells)
    WHERE rank <= {top_k}
    """


def ripley_k(
    points: DataFrame,
    id_col: str,
    radii_m: "list[float]",
    area_m2_expr: str,
    round_to: int = 4,
) -> DataFrame:
    """Ripley's K function at fixed radii — the spatial-clustering
    diagnostic (is the point pattern clustered, random, or dispersed
    at scale r?):

      ``K(r) = A / (n(n-1)) * #ordered pairs with d_ij <= r``,
      ``L(r) = sqrt(K(r)/pi)`` (≈ r under complete spatial
      randomness, so L(r) - r reads directly as clustering excess).

    ``points`` carries (id, lat, lon); distances are haversine meters
    ROUNDED to 6dp (the repo's trig-determinism discipline — a
    last-ulp difference cannot move a pair across a radius). The pair
    stage is the EXPLICITLY BOUNDED kernel over a broadcastable
    dimension table (same contract as `nearest_neighbor_join`, which
    documents the grid-bucketed path for point tables beyond
    broadcast size — `polygon_grid_cells` buckets apply here
    unchanged); pair counts are exact integers, so only the final
    K/L arithmetic runs in double.

    Output contract (re-cut in r8 audit re-triage): raw ``K(r)`` for
    metro-scale areas is ~1e13 m², where ``ROUND(x, 4)`` diverges
    cross-engine even on bit-identical doubles (DuckDB rounds via
    ``x*1e4``, inexact above 2^53/1e4). The emitted column is the
    INTENSIVE CSR ratio ``k_csr_ratio = K(r) / (pi r²)`` (≈1 under
    complete spatial randomness, the standard normalized reading)
    alongside ``l_est = sqrt(K/pi)`` (~1e6, inside the exact-ROUND
    regime); the exact pair counts keep full information.

    Output per radius: (r_m, n_points, pairs_within, k_csr_ratio,
    l_est).
    """
    a = points.select(
        F.col(id_col).alias("ida"),
        F.col("lat").alias("lata"),
        F.col("lon").alias("lona"),
    )
    b = points.select(
        F.col(id_col).alias("idb"),
        F.col("lat").alias("latb"),
        F.col("lon").alias("lonb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ida") < F.col("idb"))
        .select(
            F.round(
                haversine_m(
                    F.col("lata"), F.col("lona"),
                    F.col("latb"), F.col("lonb"),
                ),
                6,
            ).alias("d")
        )
    )
    n_row = points.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    counts = pairs.agg(
        *[
            F.sum((F.col("d") <= F.lit(float(r))).cast("long"))
            .cast("bigint")
            .alias(f"__c{i}")
            for i, r in enumerate(radii_m)
        ]
    )
    joined = n_row.crossJoin(F.broadcast(counts))
    area = F.expr(area_m2_expr)
    out = None
    for i, r in enumerate(radii_m):
        nn = F.col("n_points").cast("double")
        k = area / (nn * (nn - 1.0)) * (2.0 * F.col(f"__c{i}").cast("double"))
        row = joined.select(
            F.lit(float(r)).alias("r_m"),
            F.col("n_points"),
            F.col(f"__c{i}").alias("pairs_within"),
            F.round(
                k
                / (
                    F.lit(3.141592653589793)
                    * F.lit(float(r))
                    * F.lit(float(r))
                ),
                round_to,
            ).alias("k_csr_ratio"),
            F.round(F.sqrt(k / F.lit(3.141592653589793)), round_to).alias(
                "l_est"
            ),
        )
        out = row if out is None else out.unionAll(row)
    return out


def ripley_k_sql(
    points_sql: str,
    id_col: str,
    radii_m: "list[float]",
    area_m2_expr: str,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`ripley_k`; ``points_sql`` yields the
    (id, lat, lon) table."""
    d = haversine_m_sql("a.lat", "a.lon", "b.lat", "b.lon")
    count_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN d <= {float(r)!r} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c{i}"
        for i, r in enumerate(radii_m)
    )
    selects = "\n    UNION ALL ".join(
        f"""SELECT CAST({float(r)!r} AS DOUBLE) AS r_m, n_points,
           c{i} AS pairs_within,
           ROUND(({area_m2_expr}) / (CAST(n_points AS DOUBLE)
                  * (CAST(n_points AS DOUBLE) - 1.0))
                 * (2.0 * CAST(c{i} AS DOUBLE))
                 / (3.141592653589793 * CAST({float(r)!r} AS DOUBLE)
                    * CAST({float(r)!r} AS DOUBLE)),
                 {round_to}) AS k_csr_ratio,
           ROUND(SQRT(({area_m2_expr}) / (CAST(n_points AS DOUBLE)
                  * (CAST(n_points AS DOUBLE) - 1.0))
                 * (2.0 * CAST(c{i} AS DOUBLE)) / 3.141592653589793),
                 {round_to}) AS l_est
    FROM joined"""
        for i, r in enumerate(radii_m)
    )
    return f"""
    WITH pts AS ({points_sql}),
    pairs AS (
      SELECT ROUND({d}, 6) AS d
      FROM pts a JOIN pts b ON a.{id_col} < b.{id_col}
    ),
    n_row AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM pts),
    counts AS (
      SELECT {count_cols}
      FROM pairs
    ),
    joined AS (SELECT * FROM n_row CROSS JOIN counts)
    {selects}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 86: grid-bucketed DBSCAN
# ──────────────────────────────────────────────────────────────────────────


def dbscan_grid(
    points: DataFrame,
    id_col: str,
    x: str,
    y: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) with the
    ε-neighbor search grid-bucketed so the pair stage is O(n · local
    density), never O(n²):

      1. each point lands in cell (⌊x/ε⌋, ⌊y/ε⌋); one side explodes to
         its 3×3 cell neighborhood, the other keeps its home cell, and
         an EQUI-join on the cell key yields candidate pairs — any two
         points within ε share one of those 9 cells by construction;
      2. the exact ``dx² + dy² ≤ ε²`` filter keeps true neighbors
         (self included, per the classic minPts convention);
      3. core points (≥ min_pts neighbors) form a graph on ε-adjacent
         core pairs, resolved to clusters by the suite's min-label
         connected components (operators/clustering.py) — cluster_id =
         MIN core point id, deterministic in both engines;
      4. border points (non-core with ≥1 core neighbor) take the MIN
         cluster label among their core neighbors; everything else is
         noise (NULL cluster).

    Scale: the only shuffles are the cell-key equi-join and the CC
    label rounds (int pairs); skewed cells (duplicate coordinates) fan
    out as |cell|² candidate rows, the same bounded blow-up every
    production grid join carries — pick ε so cells stay small relative
    to partitions. Output per point: (id_col, role core/border/noise,
    cluster_id nullable BIGINT), ordered by id.
    """
    from . import clustering

    if eps <= 0:
        raise ValueError("dbscan_grid: eps must be positive")
    pts = points.select(
        F.col(id_col).cast("bigint").alias("pid"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
    )
    cx = F.floor(F.col("px") / eps).cast("bigint")
    cy = F.floor(F.col("py") / eps).cast("bigint")
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("pid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.explode(offs).alias("o"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("__cx") + F.col("o.ox")).alias("kx"),
        (F.col("__cy") + F.col("o.oy")).alias("ky"),
    )
    b = pts.select(
        F.col("pid").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        cx.alias("kx"),
        cy.alias("ky"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    # the verified neighbor-pair table feeds FOUR independent
    # consumers (core counts, the CC edge materialization, the border
    # adoption join, and through them the final labeling); an eager
    # lineage cut runs the grid join + exact eps filter ONCE instead of
    # once per consumer — the pairs are two bigints per row, the
    # cheapest thing in this operator to keep (r9, guide §5)
    nbr = (
        a.join(b, ["kx", "ky"])
        .filter(dx * dx + dy * dy <= F.lit(eps * eps))
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    counts = nbr.groupBy(F.col("a_id").alias("pid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nbr")
    )
    core = counts.filter(F.col("n_nbr") >= min_pts).select("pid")
    core_edges = (
        nbr.filter(F.col("a_id") < F.col("b_id"))
        .join(core.select(F.col("pid").alias("a_id")), "a_id")
        .join(core.select(F.col("pid").alias("b_id")), "b_id")
    )
    comp = clustering.connected_components(
        core_edges.select("a_id", "b_id"),
        core.select(F.col("pid").alias("doc_id")),
        id_col="doc_id",
    ).select(
        F.col("doc_id").alias("pid"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )
    # border: non-core points with >= 1 core neighbor take the MIN
    # neighbor cluster label
    border = (
        nbr.join(core.select(F.col("pid").alias("a_id")), "a_id", "left_anti")
        .join(
            comp.select(
                F.col("pid").alias("b_id"), F.col("cluster_id")
            ),
            "b_id",
        )
        .groupBy(F.col("a_id").alias("pid"))
        .agg(F.min("cluster_id").cast("bigint").alias("cluster_id"))
    )
    out = (
        pts.select("pid")
        .join(comp.withColumn("role", F.lit("core")), "pid", "left")
        .join(
            border.select(
                F.col("pid"), F.col("cluster_id").alias("b_cluster")
            ),
            "pid",
            "left",
        )
        .select(
            F.col("pid").alias(id_col),
            F.when(F.col("role").isNotNull(), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("cluster_id"), F.col("b_cluster")).alias(
                "cluster_id"
            ),
        )
    )
    return out.orderBy(id_col)


def dbscan_grid_sql(
    points_sql: str,
    id_col: str,
    eps: float,
    min_pts: int,
) -> str:
    """DuckDB twin of :func:`dbscan_grid`. ``points_sql`` must yield
    (``{id_col}``, px, py). The oracle uses a deliberately DIFFERENT
    neighbor search — a plain all-pairs distance join (fine at oracle
    scale) — and a recursive-CTE BFS for the core components, so it
    cross-checks the grid pruning AND the iterative CC against
    independent algorithms."""
    return f"""
    WITH RECURSIVE pts AS ({points_sql}),
    nbr AS (
      SELECT a.{id_col} AS a_id, b.{id_col} AS b_id
      FROM pts a JOIN pts b
        ON (a.px - b.px) * (a.px - b.px)
           + (a.py - b.py) * (a.py - b.py) <= {eps * eps!r}
    ),
    counts AS (
      SELECT a_id AS pid, CAST(COUNT(*) AS BIGINT) AS n_nbr
      FROM nbr GROUP BY a_id
    ),
    core AS (SELECT pid FROM counts WHERE n_nbr >= {min_pts}),
    core_edges AS (
      SELECT n.a_id, n.b_id FROM nbr n
      JOIN core ca ON n.a_id = ca.pid
      JOIN core cb ON n.b_id = cb.pid
      WHERE n.a_id < n.b_id
    ),
    sym AS (
      SELECT a_id AS src, b_id AS dst FROM core_edges
      UNION ALL SELECT b_id, a_id FROM core_edges
    ),
    reach(node, lbl) AS (
      SELECT pid, pid FROM core
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    ),
    comp AS (
      SELECT node AS pid, CAST(MIN(lbl) AS BIGINT) AS cluster_id
      FROM reach GROUP BY node
    ),
    border AS (
      SELECT n.a_id AS pid, CAST(MIN(c.cluster_id) AS BIGINT) AS cluster_id
      FROM nbr n
      JOIN comp c ON n.b_id = c.pid
      WHERE n.a_id NOT IN (SELECT pid FROM core)
      GROUP BY n.a_id
    )
    SELECT p.{id_col},
           CASE WHEN comp.pid IS NOT NULL THEN 'core'
                WHEN border.pid IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           COALESCE(comp.cluster_id, border.cluster_id) AS cluster_id
    FROM pts p
    LEFT JOIN comp ON p.{id_col} = comp.pid
    LEFT JOIN border ON p.{id_col} = border.pid
    ORDER BY p.{id_col}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 91: support-function approximate convex hull
# ──────────────────────────────────────────────────────────────────────────

import math as _math

#: pinned direction table for the support hull: k unit vectors at
#: 2πi/k, materialized as Python-evaluated double literals so neither
#: engine computes trig (identical constants by construction)
SUPPORT_HULL_K = 12
_SUPPORT_DIRS = [
    (
        i,
        float(_math.cos(2.0 * _math.pi * i / SUPPORT_HULL_K)),
        float(_math.sin(2.0 * _math.pi * i / SUPPORT_HULL_K)),
    )
    for i in range(SUPPORT_HULL_K)
]


def support_hull(
    points: DataFrame,
    group_col: str,
    id_col: str,
    x: str,
    y: str,
    round_to: int = 6,
) -> DataFrame:
    """Approximate convex hull per group via SUPPORT FUNCTIONS: for
    each of ``SUPPORT_HULL_K`` pinned directions, the extreme point of
    the group (argmax of the projection x·cosθ + y·sinθ, ties to the
    smallest id), then the shoelace area of those extreme points
    walked in direction order.

    Monotone-chain hulls are sequential per group; the support form
    replaces them with ONE groupBy over a k-way broadcast fan-out —
    scan-shape at any scale, with a bounded approximation: the support
    polygon inscribes the true hull and its area approaches it as
    k grows (exact when every hull vertex is extreme in some pinned
    direction). Direction cosines are Python-evaluated literals, so
    both engines project with identical constants. Output per group:
    (group, n_support_points distinct extremes, hull_area)."""
    dirs = points.sparkSession.createDataFrame(
        _SUPPORT_DIRS, "dir int, cx double, cy double"
    )
    fan = points.select(
        F.col(group_col).alias("g"),
        F.col(id_col).cast("bigint").alias("pid"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
    ).crossJoin(F.broadcast(dirs))
    proj = (
        F.col("px") * F.col("cx") + F.col("py") * F.col("cy")
    ).alias("proj")
    best = (
        fan.select("g", "dir", "pid", "px", "py", proj)
        .groupBy("g", "dir")
        .agg(
            F.max(
                F.struct(
                    F.col("proj"), (-F.col("pid")).alias("npid"),
                    F.col("pid"), F.col("px"), F.col("py"),
                )
            ).alias("b")
        )
        .select(
            "g",
            "dir",
            F.col("b.pid").alias("pid"),
            F.col("b.px").alias("hx"),
            F.col("b.py").alias("hy"),
        )
    )
    nxt = best.select(
        F.col("g"),
        ((F.col("dir") + 1) % SUPPORT_HULL_K).alias("dir"),
        F.col("hx").alias("nx"),
        F.col("hy").alias("ny"),
    )
    cross = best.join(nxt, ["g", "dir"]).groupBy("g").agg(
        F.countDistinct("pid").cast("bigint").alias("n_support_points"),
        (
            F.abs(
                F.sum(
                    F.col("hx") * F.col("ny") - F.col("nx") * F.col("hy")
                )
            )
            / 2.0
        ).alias("__area"),
    )
    return cross.select(
        F.col("g").alias(group_col),
        "n_support_points",
        F.round("__area", round_to).alias("hull_area"),
    ).orderBy(group_col)


def support_hull_sql(
    points_sql: str,
    group_col: str,
    id_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`support_hull`. ``points_sql`` must yield
    (``{group_col}``, ``{id_col}``, px, py)."""
    dirs = ", ".join(
        f"({i}, {cx!r}, {cy!r})" for i, cx, cy in _SUPPORT_DIRS
    )
    k = SUPPORT_HULL_K
    return f"""
    WITH pts AS ({points_sql}),
    dirs AS (SELECT * FROM (VALUES {dirs}) AS d(dir, cx, cy)),
    fan AS (
      SELECT pts.{group_col} AS g, CAST(pts.{id_col} AS BIGINT) AS pid,
             pts.px, pts.py, dirs.dir,
             pts.px * dirs.cx + pts.py * dirs.cy AS proj
      FROM pts CROSS JOIN dirs
    ),
    best AS (
      SELECT g, dir, pid, px AS hx, py AS hy
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY g, dir
                                     ORDER BY proj DESC, pid ASC) AS rn
        FROM fan
      ) WHERE rn = 1
    ),
    nxt AS (
      SELECT g, (dir + 1) % {k} AS dir, hx AS nx, hy AS ny FROM best
    ),
    area AS (
      SELECT b.g,
             CAST(COUNT(DISTINCT b.pid) AS BIGINT) AS n_support_points,
             ABS(SUM(b.hx * n.ny - n.nx * b.hy)) / 2.0 AS area
      FROM best b JOIN nxt n ON b.g = n.g AND b.dir = n.dir
      GROUP BY b.g
    )
    SELECT g AS {group_col}, n_support_points,
           ROUND(area, {round_to}) AS hull_area
    FROM area ORDER BY {group_col}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 99: spatial autocorrelation — Moran's I + Getis-Ord Gi*
# ──────────────────────────────────────────────────────────────────────────


def _w99_offsets(cells: DataFrame, i_col: str, j_col: str, x_col: str,
                 include_self: bool) -> DataFrame:
    """Queen-contiguity neighbor edges by exploding each cell to its
    8 (or 9, with self) offset positions and equi-joining back onto
    the cell table — the shuffle-friendly form of the |Δi|≤1 ∧ |Δj|≤1
    non-equi predicate (which would otherwise plan as a broadcast
    nested-loop). Returns (ci, cj, x_a, x_b) per directed edge."""
    offsets = [
        (di, dj)
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
        if include_self or not (di == 0 and dj == 0)
    ]
    off = F.array(
        *[F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
          for di, dj in offsets]
    )
    probes = (
        cells.select(
            F.col(i_col).alias("__ci"),
            F.col(j_col).alias("__cj"),
            F.col(x_col).cast("bigint").alias("__xa"),
            F.explode(off).alias("__o"),
        )
        .select(
            "__ci",
            "__cj",
            "__xa",
            (F.col("__ci") + F.col("__o.di")).alias("__ni"),
            (F.col("__cj") + F.col("__o.dj")).alias("__nj"),
        )
    )
    nbrs = cells.select(
        F.col(i_col).alias("__ni"),
        F.col(j_col).alias("__nj"),
        F.col(x_col).cast("bigint").alias("__xb"),
    )
    return probes.join(nbrs, ["__ni", "__nj"]).select(
        "__ci", "__cj", "__xa", "__xb"
    )


def moran_i_queen(
    cells: DataFrame,
    i_col: str = "ci",
    j_col: str = "cj",
    x_col: str = "x",
    round_to: int = 6,
) -> DataFrame:
    """Global Moran's I under queen contiguity (binary weights, 8
    neighbors, edge cells keep their smaller neighborhoods): is the
    cell value spatially CLUSTERED (I > E[I]), random, or dispersed
    (checkerboard, I < E[I])? The caller passes a complete cell
    lattice (zero-filled — absent cells would silently change the
    weight structure); grid-rollup-first is what makes this O(cells),
    not O(points²), at any corpus size.

      I = (n/W) · Σ_ij w_ij (x_i−x̄)(x_j−x̄) / Σ_i (x_i−x̄)²

    expanded to exact integer pair sums plus the rational x̄, so both
    engines compute identical doubles. Also returns E[I] = −1/(n−1)
    and the z-score under normality, with S1 = 2W and S2 = 4·Σdeg²
    for symmetric binary weights. Output (one row): n_cells, w_sum,
    moran_i, e_i, z_norm."""
    edges = _w99_offsets(cells, i_col, j_col, x_col, include_self=False)
    deg = edges.groupBy("__ci", "__cj").agg(
        F.count(F.lit(1)).cast("bigint").alias("__deg")
    )
    s2 = deg.agg(
        (F.lit(4) * F.sum(F.col("__deg") * F.col("__deg")))
        .cast("bigint")
        .alias("s2")
    )
    pair = edges.agg(
        F.count(F.lit(1)).cast("bigint").alias("w_sum"),
        F.sum(F.col("__xa") * F.col("__xb")).cast("bigint").alias("sab"),
        F.sum("__xa").cast("bigint").alias("sa"),
        F.sum("__xb").cast("bigint").alias("sb"),
    )
    node = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col(x_col).cast("bigint")).cast("bigint").alias("sx"),
        F.sum(
            F.col(x_col).cast("bigint") * F.col(x_col).cast("bigint")
        ).cast("bigint").alias("sxx"),
    )
    g = node.crossJoin(F.broadcast(pair)).crossJoin(F.broadcast(s2))
    nn = F.col("n_cells").cast("double")
    ww = F.col("w_sum").cast("double")
    xbar = F.col("sx").cast("double") / nn
    num = (
        F.col("sab").cast("double")
        - xbar * (F.col("sa").cast("double") + F.col("sb").cast("double"))
        + ww * xbar * xbar
    )
    den = F.col("sxx").cast("double") - nn * xbar * xbar
    i_stat = (nn / ww) * num / den
    e_i = F.lit(-1.0) / (nn - F.lit(1.0))
    s1 = F.lit(2.0) * ww
    var_i = (
        (nn * nn * s1 - nn * F.col("s2").cast("double")
         + F.lit(3.0) * ww * ww)
        / ((nn * nn - F.lit(1.0)) * ww * ww)
        - e_i * e_i
    )
    z = (i_stat - e_i) / F.sqrt(var_i)
    return g.select(
        "n_cells",
        "w_sum",
        F.round(i_stat, round_to).alias("moran_i"),
        F.round(e_i, round_to).alias("e_i"),
        F.round(z, round_to).alias("z_norm"),
    )


def moran_i_queen_sql(
    cells_sql: str,
    i_col: str = "ci",
    j_col: str = "cj",
    x_col: str = "x",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`moran_i_queen`. ``cells_sql`` must yield
    (ci, cj, x) for the COMPLETE lattice."""
    return f"""
    WITH cells AS ({cells_sql}),
    offs AS (
      SELECT di, dj FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                                 (1,-1),(1,0),(1,1)) o(di, dj)
    ),
    edges AS (
      SELECT a.{i_col} AS ci, a.{j_col} AS cj,
             CAST(a.{x_col} AS BIGINT) AS xa,
             CAST(b.{x_col} AS BIGINT) AS xb
      FROM cells a CROSS JOIN offs o
      JOIN cells b ON b.{i_col} = a.{i_col} + o.di
                  AND b.{j_col} = a.{j_col} + o.dj
    ),
    s2t AS (
      SELECT CAST(4 * SUM(deg * deg) AS BIGINT) AS s2
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY ci, cj)
    ),
    pair AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS w_sum,
             CAST(SUM(xa * xb) AS BIGINT) AS sab,
             CAST(SUM(xa) AS BIGINT) AS sa,
             CAST(SUM(xb) AS BIGINT) AS sb
      FROM edges
    ),
    node AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(CAST({x_col} AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST({x_col} AS BIGINT) * CAST({x_col} AS BIGINT))
                  AS BIGINT) AS sxx
      FROM cells
    )
    SELECT n_cells, w_sum,
           ROUND((CAST(n_cells AS DOUBLE) / CAST(w_sum AS DOUBLE))
                 * (CAST(sab AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                      * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
                    + CAST(w_sum AS DOUBLE)
                      * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                 / (CAST(sxx AS DOUBLE)
                    - CAST(n_cells AS DOUBLE)
                      * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))),
                 {round_to}) AS moran_i,
           ROUND(-1.0 / (CAST(n_cells AS DOUBLE) - 1.0), {round_to}) AS e_i,
           ROUND(((CAST(n_cells AS DOUBLE) / CAST(w_sum AS DOUBLE))
                  * (CAST(sab AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                       * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
                     + CAST(w_sum AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                  / (CAST(sxx AS DOUBLE)
                     - CAST(n_cells AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                  - (-1.0 / (CAST(n_cells AS DOUBLE) - 1.0)))
                 / SQRT((CAST(n_cells AS DOUBLE) * CAST(n_cells AS DOUBLE)
                           * 2.0 * CAST(w_sum AS DOUBLE)
                         - CAST(n_cells AS DOUBLE) * CAST(s2 AS DOUBLE)
                         + 3.0 * CAST(w_sum AS DOUBLE)
                           * CAST(w_sum AS DOUBLE))
                        / ((CAST(n_cells AS DOUBLE)
                              * CAST(n_cells AS DOUBLE) - 1.0)
                           * CAST(w_sum AS DOUBLE)
                           * CAST(w_sum AS DOUBLE))
                        - (-1.0 / (CAST(n_cells AS DOUBLE) - 1.0))
                          * (-1.0 / (CAST(n_cells AS DOUBLE) - 1.0))),
                 {round_to}) AS z_norm
    FROM node CROSS JOIN pair CROSS JOIN s2t
    """


def getis_ord_gstar(
    cells: DataFrame,
    i_col: str = "ci",
    j_col: str = "cj",
    x_col: str = "x",
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-scores under queen contiguity + self
    (the star form): WHERE is the clustering Moran's I only says
    exists? For each cell, the standardized neighborhood sum

      Gi* = (Σ_j w_ij x_j − x̄ Σw) / (S·√((n·Σw − (Σw)²)/(n−1)))

    with binary weights over the 3×3 block (edge cells keep smaller
    blocks), S = √(Σx²/n − x̄²). Same complete-lattice contract and
    exact-integer sums as moran_i_queen. Output: the ``top_k``
    hottest cells (gi desc, cell-coord tie-break):
    (ci, cj, x, w_cells, gi_star)."""
    edges = _w99_offsets(cells, i_col, j_col, x_col, include_self=True)
    per = edges.groupBy(
        F.col("__ci").alias(i_col), F.col("__cj").alias(j_col)
    ).agg(
        F.max("__xa").cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("w_cells"),
        F.sum("__xb").cast("bigint").alias("xsum"),
    )
    node = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col(x_col).cast("bigint")).cast("bigint").alias("sx"),
        F.sum(
            F.col(x_col).cast("bigint") * F.col(x_col).cast("bigint")
        ).cast("bigint").alias("sxx"),
    )
    j = per.crossJoin(F.broadcast(node))
    nn = F.col("n_cells").cast("double")
    xbar = F.col("sx").cast("double") / nn
    s = F.sqrt(F.col("sxx").cast("double") / nn - xbar * xbar)
    wd = F.col("w_cells").cast("double")
    gi = (F.col("xsum").cast("double") - xbar * wd) / (
        s * F.sqrt((nn * wd - wd * wd) / (nn - F.lit(1.0)))
    )
    return (
        j.select(
            i_col,
            j_col,
            "x",
            "w_cells",
            F.round(gi, round_to).alias("gi_star"),
        )
        .orderBy(F.col("gi_star").desc(), i_col, j_col)
        .limit(top_k)
    )


def getis_ord_gstar_sql(
    cells_sql: str,
    i_col: str = "ci",
    j_col: str = "cj",
    x_col: str = "x",
    top_k: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`getis_ord_gstar`."""
    return f"""
    WITH cells AS ({cells_sql}),
    offs AS (
      SELECT di, dj FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                 (0,1),(1,-1),(1,0),(1,1)) o(di, dj)
    ),
    per AS (
      SELECT a.{i_col} AS {i_col}, a.{j_col} AS {j_col},
             CAST(MAX(a.{x_col}) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS w_cells,
             CAST(SUM(CAST(b.{x_col} AS BIGINT)) AS BIGINT) AS xsum
      FROM cells a CROSS JOIN offs o
      JOIN cells b ON b.{i_col} = a.{i_col} + o.di
                  AND b.{j_col} = a.{j_col} + o.dj
      GROUP BY 1, 2
    ),
    node AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(CAST({x_col} AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST({x_col} AS BIGINT) * CAST({x_col} AS BIGINT))
                  AS BIGINT) AS sxx
      FROM cells
    )
    SELECT {i_col}, {j_col}, x, w_cells,
           ROUND((CAST(xsum AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                    * CAST(w_cells AS DOUBLE))
                 / (SQRT(CAST(sxx AS DOUBLE) / CAST(n_cells AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / CAST(n_cells AS DOUBLE)))
                    * SQRT((CAST(n_cells AS DOUBLE)
                              * CAST(w_cells AS DOUBLE)
                            - CAST(w_cells AS DOUBLE)
                              * CAST(w_cells AS DOUBLE))
                           / (CAST(n_cells AS DOUBLE) - 1.0))),
                 {round_to}) AS gi_star
    FROM per CROSS JOIN node
    ORDER BY gi_star DESC, {i_col}, {j_col}
    LIMIT {top_k}
    """

"""Geospatial functions (SURVEY.md §2.7 G1-G3) — pure-Python WKT layer.

The reference's geometry surface is narrow: CRS reprojection
EPSG:26986 -> EPSG:4326 (``to_crs``, dags/district_gis_etl.py:67),
validity filtering (``.is_valid``, :70), and WKT serialization
(``ST_AsText``, dashboard/app_data.R:27). No geo libraries ship in this
container (no shapely/pyproj/Sedona), so:

  * WKT parse/serialize and ring-validity checks are implemented
    directly (stdlib only);
  * the reprojection implements the inverse/forward Lambert Conformal
    Conic mapping (Snyder, "Map Projections — A Working Manual", USGS
    PP 1395, eqs. 14-1..15-11) with the published EPSG:26986 (NAD83
    Massachusetts Mainland) parameters — real math, not a stub;
  * validity matches GEOS ``.is_valid`` on single rings: closure,
    >= 4 points, nonzero area, AND ring simplicity (self-intersection /
    spike detection via exact-orientation segment tests, O(n^2) per
    ring — rings here are small; Sedona's ST_IsValid is the upgrade
    path for cross-ring topology, e.g. a hole crossing its shell).

All entry points are pandas UDFs: geometry math is the one place the
engine leaves JVM expressions, and Arrow batching keeps the Python
round-trip amortized (SURVEY §4.2 item 1).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# WKT parsing (POLYGON / MULTIPOLYGON, the reference's only types)
# --------------------------------------------------------------------------

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"
_COORD_RE = re.compile(rf"({_NUM})\s+({_NUM})")


def parse_wkt_rings(wkt: str) -> list[list[tuple[float, float]]] | None:
    """Parse POLYGON/MULTIPOLYGON WKT into a flat list of rings.
    Returns None for unparseable input."""
    if not isinstance(wkt, str):
        return None
    head = wkt.strip().upper()
    if not (head.startswith("POLYGON") or head.startswith("MULTIPOLYGON")):
        return None
    rings: list[list[tuple[float, float]]] = []
    # innermost parenthesized groups are rings
    for grp in re.findall(r"\(([^()]+)\)", wkt):
        ring = [(float(x), float(y)) for x, y in _COORD_RE.findall(grp)]
        if ring:
            rings.append(ring)
    return rings or None


def _ring_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _orient(ax, ay, bx, by, cx, cy) -> float:
    """Signed area of the (a, b, c) triangle — 0 means collinear."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(ax, ay, bx, by, px, py) -> bool:
    """Given collinear a,b,p: is p within the [a,b] bounding box?"""
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _segments_touch(p1, p2, p3, p4) -> bool:
    """True iff closed segments [p1,p2] and [p3,p4] share any point."""
    d1 = _orient(*p3, *p4, *p1)
    d2 = _orient(*p3, *p4, *p2)
    d3 = _orient(*p1, *p2, *p3)
    d4 = _orient(*p1, *p2, *p4)
    if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
        (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
    ):
        return True
    if d1 == 0 and _on_segment(*p3, *p4, *p1):
        return True
    if d2 == 0 and _on_segment(*p3, *p4, *p2):
        return True
    if d3 == 0 and _on_segment(*p1, *p2, *p3):
        return True
    if d4 == 0 and _on_segment(*p1, *p2, *p4):
        return True
    return False


def _ring_is_simple(ring: list[tuple[float, float]]) -> bool:
    """OGC ring simplicity: no two edges intersect except consecutive
    edges at their one shared vertex (rejects bowties and spikes)."""
    pts = [ring[0]]
    for p in ring[1:]:
        if p != pts[-1]:
            pts.append(p)
    n = len(pts) - 1  # closed ring -> n edges
    if n < 3:
        return False
    for i in range(n):
        a, b = pts[i], pts[i + 1]
        for j in range(i + 1, n):
            c, d = pts[j], pts[j + 1]
            if j == i + 1 or (i == 0 and j == n - 1):
                # consecutive edges share exactly one vertex; a spike
                # doubles back: the far endpoints land on each other's
                # edge through the shared vertex
                shared, far1, far2 = (b, a, d) if j == i + 1 else (a, b, c)
                if _orient(*shared, *far1, *far2) == 0 and (
                    _on_segment(*shared, *far1, *far2)
                    or _on_segment(*shared, *far2, *far1)
                ):
                    return False
                continue
            if _segments_touch(a, b, c, d):
                return False
    return True


def _is_valid_wkt(wkt: str) -> bool:
    """G2 — GEOS-equivalent single-ring validity: parseable, rings
    closed, >= 4 points, nonzero area, simple (no self-intersection)."""
    rings = parse_wkt_rings(wkt)
    if rings is None:
        return False
    for ring in rings:
        if (
            len(ring) < 4
            or ring[0] != ring[-1]
            or _ring_area(ring) == 0.0
            or not _ring_is_simple(ring)
        ):
            return False
    return True


# --------------------------------------------------------------------------
# EPSG:26986 (NAD83 / Massachusetts Mainland) -> EPSG:4326
# Lambert Conformal Conic (2SP) inverse, Snyder eqs. 14-1..15-11.
# --------------------------------------------------------------------------

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_E2 = _GRS80_F * (2 - _GRS80_F)
_E = math.sqrt(_E2)

# EPSG:26986 projection parameters (EPSG registry, public)
_LAT1 = math.radians(41.7166666666667)  # standard parallel 1
_LAT2 = math.radians(42.6833333333333)  # standard parallel 2
_LAT0 = math.radians(41.0)              # latitude of origin
_LON0 = math.radians(-71.5)             # central meridian
_FE = 200000.0                          # false easting (m)
_FN = 750000.0                          # false northing (m)


def _m(phi: float) -> float:
    return math.cos(phi) / math.sqrt(1 - _E2 * math.sin(phi) ** 2)


def _t(phi: float) -> float:
    es = _E * math.sin(phi)
    return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (_E / 2)


_N = (math.log(_m(_LAT1)) - math.log(_m(_LAT2))) / (
    math.log(_t(_LAT1)) - math.log(_t(_LAT2))
)
_F_CONST = _m(_LAT1) / (_N * _t(_LAT1) ** _N)
_RHO0 = _GRS80_A * _F_CONST * _t(_LAT0) ** _N


#: fixed iteration count for the isometric-latitude inverse. Converges
#: to < 1e-12 rad in ~5 iterations; a FIXED count (no early break) makes
#: the float sequence deterministic and reproducible by the unrolled SQL
#: twin in plans/ml_geo_media.py, so the geo spec is oracle-checkable.
LCC_PHI_ITERS = 8

_RAD2DEG = 180.0 / math.pi


def lcc_inverse(x: float, y: float) -> tuple[float, float]:
    """EPSG:26986 easting/northing (m) -> (lon, lat) degrees WGS84.

    NAD83->WGS84 datum shift is < 2 m — ignored, as every practical
    web-mapping pipeline does.
    """
    xp = x - _FE
    yp = _RHO0 - (y - _FN)
    # _N > 0 for northern-hemisphere parallels, so rho = +sqrt(...)
    rho = math.sqrt(xp * xp + yp * yp)
    theta = math.atan2(xp, yp)
    t = (rho / (_GRS80_A * _F_CONST)) ** (1 / _N)
    lon = theta / _N + _LON0
    phi = math.pi / 2 - 2 * math.atan(t)
    for _ in range(LCC_PHI_ITERS):
        es = _E * math.sin(phi)
        phi = math.pi / 2 - 2 * math.atan(t * ((1 - es) / (1 + es)) ** (_E / 2))
    return lon * _RAD2DEG, phi * _RAD2DEG


def _transform_wkt(wkt: str) -> str | None:
    """G1 — reproject every coordinate of a POLYGON/MULTIPOLYGON WKT
    from EPSG:26986 to EPSG:4326, preserving structure."""
    if not isinstance(wkt, str):
        return None

    def repl(match: re.Match) -> str:
        lon, lat = lcc_inverse(float(match.group(1)), float(match.group(2)))
        # 7 decimals ~ 1.1 cm — far past the <2 m datum-shift floor, and
        # the rounding grid (1e-7) dwarfs any cross-engine libm ULP so
        # the DuckDB twin formats identically
        return f"{lon:.7f} {lat:.7f}"

    return _COORD_RE.sub(repl, wkt)


# --------------------------------------------------------------------------
# pandas UDFs — the engine-facing surface
# --------------------------------------------------------------------------


@F.pandas_udf(T.BooleanType())
def st_is_valid(wkt: pd.Series) -> pd.Series:
    """G2 — gdf['geometry'].is_valid (dags/district_gis_etl.py:70)."""
    return wkt.map(_is_valid_wkt)


@F.pandas_udf(T.StringType())
def st_transform_26986_to_4326(wkt: pd.Series) -> pd.Series:
    """G1 — to_crs(epsg=4326) from Mass State Plane
    (dags/district_gis_etl.py:67)."""
    return wkt.map(_transform_wkt)


@F.pandas_udf(T.StringType())
def st_normalize_wkt(wkt: pd.Series) -> pd.Series:
    """G3 — ST_AsText-style canonicalization (uppercase tag, single
    spaces), for stable comparisons (dashboard/app_data.R:27)."""

    def norm(w):
        if not isinstance(w, str):
            return None
        w = re.sub(r"\s+", " ", w.strip())
        return re.sub(r"^[a-z ]+", lambda m: m.group(0).upper(), w, count=1)

    return wkt.map(norm)

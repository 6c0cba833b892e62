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
  * full topological validity (self-intersection) is flagged as the
    production upgrade path (Sedona's ST_IsValid) — the cheap checks
    here catch the malformed-ring cases the reference's data exhibits.

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


def _is_valid_wkt(wkt: str) -> bool:
    """G2 — cheap validity: parseable, rings closed, >= 4 points,
    nonzero area. (Self-intersection detection -> Sedona at scale.)"""
    rings = parse_wkt_rings(wkt)
    if rings is None:
        return False
    for ring in rings:
        if len(ring) < 4 or ring[0] != ring[-1] or _ring_area(ring) == 0.0:
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


def lcc_inverse(x: float, y: float) -> tuple[float, float]:
    """EPSG:26986 easting/northing (m) -> (lon, lat) degrees WGS84.

    NAD83->WGS84 datum shift is < 2 m — ignored, as every practical
    web-mapping pipeline does.
    """
    xp = x - _FE
    yp = _RHO0 - (y - _FN)
    rho = math.copysign(math.hypot(xp, yp), _N)
    theta = math.atan2(xp, yp)
    t = (rho / (_GRS80_A * _F_CONST)) ** (1 / _N)
    lon = theta / _N + _LON0
    # iterative inverse of the isometric latitude (converges ~5 iters)
    phi = math.pi / 2 - 2 * math.atan(t)
    for _ in range(10):
        es = _E * math.sin(phi)
        phi_next = math.pi / 2 - 2 * math.atan(t * ((1 - es) / (1 + es)) ** (_E / 2))
        if abs(phi_next - phi) < 1e-12:
            phi = phi_next
            break
        phi = phi_next
    return math.degrees(lon), math.degrees(phi)


def _transform_wkt(wkt: str) -> str | None:
    """G1 — reproject every coordinate of a POLYGON/MULTIPOLYGON WKT
    from EPSG:26986 to EPSG:4326, preserving structure."""
    if not isinstance(wkt, str):
        return None

    def repl(match: re.Match) -> str:
        lon, lat = lcc_inverse(float(match.group(1)), float(match.group(2)))
        return f"{lon:.9f} {lat:.9f}"

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

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
# Lambert Conformal Conic (2SP) -> EPSG:4326 inverse, parameterized by
# EPSG zone (Snyder eqs. 14-1..15-11). The reference only ever calls
# to_crs(epsg=4326) from EPSG:26986 (dags/district_gis_etl.py:67), but
# to_crs itself is generic — so the projection constants live in a
# registry keyed by EPSG code; adding a zone is one table row of
# published EPSG-registry parameters.
# --------------------------------------------------------------------------

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_E2 = _GRS80_F * (2 - _GRS80_F)
_E = math.sqrt(_E2)


def _m(phi: float) -> float:
    return math.cos(phi) / math.sqrt(1 - _E2 * math.sin(phi) ** 2)


def _t(phi: float) -> float:
    es = _E * math.sin(phi)
    return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (_E / 2)


class LCCZone:
    """One NAD83 Lambert-Conformal-Conic-2SP zone: the five published
    EPSG parameters plus the derived Snyder constants (n, F, rho0)."""

    def __init__(self, lat1_deg, lat2_deg, lat0_deg, lon0_deg, fe, fn):
        lat1, lat2 = math.radians(lat1_deg), math.radians(lat2_deg)
        lat0 = math.radians(lat0_deg)
        self.lon0 = math.radians(lon0_deg)
        self.fe, self.fn = fe, fn
        self.n = (math.log(_m(lat1)) - math.log(_m(lat2))) / (
            math.log(_t(lat1)) - math.log(_t(lat2))
        )
        self.f_const = _m(lat1) / (self.n * _t(lat1) ** self.n)
        self.rho0 = _GRS80_A * self.f_const * _t(lat0) ** self.n


#: NAD83 state-plane LCC zones (EPSG registry parameters, public).
#: lat1, lat2 = standard parallels; lat0/lon0 = origin; fe/fn = false
#: easting/northing in meters.
LCC_ZONES: dict[int, LCCZone] = {
    # Massachusetts Mainland — the reference's zone
    26986: LCCZone(41.7166666666667, 42.6833333333333, 41.0, -71.5,
                   200000.0, 750000.0),
    # Massachusetts Island
    26987: LCCZone(41.2833333333333, 41.4833333333333, 41.0, -70.5,
                   500000.0, 0.0),
    # Connecticut
    26956: LCCZone(41.2, 41.8666666666667, 40.8333333333333, -72.75,
                   304800.6096, 152400.3048),
    # Maryland
    26985: LCCZone(38.3, 39.45, 37.6666666666667, -77.0, 400000.0, 0.0),
}

# back-compat aliases for the reference zone (the SQL oracle builder in
# plans/ml_geo_media.py embeds these exact doubles)
_ZONE_26986 = LCC_ZONES[26986]
_LON0 = _ZONE_26986.lon0
_FE = _ZONE_26986.fe
_FN = _ZONE_26986.fn
_N = _ZONE_26986.n
_F_CONST = _ZONE_26986.f_const
_RHO0 = _ZONE_26986.rho0


#: fixed iteration count for the isometric-latitude inverse. Converges
#: to < 1e-12 rad in ~5 iterations; a FIXED count (no early break) makes
#: the float sequence deterministic and reproducible by the unrolled SQL
#: twin in plans/ml_geo_media.py, so the geo spec is oracle-checkable.
LCC_PHI_ITERS = 8

_RAD2DEG = 180.0 / math.pi


def lcc_inverse(
    x: float, y: float, zone: LCCZone = _ZONE_26986
) -> tuple[float, float]:
    """LCC easting/northing (m) -> (lon, lat) degrees WGS84 for any
    registered zone (default: EPSG:26986, the reference's).

    NAD83->WGS84 datum shift is < 2 m — ignored, as every practical
    web-mapping pipeline does.
    """
    xp = x - zone.fe
    yp = zone.rho0 - (y - zone.fn)
    # n > 0 for northern-hemisphere parallels, so rho = +sqrt(...)
    rho = math.sqrt(xp * xp + yp * yp)
    theta = math.atan2(xp, yp)
    t = (rho / (_GRS80_A * zone.f_const)) ** (1 / zone.n)
    lon = theta / zone.n + zone.lon0
    phi = math.pi / 2 - 2 * math.atan(t)
    for _ in range(LCC_PHI_ITERS):
        es = _E * math.sin(phi)
        phi = math.pi / 2 - 2 * math.atan(t * ((1 - es) / (1 + es)) ** (_E / 2))
    return lon * _RAD2DEG, phi * _RAD2DEG


def _transform_wkt(wkt: str, zone: LCCZone = _ZONE_26986) -> str | None:
    """G1 — reproject every coordinate of a POLYGON/MULTIPOLYGON WKT
    from an LCC zone to EPSG:4326, preserving structure."""
    if not isinstance(wkt, str):
        return None

    def repl(match: re.Match) -> str:
        lon, lat = lcc_inverse(float(match.group(1)), float(match.group(2)), zone)
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


def st_transform_to_4326(source_epsg: int):
    """G1 — to_crs(epsg=4326) from any registered LCC zone
    (dags/district_gis_etl.py:67 generalized: geopandas takes the
    source CRS from the file; here the caller names it). Returns a
    pandas UDF bound to the zone's constants; the zone object rides the
    closure to the executors, so the per-batch work stays pure float
    math with no registry lookups."""
    zone = LCC_ZONES.get(source_epsg)
    if zone is None:
        raise ValueError(
            f"EPSG:{source_epsg} not in LCC_ZONES — add its published "
            "EPSG-registry parameters (one LCCZone row)"
        )

    @F.pandas_udf(T.StringType())
    def _udf(wkt: pd.Series) -> pd.Series:
        return wkt.map(lambda w: _transform_wkt(w, zone))

    return _udf


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


# --------------------------------------------------------------------------
# Forward LCC, Web-Mercator, and UTM (Transverse Mercator) — the general
# to_crs surface beyond the reference's single 26986->4326 call
# (dags/district_gis_etl.py:67 is generic to_crs; these cover the
# common web/state-plane targets). Point projections are CLOSED-FORM,
# so they run as Catalyst column expressions (JVM whole-stage codegen,
# zero Python) with DuckDB SQL twins built from the same formula text;
# the python scalars below are the property-test references. Formulas:
# Snyder, USGS PP 1395 (LCC eqs. 15-1..15-11, TM eqs. 8-9..8-25,
# spherical Mercator eqs. 7-1/7-4).
# --------------------------------------------------------------------------


def lcc_forward(
    lon_deg: float, lat_deg: float, zone: LCCZone = _ZONE_26986
) -> tuple[float, float]:
    """(lon, lat) degrees -> LCC easting/northing meters (Snyder
    15-1..15-4) — the inverse of :func:`lcc_inverse`."""
    lam, phi = math.radians(lon_deg), math.radians(lat_deg)
    rho = _GRS80_A * zone.f_const * _t(phi) ** zone.n
    theta = zone.n * (lam - zone.lon0)
    return zone.fe + rho * math.sin(theta), (
        zone.fn + zone.rho0 - rho * math.cos(theta)
    )


#: spherical radius for EPSG:3857 (Web Mercator uses the WGS84
#: semi-major axis as a sphere — the published projection definition)
WEBM_A = 6378137.0


def webmercator_forward(lon_deg: float, lat_deg: float) -> tuple[float, float]:
    x = WEBM_A * math.radians(lon_deg)
    y = WEBM_A * math.log(math.tan(math.pi / 4 + math.radians(lat_deg) / 2))
    return x, y


def webmercator_inverse(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / WEBM_A)
    lat = math.degrees(2 * math.atan(math.exp(y / WEBM_A)) - math.pi / 2)
    return lon, lat


def webmercator_forward_cols(lon, lat):
    """EPSG:4326 -> EPSG:3857 as pure Column expressions (codegen'd,
    no UDF). ``lon``/``lat`` are Columns or names; returns (x, y)."""
    lon, lat = F.col(lon) if isinstance(lon, str) else lon, (
        F.col(lat) if isinstance(lat, str) else lat
    )
    x = F.lit(WEBM_A) * F.radians(lon)
    y = F.lit(WEBM_A) * F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2))
    return x, y


def webmercator_inverse_cols(x, y):
    """EPSG:3857 -> EPSG:4326 as pure Column expressions."""
    x, y = F.col(x) if isinstance(x, str) else x, (
        F.col(y) if isinstance(y, str) else y
    )
    lon = F.degrees(x / F.lit(WEBM_A))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(WEBM_A))) - F.lit(math.pi / 2)
    )
    return lon, lat


def webmercator_forward_sql(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`webmercator_forward_cols` (same arithmetic
    order, so engines agree to libm ULPs)."""
    return (
        f"{WEBM_A!r} * radians({lon_expr})",
        f"{WEBM_A!r} * ln(tan(pi()/4 + radians({lat_expr})/2))",
    )


class TMZone:
    """One Transverse-Mercator zone (UTM parameterization): central
    meridian, scale, false easting/northing, plus the derived series
    constants (GRS80/WGS84 ellipsoid — their flattening difference is
    sub-0.1 mm)."""

    def __init__(self, lon0_deg: float, k0: float = 0.9996,
                 fe: float = 500000.0, fn: float = 0.0):
        self.lon0 = math.radians(lon0_deg)
        self.k0, self.fe, self.fn = k0, fe, fn
        e2 = _E2
        self.ep2 = e2 / (1 - e2)  # e'^2
        # M(phi) series coefficients (Snyder 3-21)
        self.m0c = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
        self.m2c = 3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024
        self.m4c = 15 * e2**2 / 256 + 45 * e2**3 / 1024
        self.m6c = 35 * e2**3 / 3072
        # footpoint-latitude series (Snyder 3-26)
        sq = math.sqrt(1 - e2)
        e1 = (1 - sq) / (1 + sq)
        self.e1_2 = 3 * e1 / 2 - 27 * e1**3 / 32
        self.e1_4 = 21 * e1**2 / 16 - 55 * e1**4 / 32
        self.e1_6 = 151 * e1**3 / 96
        self.e1_8 = 1097 * e1**4 / 512


#: NAD83 UTM zones (EPSG registry; zone n has lon0 = 6n - 183).
UTM_ZONES: dict[int, TMZone] = {
    26918: TMZone(-75.0),  # UTM 18N (NY/DC)
    26919: TMZone(-69.0),  # UTM 19N (New England)
}


def _tm_m(phi: float, z: TMZone) -> float:
    """Meridional arc M(phi) (Snyder 3-21)."""
    return _GRS80_A * (
        z.m0c * phi
        - z.m2c * math.sin(2 * phi)
        + z.m4c * math.sin(4 * phi)
        - z.m6c * math.sin(6 * phi)
    )


def tm_forward(
    lon_deg: float, lat_deg: float, zone: TMZone
) -> tuple[float, float]:
    """(lon, lat) degrees -> TM/UTM easting/northing meters (Snyder
    8-9..8-15)."""
    lam, phi = math.radians(lon_deg), math.radians(lat_deg)
    sin_p, cos_p, tan_p = math.sin(phi), math.cos(phi), math.tan(phi)
    n = _GRS80_A / math.sqrt(1 - _E2 * sin_p**2)
    t = tan_p**2
    c = zone.ep2 * cos_p**2
    a_ = (lam - zone.lon0) * cos_p
    m = _tm_m(phi, zone)
    x = zone.fe + zone.k0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * zone.ep2) * a_**5 / 120
    )
    y = zone.fn + zone.k0 * (
        m
        + n
        * tan_p
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * zone.ep2) * a_**6 / 720
        )
    )
    return x, y


def tm_inverse(x: float, y: float, zone: TMZone) -> tuple[float, float]:
    """TM/UTM easting/northing meters -> (lon, lat) degrees (Snyder
    8-17..8-25, footpoint-latitude form)."""
    m = (y - zone.fn) / zone.k0
    mu = m / (_GRS80_A * zone.m0c)
    phi1 = (
        mu
        + zone.e1_2 * math.sin(2 * mu)
        + zone.e1_4 * math.sin(4 * mu)
        + zone.e1_6 * math.sin(6 * mu)
        + zone.e1_8 * math.sin(8 * mu)
    )
    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = zone.ep2 * cos1**2
    t1 = tan1**2
    n1 = _GRS80_A / math.sqrt(1 - _E2 * sin1**2)
    r1 = _GRS80_A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = (x - zone.fe) / (n1 * zone.k0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * zone.ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * zone.ep2 - 3 * c1**2)
        * d**6
        / 720
    )
    lam = zone.lon0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * zone.ep2 + 24 * t1**2)
        * d**5
        / 120
    ) / cos1
    return math.degrees(lam), math.degrees(phi)


def tm_forward_cols(lon, lat, zone: TMZone):
    """TM/UTM forward as pure Column expressions — same term order as
    :func:`tm_forward` so the python reference, the Spark plan, and the
    SQL twin all agree to libm ULPs. Stays inside whole-stage codegen
    (geometry at scale: projecting 10^11 points costs a scan, not a
    Python round-trip)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    lam, phi = F.radians(lon), F.radians(lat)
    sin_p, cos_p, tan_p = F.sin(phi), F.cos(phi), F.tan(phi)
    n = F.lit(_GRS80_A) / F.sqrt(F.lit(1.0) - F.lit(_E2) * sin_p * sin_p)
    t = tan_p * tan_p
    c = F.lit(zone.ep2) * cos_p * cos_p
    a_ = (lam - F.lit(zone.lon0)) * cos_p
    m = F.lit(_GRS80_A) * (
        F.lit(zone.m0c) * phi
        - F.lit(zone.m2c) * F.sin(2 * phi)
        + F.lit(zone.m4c) * F.sin(4 * phi)
        - F.lit(zone.m6c) * F.sin(6 * phi)
    )
    x = F.lit(zone.fe) + F.lit(zone.k0) * n * (
        a_
        + (F.lit(1.0) - t + c) * F.pow(a_, 3) / 6
        + (F.lit(5.0) - 18 * t + t * t + 72 * c - F.lit(58 * zone.ep2))
        * F.pow(a_, 5)
        / 120
    )
    y = F.lit(zone.fn) + F.lit(zone.k0) * (
        m
        + n
        * tan_p
        * (
            a_ * a_ / 2
            + (F.lit(5.0) - t + 9 * c + 4 * c * c) * F.pow(a_, 4) / 24
            + (
                F.lit(61.0)
                - 58 * t
                + t * t
                + 600 * c
                - F.lit(330 * zone.ep2)
            )
            * F.pow(a_, 6)
            / 720
        )
    )
    return x, y


def tm_forward_sql(
    lon_expr: str, lat_expr: str, zone: TMZone
) -> tuple[str, str]:
    """DuckDB twin of :func:`tm_forward_cols`: identical formula text
    over the same float constants."""
    lam = f"radians({lon_expr})"
    phi = f"radians({lat_expr})"
    sin_p, cos_p, tan_p = f"sin({phi})", f"cos({phi})", f"tan({phi})"
    n = f"({_GRS80_A!r} / sqrt(1.0 - {_E2!r} * {sin_p} * {sin_p}))"
    t = f"({tan_p} * {tan_p})"
    c = f"({zone.ep2!r} * {cos_p} * {cos_p})"
    a_ = f"(({lam} - {zone.lon0!r}) * {cos_p})"
    m = (
        f"({_GRS80_A!r} * ({zone.m0c!r} * {phi}"
        f" - {zone.m2c!r} * sin(2 * {phi})"
        f" + {zone.m4c!r} * sin(4 * {phi})"
        f" - {zone.m6c!r} * sin(6 * {phi})))"
    )
    x = (
        f"({zone.fe!r} + {zone.k0!r} * {n} * ({a_}"
        f" + (1.0 - {t} + {c}) * pow({a_}, 3) / 6"
        f" + (5.0 - 18 * {t} + {t} * {t} + 72 * {c} - {58 * zone.ep2!r})"
        f" * pow({a_}, 5) / 120))"
    )
    y = (
        f"({zone.fn!r} + {zone.k0!r} * ({m} + {n} * {tan_p} * ("
        f"{a_} * {a_} / 2"
        f" + (5.0 - {t} + 9 * {c} + 4 * {c} * {c}) * pow({a_}, 4) / 24"
        f" + (61.0 - 58 * {t} + {t} * {t} + 600 * {c} - {330 * zone.ep2!r})"
        f" * pow({a_}, 6) / 720)))"
    )
    return x, y


def lcc_forward_cols(lon, lat, zone: LCCZone = _ZONE_26986):
    """Forward LCC (4326 -> state plane) as Column expressions — the
    other direction of the reference's to_crs, codegen'd."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    lam, phi = F.radians(lon), F.radians(lat)
    es = F.lit(_E) * F.sin(phi)
    t = F.tan(F.lit(math.pi / 4) - phi / 2) / F.pow(
        (F.lit(1.0) - es) / (F.lit(1.0) + es), F.lit(_E / 2)
    )
    rho = F.lit(_GRS80_A * zone.f_const) * F.pow(t, F.lit(zone.n))
    theta = F.lit(zone.n) * (lam - F.lit(zone.lon0))
    x = F.lit(zone.fe) + rho * F.sin(theta)
    y = F.lit(zone.fn + zone.rho0) - rho * F.cos(theta)
    return x, y


def lcc_forward_sql(
    lon_expr: str, lat_expr: str, zone: LCCZone = _ZONE_26986
) -> tuple[str, str]:
    """DuckDB twin of :func:`lcc_forward_cols`."""
    lam = f"radians({lon_expr})"
    phi = f"radians({lat_expr})"
    es = f"({_E!r} * sin({phi}))"
    t = (
        f"(tan(pi()/4 - {phi}/2)"
        f" / pow((1.0 - {es}) / (1.0 + {es}), {_E / 2!r}))"
    )
    rho = f"({_GRS80_A * zone.f_const!r} * pow({t}, {zone.n!r}))"
    theta = f"({zone.n!r} * ({lam} - {zone.lon0!r}))"
    return (
        f"({zone.fe!r} + {rho} * sin({theta}))",
        f"({zone.fn + zone.rho0!r} - {rho} * cos({theta}))",
    )

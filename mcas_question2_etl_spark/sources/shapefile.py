"""Native ESRI shapefile scan (SURVEY.md §2.1 S4).

The reference reads district shapes with
``gpd.read_file('SCHOOLDISTRICTS_POLY.shp')``
(dags/district_gis_etl.py:42). No geo libraries ship in this container,
and more importantly geopandas is a single-machine reader — so this
module implements the two public binary formats directly (ESRI
Shapefile Technical Description, 1998; dBase III/IV .dbf layout) and
distributes the scan Spark-first:

  * ``spark.read.format('binaryFile')`` lists and reads the .shp/.dbf
    payloads as (path, content) rows — executors fetch bytes straight
    from storage, nothing funnels through the driver;
  * one ``mapInPandas`` pass parses each file's records into
    (source, record_no, attributes, geometry-WKT) rows, so the unit of
    parallelism is the FILE (a shapefile is not splittable: record
    offsets live in the .shx sidecar and records are variable-length).
    A 100 TB district-boundary corpus is thousands of zone files, which
    spreads evenly; one giant file would need an offset-indexed reader
    (.shx-driven split points) — noted, not needed at reference scale.

Attributes come back as ``map<string,string>`` (dBase stores fixed-width
text): schema-stable across heterogeneous files, cast downstream like
every other schema-on-read source here (F1/F2 casts).

Geometry support covers the shape types the reference data uses
(Polygon, plus Point/PolyLine for completeness); Z/M variants parse
their XY prefix. Ring grouping follows the spec: clockwise ring = outer
shell, counter-clockwise = hole of the preceding shell.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SHAPE_NULL = 0
_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5
# Z/M variants share the XY layout as a prefix of the record
_XY_EQUIV = {11: _SHAPE_POINT, 21: _SHAPE_POINT,
             13: _SHAPE_POLYLINE, 23: _SHAPE_POLYLINE,
             15: _SHAPE_POLYGON, 25: _SHAPE_POLYGON}


def _fmt(x: float, y: float) -> str:
    return f"{x:.9g} {y:.9g}"


def _ring_is_clockwise(ring: list[tuple[float, float]]) -> bool:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += (x2 - x1) * (y2 + y1)
    return s > 0


def _parts_to_rings(content: bytes) -> list[list[tuple[float, float]]]:
    """Decode the shared PolyLine/Polygon layout: box, numParts,
    numPoints, parts[], points[]."""
    num_parts, num_points = struct.unpack_from("<ii", content, 36)
    parts = list(struct.unpack_from(f"<{num_parts}i", content, 44))
    pts_off = 44 + 4 * num_parts
    flat = struct.unpack_from(f"<{2 * num_points}d", content, pts_off)
    bounds = parts + [num_points]
    return [
        [(flat[2 * i], flat[2 * i + 1]) for i in range(bounds[k], bounds[k + 1])]
        for k in range(num_parts)
    ]


def _polygon_wkt(rings: list[list[tuple[float, float]]]) -> str | None:
    """Group rings into polygons: a clockwise ring opens a shell, each
    counter-clockwise ring is a hole of the last shell (ESRI spec)."""
    polys: list[list[list[tuple[float, float]]]] = []
    for ring in rings:
        if len(ring) < 4:
            continue
        if _ring_is_clockwise(ring) or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if not polys:
        return None

    def ring_s(r):
        return "(" + ", ".join(_fmt(x, y) for x, y in r) + ")"

    def poly_s(p):
        return "(" + ", ".join(ring_s(r) for r in p) + ")"

    if len(polys) == 1:
        return "POLYGON " + poly_s(polys[0])
    return "MULTIPOLYGON (" + ", ".join(poly_s(p) for p in polys) + ")"


def _shape_to_wkt(shape_type: int, content: bytes) -> str | None:
    st = _XY_EQUIV.get(shape_type, shape_type)
    if st == _SHAPE_NULL:
        return None
    if st == _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", content, 4)
        return f"POINT ({_fmt(x, y)})"
    if st == _SHAPE_POLYLINE:
        lines = [r for r in _parts_to_rings(content) if len(r) >= 2]
        if not lines:
            return None
        if len(lines) == 1:
            return "LINESTRING (" + ", ".join(_fmt(x, y) for x, y in lines[0]) + ")"
        body = ", ".join(
            "(" + ", ".join(_fmt(x, y) for x, y in r) + ")" for r in lines
        )
        return "MULTILINESTRING (" + body + ")"
    if st == _SHAPE_POLYGON:
        return _polygon_wkt(_parts_to_rings(content))
    raise ValueError(f"unsupported shapefile shape type {shape_type}")


def parse_shp(data: bytes) -> list[tuple[int, str | None]]:
    """.shp main file -> [(record_no, wkt)], per the public layout:
    100-byte header, then (8-byte big-endian record header, content)."""
    if struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ValueError("not a shapefile (bad file code)")
    out = []
    pos, n = 100, len(data)
    while pos + 8 <= n:
        recno, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        content = data[pos: pos + 2 * content_words]
        pos += 2 * content_words
        st = struct.unpack_from("<i", content, 0)[0]
        out.append((recno, _shape_to_wkt(st, content)))
    return out


def parse_dbf(data: bytes) -> list[dict[str, str]]:
    """.dbf attribute file -> one {field: text} dict per (non-deleted)
    record, in record order (record k attributes shapefile record k+1)."""
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size, record_size = struct.unpack_from("<HH", data, 8)
    fields: list[tuple[str, int]] = []
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        name = data[pos: pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        flen = data[pos + 16]
        fields.append((name, flen))
        pos += 32
    out = []
    for i in range(n_records):
        off = header_size + i * record_size
        rec = data[off: off + record_size]
        if len(rec) < record_size or rec[:1] == b"*":  # deleted row
            continue
        vals, p = {}, 1
        for name, flen in fields:
            raw = rec[p: p + flen].decode("latin-1").strip()
            vals[name] = raw if raw else None
            p += flen
        out.append(vals)
    return out


_OUT_SCHEMA = (
    "source string, record_no int, attributes map<string,string>, "
    "geometry string"
)


def read_shapefile(spark: SparkSession, shp_glob: str) -> DataFrame:
    """S4 — distributed shapefile scan: one output row per shape record,
    with its .dbf attributes as map<string,string> and geometry as WKT.

    ``shp_glob`` matches the .shp files; the .dbf sidecars are located
    by basename. Files parse independently on executors (Arrow-batched
    mapInPandas over binaryFile rows).
    """
    shp = (
        spark.read.format("binaryFile").load(shp_glob)
        .select(F.col("path").alias("shp_path"), F.col("content").alias("shp"))
    )
    dbf_glob = shp_glob[:-4] + ".dbf" if shp_glob.endswith(".shp") else shp_glob
    try:
        dbf = (
            spark.read.format("binaryFile").load(dbf_glob)
            .select(F.col("path").alias("dbf_path"), F.col("content").alias("dbf"))
        )
        shp = shp.join(
            dbf,
            F.regexp_replace("shp_path", r"\.shp$", "")
            == F.regexp_replace("dbf_path", r"\.dbf$", ""),
            "left",
        ).select("shp_path", "shp", "dbf")
    except Exception:  # no .dbf sidecars at all
        shp = shp.withColumn("dbf", F.lit(None).cast("binary"))

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, shp_bytes, dbf_bytes in zip(
                pdf["shp_path"], pdf["shp"], pdf["dbf"]
            ):
                shapes = parse_shp(bytes(shp_bytes))
                attrs = parse_dbf(bytes(dbf_bytes)) if dbf_bytes is not None else []
                base = os.path.basename(path)
                for recno, wkt in shapes:
                    a = attrs[recno - 1] if recno - 1 < len(attrs) else None
                    rows.append((base, recno, a, wkt))
            yield pd.DataFrame(
                rows, columns=["source", "record_no", "attributes", "geometry"]
            )

    return shp.mapInPandas(run, _OUT_SCHEMA)

"""Row-based ingestion adapters (SURVEY.md §2.1 S1-S3, S8).

The reference's extractors are Selenium scrapers that yield header+rows
from HTML tables (school_outcomes_etl.py:16-58, election_results_etl.py
:13-78) and driver-side HTTP fetches (dags/district_gis_etl.py:14-33,
query_census_data.Rmd:62-69). Extraction is I/O, not query semantics —
the engine boundary is "rows arrive"; these adapters turn scraped rows
into DataFrames with explicit schemas.

Scale design: for small scrape payloads, ``from_rows`` parallelizes a
local list. For bulk payloads already on distributed storage, raw
bodies are read as a DataFrame (binaryFile/text) and parsed
executor-side with ``parse_with``, so no byte ever funnels through the
driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def from_rows(
    spark: SparkSession,
    header: Sequence[str],
    rows: Iterable[Sequence],
    schema: T.StructType | None = None,
) -> DataFrame:
    """header+rows (an HTML-table scrape result) -> DataFrame.

    Mirrors ``pd.DataFrame(data, columns=header)``
    (school_outcomes_etl.py:55). All scraped cells are text; the default
    schema is all-string (the reference casts later — F1/F2), matching
    its schema-on-read posture (SURVEY §1.2).
    """
    if schema is None:
        schema = T.StructType([T.StructField(h, T.StringType(), True) for h in header])
    return spark.createDataFrame([tuple(r) for r in rows], schema)


def parse_with(
    raw: DataFrame,
    parser: Callable[[str], Iterable[dict]],
    schema: T.StructType,
    body_col: str = "value",
) -> DataFrame:
    """Executor-side parse of raw page bodies (one row per page) into
    typed rows — the scale path for S1/S2 when pages are staged on
    distributed storage: ``spark.read.text(...)`` / ``binaryFile`` then
    this, keeping parsing distributed and Arrow-batched.
    """
    import pandas as pd

    out_cols = [f.name for f in schema.fields]

    def run(batches):
        for pdf in batches:
            parsed: list[dict] = []
            for body in pdf[body_col]:
                parsed.extend(parser(body))
            yield pd.DataFrame(parsed, columns=out_cols)

    return raw.mapInPandas(run, schema=schema)


def html_table_rows(body: str) -> list[list[str]]:
    """Minimal HTML-table extractor: returns the cell text of every
    <tr> as a list of strings (the reference's DOM walk,
    school_outcomes_etl.py:44-52, without a browser). Stdlib-only."""
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.rows: list[list[str]] = []
            self._row: list[str] | None = None
            self._cell: list[str] | None = None

        def handle_starttag(self, tag, attrs):
            if tag == "tr":
                self._row = []
            elif tag in ("td", "th") and self._row is not None:
                self._cell = []

        def handle_endtag(self, tag):
            if tag in ("td", "th") and self._cell is not None:
                self._row.append("".join(self._cell).strip())
                self._cell = None
            elif tag == "tr" and self._row is not None:
                if self._row:
                    self.rows.append(self._row)
                self._row = None

        def handle_data(self, data):
            if self._cell is not None:
                self._cell.append(data)

    p = _P()
    p.feed(body)
    return p.rows


def unzip_members(
    raw: DataFrame,
    suffixes: tuple[str, ...] | None = None,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """S3 — executor-side zip extraction (the reference downloads a
    shapefile zip and extractall()s it on the worker's disk,
    dags/district_gis_etl.py:14-33; here the archive bytes arrive as a
    ``binaryFile`` row and members are extracted where the bytes
    already are).

    Input: one row per archive (path, content). Output: one row per
    member — (archive, member, content) — optionally filtered to
    ``suffixes`` INSIDE the extraction loop, so unwanted members are
    never materialized. Fan-out is archive-parallel; a single huge zip
    is driver-safe but not splittable (zip central directories make
    members seekable — an offset-split reader is the upgrade path).
    Compose with parse_with / shapefile.parse_shp downstream.
    """
    import os as _os

    def run(batches):
        import io
        import zipfile

        import pandas as pd

        for pdf in batches:
            out = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for name in zf.namelist():
                        if name.endswith("/"):
                            continue
                        if suffixes and not name.lower().endswith(suffixes):
                            continue
                        out.append(
                            (_os.path.basename(path), name, zf.read(name))
                        )
            yield pd.DataFrame(out, columns=["archive", "member", "content"])

    return raw.mapInPandas(run, "archive string, member string, content binary")

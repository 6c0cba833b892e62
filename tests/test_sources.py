"""Ingestion adapter + sink tests (SURVEY §2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcas_question2_etl_spark.sources import ingest, io as sio


HTML = """
<table>
  <tr><th>District Code</th><th>Subject</th><th>M+E #</th></tr>
  <tr><td>1</td><td>ELA</td><td>1,200</td></tr>
  <tr><td>2</td><td>MATH</td><td>900</td></tr>
</table>
"""


def test_html_table_rows_extraction():
    rows = ingest.html_table_rows(HTML)
    assert rows[0] == ["District Code", "Subject", "M+E #"]
    assert rows[1] == ["1", "ELA", "1,200"]
    assert len(rows) == 3


def test_from_rows_header_skip_all_string(spark):
    # S1/S2: scraped header row becomes column names, cells stay text
    rows = ingest.html_table_rows(HTML)
    df = ingest.from_rows(spark, rows[0], rows[1:])
    assert df.columns == ["District Code", "Subject", "M+E #"]
    assert [f.dataType for f in df.schema.fields] == [T.StringType()] * 3
    assert df.count() == 2


def test_parse_with_distributed_html_parse(spark):
    # the scale path: page bodies in a DataFrame, parsed executor-side
    pages = spark.createDataFrame([(HTML,), (HTML,)], ["value"])
    schema = T.StructType(
        [
            T.StructField("district_code", T.StringType()),
            T.StructField("subject", T.StringType()),
        ]
    )

    def parser(body):
        rows = ingest.html_table_rows(body)
        return [
            {"district_code": r[0], "subject": r[1]} for r in rows[1:]
        ]

    out = ingest.parse_with(pages, parser, schema)
    assert out.count() == 4
    assert set(out.columns) == {"district_code", "subject"}


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "csv_out")
    sio.write_csv(df, path)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = sio.read_csv(spark, path, schema)
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_bucketed_join_is_shuffle_free(spark):
    """Co-bucketed tables joined on the bucket key must not add an
    Exchange: the write-time shuffle is the only one ever paid."""
    left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS b")
    sio.write_bucketed(left, "bq_left", "k", n_buckets=4, sort_col="k")
    sio.write_bucketed(right, "bq_right", "k", n_buckets=4, sort_col="k")
    try:
        joined = (
            spark.table("bq_left")
            .hint("merge")  # force SMJ so bucketing (not broadcast) does the work
            .join(spark.table("bq_right"), "k")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bq_left")
        spark.sql("DROP TABLE IF EXISTS bq_right")


def test_partition_overwrite_layout_prunes_reads(spark, tmp_path):
    """A reader filtering on the partition column must prune at the
    directory level (PartitionFilters), not scan-and-filter."""
    df = spark.createDataFrame(
        [("suffolk", 1), ("norfolk", 2), ("essex", 3)], ["county", "v"]
    )
    path = str(tmp_path / "parted")
    sio.write_partition_overwrite(df, path, "county")
    scan = spark.read.parquet(path).filter("county = 'norfolk'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "norfolk" in plan, plan
    assert [r.v for r in scan.collect()] == [2]


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """A selective dim-side filter should inject a runtime Bloom filter
    on the fact side (Spark's semi-join reduction): probe rows that
    can't match are dropped at the scan, before the join shuffle.
    Thresholds are forced so the sf0.001 fixture qualifies; at real
    scale the defaults (10 MB build / 10 GB probe) gate it."""
    from pyspark.sql import functions as F

    from mcas_question2_etl_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sf = "/root/testdata/sf0.001"
        orders = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom" in plan, plan
        filtered_count = j.collect()[0].n
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # same answer as the unforced plan: the filter prunes, never drops matches
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf, "lineitem")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert filtered_count == want > 0


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S6/K-jdbc end-to-end against the Derby engine bundled in Spark's
    own jars: overwrite-write a table, read it back whole and via a
    pushed-down query, and append (the reference's Postgres sink
    semantics, school_outcomes_etl.py:139-149, minus the server)."""
    url = f"jdbc:derby:{tmp_path}/smokedb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    df = spark.createDataFrame(
        [(1, "amherst", 91.5), (2, "boston", 88.0), (3, "chicopee", 77.25)],
        "district_code int, town string, pct double",
    )
    sio.write_jdbc(df, url, "outcomes", mode="overwrite", properties=props)

    back = sio.read_jdbc(spark, url, "SELECT * FROM outcomes", properties=props)
    assert sorted((r.district_code, r.town, r.pct) for r in back.collect()) == [
        (1, "amherst", 91.5), (2, "boston", 88.0), (3, "chicopee", 77.25),
    ]

    # query pushdown: the WHERE executes in the database, not in Spark
    # (Derby folds unquoted identifiers to upper case; Spark's writer
    # quotes column names, so queries must quote them too)
    filtered = sio.read_jdbc(
        spark, url,
        'SELECT "town" FROM outcomes WHERE "pct" > 80.0', properties=props,
    )
    assert sorted(r.town for r in filtered.collect()) == ["amherst", "boston"]

    # append mode accumulates (to_sql(if_exists='append'))
    more = spark.createDataFrame([(4, "dedham", 85.0)], df.schema)
    sio.write_jdbc(more, url, "outcomes", mode="append", properties=props)
    assert (
        sio.read_jdbc(
            spark, url, 'SELECT COUNT(*) AS "n" FROM outcomes', properties=props
        ).collect()[0].n
        == 4
    )


def test_jdbc_partition_replace_derby(spark, tmp_path):
    """K2 against a live RDBMS: re-loading one county's rows deletes
    exactly that county's prior rows before appending (the reference's
    DELETE WHERE county + to_sql(if_exists='append'),
    election_results_etl.py:114-131), leaving other counties untouched
    and the re-run idempotent."""
    url = f"jdbc:derby:{tmp_path}/partdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    first = spark.createDataFrame(
        [("suffolk", "boston", 100), ("suffolk", "revere", 40),
         ("norfolk", "quincy", 55)],
        "county string, town string, votes int",
    )
    sio.write_jdbc(first, url, "election_results", mode="overwrite",
                   properties=props)

    # corrected suffolk load: one town changed, one town dropped
    fixed = spark.createDataFrame(
        [("suffolk", "boston", 120)], "county string, town string, votes int"
    )
    sio.write_jdbc_partition_replace(
        fixed, url, "election_results", "county", properties=props
    )
    rows = sorted(
        (r.county, r.town, r.votes)
        for r in sio.read_jdbc(
            spark, url, "SELECT * FROM election_results", properties=props
        ).collect()
    )
    assert rows == [("norfolk", "quincy", 55), ("suffolk", "boston", 120)]

    # idempotent re-run: same partition content -> same table
    sio.write_jdbc_partition_replace(
        fixed, url, "election_results", "county", properties=props
    )
    assert (
        sio.read_jdbc(
            spark, url,
            'SELECT COUNT(*) AS "n" FROM election_results', properties=props,
        ).collect()[0].n
        == 2
    )


# ---------------------------------------------------------------------------
# S4 — native shapefile scan (fixtures built per the public ESRI/dBase spec)
# ---------------------------------------------------------------------------


def _mk_shp(records):
    """records: list of shapes, each a list of rings (x,y tuples)."""
    import struct

    recs = b""
    for i, rings in enumerate(records, 1):
        pts = [p for r in rings for p in r]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        content = struct.pack("<i", 5)  # Polygon
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", len(rings), len(pts))
        off = 0
        for r in rings:
            content += struct.pack("<i", off)
            off += len(r)
        for x, y in pts:
            content += struct.pack("<2d", x, y)
        recs += struct.pack(">ii", i, len(content) // 2) + content
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(recs)) // 2)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    assert len(header) == 100
    return header + recs


def _mk_dbf(fieldnames, rows):
    import struct

    fields = b""
    for name in fieldnames:
        fields += (
            name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4
            + bytes([16]) + b"\x00" * 15
        )
    header_size = 32 + len(fields) + 1
    record_size = 1 + 16 * len(fieldnames)
    hdr = struct.pack(
        "<BBBBIHH", 3, 24, 1, 1, len(rows), header_size, record_size
    ) + b"\x00" * 20
    data = hdr + fields + b"\x0d"
    for row in rows:
        data += b" " + b"".join(str(v).encode().ljust(16)[:16] for v in row)
    return data


def test_shapefile_scan_distributed(spark, tmp_path):
    """S4 — gpd.read_file (dags/district_gis_etl.py:42) as a distributed
    binaryFile + mapInPandas scan: polygons with holes, attributes from
    the .dbf sidecar, and output that feeds the geo layer directly."""
    from mcas_question2_etl_spark.sources.shapefile import read_shapefile

    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]
    (tmp_path / "districts.shp").write_bytes(_mk_shp([[square], [square, hole]]))
    (tmp_path / "districts.dbf").write_bytes(
        _mk_dbf(["ORG8CODE", "DISTRICT_N"], [(1, "Springfield"), (2, "Amherst")])
    )

    out = read_shapefile(spark, str(tmp_path / "*.shp")).orderBy("record_no")
    rows = out.collect()
    assert [r.record_no for r in rows] == [1, 2]
    assert rows[0].attributes == {"ORG8CODE": "1", "DISTRICT_N": "Springfield"}
    assert rows[1].attributes["DISTRICT_N"] == "Amherst"
    assert rows[0].geometry.startswith("POLYGON ((0 0, 0 10, 10 10")
    # record 2 carries the hole as a second ring
    assert rows[1].geometry.count("(") == 3
    # parsed geometry flows straight into the geo validity layer
    from mcas_question2_etl_spark.functions.geo import st_is_valid

    flags = [r.v for r in out.select(st_is_valid("geometry").alias("v")).collect()]
    assert flags == [True, True]


def test_shapefile_without_dbf_and_null_shape(spark, tmp_path):
    from mcas_question2_etl_spark.sources.shapefile import parse_shp, read_shapefile

    square = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
    (tmp_path / "bare.shp").write_bytes(_mk_shp([[square]]))
    rows = read_shapefile(spark, str(tmp_path / "bare.shp")).collect()
    assert len(rows) == 1 and rows[0].attributes is None
    assert rows[0].geometry.startswith("POLYGON")

    # defensive: a truncated / non-shapefile payload raises cleanly
    import pytest

    with pytest.raises(ValueError, match="bad file code"):
        parse_shp(b"\x00" * 100)


def test_unzip_members_executor_side(spark, tmp_path):
    """S3 — fetch+extract (dags/district_gis_etl.py:14-33): archive
    bytes staged on storage, members extracted executor-side, filtered
    before materialization, and composable with the shapefile parser."""
    import io
    import zipfile

    square = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("SCHOOLDISTRICTS_POLY.shp", _mk_shp([[square]]))
        zf.writestr("readme.txt", "ignore me")
        zf.writestr("nested/notes.md", "also ignored")
    (tmp_path / "districts.zip").write_bytes(buf.getvalue())

    raw = spark.read.format("binaryFile").load(str(tmp_path / "*.zip"))
    members = ingest.unzip_members(raw, suffixes=(".shp",))
    rows = members.collect()
    assert [(r.archive, r.member) for r in rows] == [
        ("districts.zip", "SCHOOLDISTRICTS_POLY.shp")
    ]
    from mcas_question2_etl_spark.sources.shapefile import parse_shp

    parsed = parse_shp(bytes(rows[0].content))
    assert parsed[0][1].startswith("POLYGON ((0 0, 0 2, 2 2")


def test_jsonl_and_orc_roundtrip_with_pushdown(spark, tmp_path):
    """Format round-trips preserve values/schema; the ORC scan must show
    pushed filters like parquet (same columnar contract)."""
    from mcas_question2_etl_spark.sources import io as sio

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)], "id long, name string, score double"
    )
    jp, op = str(tmp_path / "j"), str(tmp_path / "o")
    sio.write_jsonl(df, jp)
    sio.write_orc(df, op)

    back_j = sio.read_jsonl(spark, jp, schema=df.schema)
    assert sorted(back_j.collect()) == sorted(df.collect())
    assert back_j.schema == df.schema

    back_o = sio.read_orc(spark, op)
    assert sorted(back_o.collect()) == sorted(df.collect())
    from pyspark.sql import functions as F

    plan = back_o.filter(F.col("id") == 1).select("name")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,1)]" in plan


def test_write_range_partitioned_disjoint_file_stats(spark, tmp_path):
    """Range-clustered layout: per-file min/max ranges of the sort key
    must be disjoint, so footer stats alone prune range scans."""
    from pyspark.sql import functions as F

    from mcas_question2_etl_spark.sources import io as sio

    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "ranged")
    sio.write_range_partitioned(df, out, ["id"], n_files=4)

    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0).statistics
        lo = col.min
        hi = pq.ParquetFile(f).metadata.row_group(md.num_row_groups - 1).column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2  # disjoint -> any point/range predicate prunes


def test_compact_reduces_file_count(spark, tmp_path):
    from mcas_question2_etl_spark.sources import io as sio

    src = str(tmp_path / "fragmented")
    spark.range(0, 5000).repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/part-*.parquet")) == 64
    frag = spark.read.parquet(src)
    out = str(tmp_path / "compacted")
    n = sio.compact(frag, out, target_file_mb=512)
    assert n == 1  # tiny input -> one right-sized file
    assert len(glob.glob(out + "/part-*.parquet")) == 1
    assert spark.read.parquet(out).count() == 5000


def test_read_binary_media_feeds_multimodal_pipeline(spark, tmp_path):
    """binaryFile source -> MEDIA_SCHEMA -> extract_features: the full
    multimodal ingest path over real files on disk."""
    from mcas_question2_etl_spark.operators.multimodal import extract_features
    from mcas_question2_etl_spark.sources.io import read_binary_media

    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (tmp_path / "b.wav").write_bytes(b"RIFFfakewav!!")
    (tmp_path / "skip.txt").write_bytes(b"not media")
    media = read_binary_media(spark, str(tmp_path), glob="*.{jpg,wav}")
    rows = {r.source_uri.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.jpg", "b.wav"}
    assert rows["a.jpg"].media_type == "image" and rows["a.jpg"].mime == "image/jpeg"
    assert rows["b.wav"].media_type == "audio"
    assert bytes(rows["a.jpg"].payload) == b"\xff\xd8fakejpeg"
    # ids deterministic across re-reads (hash of uri, not zipWithIndex)
    again = {r.source_uri: r.media_id for r in read_binary_media(spark, str(tmp_path), glob="*.{jpg,wav}").collect()}
    assert {r.source_uri: r.media_id for r in rows.values()} == again

    feats = {r2.media_id: r2 for r2 in extract_features(media).collect()}
    assert feats[rows["a.jpg"].media_id].n_bytes == 10  # len(b"\xff\xd8fakejpeg")


def test_read_binary_media_max_bytes_guard(spark, tmp_path):
    from mcas_question2_etl_spark.sources.io import read_binary_media

    (tmp_path / "small.jpg").write_bytes(b"x" * 10)
    (tmp_path / "huge.jpg").write_bytes(b"x" * 1000)
    got = [r.source_uri for r in read_binary_media(spark, str(tmp_path), max_bytes=100).collect()]
    assert len(got) == 1 and got[0].endswith("small.jpg")


def test_zorder_layout_concentrates_box_queries(spark, tmp_path):
    """Z-order clustering (operators/zorder.py): after zorder_by, a 2-D
    box predicate's matching rows live in a small fraction of the files,
    while a hash-distributed layout spreads them across every file —
    the locality that file-level min/max pruning exploits at scale."""
    from mcas_question2_etl_spark.operators.zorder import zorder_by

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zorder")
    hpath = str(tmp_path / "hashed")
    zorder_by(grid, "x", "y", bits=6, num_files=16).write.parquet(zpath)
    grid.repartition(16).write.parquet(hpath)

    box = "x < 16 AND y < 16"  # 1/16 of the domain
    zfiles = (
        spark.read.parquet(zpath)
        .filter(box)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    hfiles = (
        spark.read.parquet(hpath)
        .filter(box)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert zfiles <= 4  # one z-quadrant spans at most a quarter of files
    assert hfiles == 16  # hash layout: every file holds matching rows


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on the parquet catalog: older files without a
    later-added column read as NULL under mergeSchema — the lakehouse
    upgrade path for the reference's to_sql(if_exists='replace') habit
    of silently rewriting schemas (school_outcomes_etl.py:149)."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path, mode="append"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(path, mode="append")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_hilbert_layout_prunes_at_least_as_well_as_zorder(spark, tmp_path):
    """hilbert_by (operators/hilbert.py): the same 2-D box query
    touches no MORE files than under zorder_by — Hilbert's contiguous
    key runs map to contiguous range-partitioned files."""
    from mcas_question2_etl_spark.operators.hilbert import hilbert_by
    from mcas_question2_etl_spark.operators.zorder import zorder_by

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    hpath = str(tmp_path / "hilbert")
    zpath = str(tmp_path / "zorder")
    hilbert_by(grid, "x", "y", order=6, num_files=16).write.parquet(hpath)
    zorder_by(grid, "x", "y", bits=6, num_files=16).write.parquet(zpath)

    def files_hit(path, box):
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    for box in ("x < 16 AND y < 16", "x >= 24 AND x < 40 AND y >= 24 AND y < 40"):
        h, z = files_hit(hpath, box), files_hit(zpath, box)
        assert h <= z, (box, h, z)
        assert h <= 8

"""End-to-end tests of the three ETL transform pipelines + the
dashboard read path on reference-shaped fixtures (FIXTURES.md §A),
including the golden hand-computed flagship expectation (SURVEY §5
plan item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcas_question2_etl_spark.pipelines import (
    dashboard,
    district_gis,
    election_results,
    school_outcomes,
)
from mcas_question2_etl_spark.quality import JoinValidationError


# ---------------------------------------------------------------------------
# ETL #1 — school outcomes
# ---------------------------------------------------------------------------


def _mcas_raw(spark, rows):
    return spark.createDataFrame(rows, school_outcomes.MCAS_RAW_COLS)


def _grad_raw(spark, rows):
    return spark.createDataFrame(rows, school_outcomes.GRAD_RAW_COLS)


def test_school_outcomes_transform(spark):
    mcas = _mcas_raw(
        spark,
        [
            ("1", "ELA", "1,200", "300", "55"),
            ("1", "MATH", "1,100", "350", "60"),
            ("2", "ELA", "800", "200", "40"),
            ("2", "MATH", "750", "210", "45"),
        ],
    )
    grad = _grad_raw(
        spark,
        [
            ("Springfield", "1", "2023", "91.5"),
            ("Worcester", "2", "2023", "88.0"),
            ("State Total", "99", "2023", "90.0"),
        ],
    )
    # district 99 has no MCAS rows -> inner join drops it even before the
    # State Total filter; districts 1,2 survive
    out = school_outcomes.transform_district_data(mcas, grad)
    assert out.columns == [
        "district_code",
        "district_name",
        "year",
        "num_meets_exceeds_ela",
        "num_partial_meet_ela",
        "num_not_meet_ela",
        "percent_grad",
    ]
    rows = {r.district_code: r for r in out.collect()}
    assert rows[1].num_meets_exceeds_ela == 1200  # comma-strip cast applied
    assert rows[1].percent_grad == 91.5
    assert rows[2].district_name == "Worcester"
    assert len(rows) == 2


def test_school_outcomes_duplicate_pair_fails_fast(spark):
    # pandas .pivot raises on duplicate (district, subject) — so do we
    mcas = _mcas_raw(
        spark,
        [("1", "ELA", "10", "2", "1"), ("1", "ELA", "11", "2", "1")],
    )
    grad = _grad_raw(spark, [("Springfield", "1", "2023", "91.5")])
    with pytest.raises(JoinValidationError):
        school_outcomes.transform_district_data(mcas, grad).collect()


# ---------------------------------------------------------------------------
# ETL #2 — election results (+ K2 sink semantics)
# ---------------------------------------------------------------------------


def test_election_transform_cleans_names_and_numbers(spark):
    raw = spark.createDataFrame(
        [
            ("Bristol", "N. ATTLEBOROUGH", "1,234", "567", "8", "1,809"),
            ("Middlesex", "somerville", "30,000", "10,000", "500", "40,500"),
        ],
        ["county", "town", "response_yes", "response_no", "response_blank", "response_total"],
    )
    out = {r.town: r for r in election_results.transform_election_results(raw).collect()}
    assert set(out) == {"North Attleborough", "Somerville"}
    assert out["North Attleborough"].response_yes == 1234
    assert out["Somerville"].response_total == 40500


def test_partition_overwrite_replaces_only_written_partitions(spark, tmp_path):
    path = str(tmp_path / "election")
    v1 = spark.createDataFrame(
        [("Bristol", "Taunton", 10), ("Essex", "Salem", 20)],
        ["county", "town", "response_yes"],
    )
    election_results.load_election_results(v1, path)
    # re-load ONLY Essex with new numbers — Bristol must survive untouched
    v2 = spark.createDataFrame([("Essex", "Salem", 99)], ["county", "town", "response_yes"])
    election_results.load_election_results(v2, path)
    out = {r.county: r.response_yes for r in spark.read.parquet(path).collect()}
    assert out == {"Bristol": 10, "Essex": 99}


# ---------------------------------------------------------------------------
# ETL #3 — district GIS
# ---------------------------------------------------------------------------


def test_crosswalk_explode_and_coalesce(spark):
    attr = spark.createDataFrame(
        [
            (1, "Regional North", "Townville, Hamlet City"),
            (2, "Boston", None),  # null MEMBERLIST -> town = district name
        ],
        ["ORG8CODE", "DISTRICT_N", "MEMBERLIST"],
    )
    out = district_gis.build_crosswalk(attr)
    rows = {(r.district_code, r.town) for r in out.collect()}
    assert rows == {(1, "Townville"), (1, "Hamlet City"), (2, "Boston")}


def test_shapes_transform_and_validity_filter(spark):
    sq = "POLYGON ((200000 750000, 210000 750000, 210000 760000, 200000 760000, 200000 750000))"
    open_ring = "POLYGON ((0 0, 1 0, 1 1))"  # unclosed + <4 pts -> invalid
    geo = spark.createDataFrame(
        [(1, "Springfield", sq), (2, "Broken", open_ring)],
        ["ORG8CODE", "DISTRICT_N", "geometry"],
    )
    out = district_gis.build_shapes(geo).collect()
    assert [r.district_code for r in out] == [1]
    wkt = out[0].geometry
    # reprojected into plausible Massachusetts lon/lat
    import re

    lon, lat = map(float, re.findall(r"(-?\d+\.\d+) (-?\d+\.\d+)", wkt)[0])
    assert -74.0 < lon < -69.0 and 40.9 <= lat < 43.5


def test_lcc_zone_origin_roundtrip():
    """Every registered zone must map its projection origin (false
    easting/northing) back to its (lon0, lat0) — the defining identity
    of the LCC-2SP parameterization."""
    import math

    from mcas_question2_etl_spark.functions.geo import LCC_ZONES, lcc_inverse

    for epsg, zone in LCC_ZONES.items():
        lon, lat = lcc_inverse(zone.fe, zone.fn, zone)
        assert math.isclose(lon, math.degrees(zone.lon0), abs_tol=1e-9), epsg
        assert abs(lat - {26986: 41.0, 26987: 41.0, 26956: 40.8333333333333,
                          26985: 37.6666666666667}[epsg]) < 1e-9, epsg


def test_generic_zone_transform_udf(spark):
    import pytest

    from mcas_question2_etl_spark.functions.geo import st_transform_to_4326

    df = spark.createDataFrame(
        [("POLYGON ((500000 0, 501000 0, 501000 1000, 500000 1000, 500000 0))",)],
        ["g"],
    )
    out = df.select(st_transform_to_4326(26987)("g").alias("g")).collect()[0].g
    import re as _re

    lon, lat = map(float, _re.findall(r"(-?\d+\.\d+) (-?\d+\.\d+)", out)[0])
    # EPSG:26987 origin is (-70.5, 41.0) — Martha's Vineyard waters
    assert abs(lon - -70.5) < 1e-6 and abs(lat - 41.0) < 1e-6
    with pytest.raises(ValueError, match="not in LCC_ZONES"):
        st_transform_to_4326(4999)


def test_wkt_validity_matches_geos_semantics():
    """GEOS .is_valid parity (dags/district_gis_etl.py:70) for single
    rings: bowties (self-intersection) and spikes are invalid, plain
    convex/concave rings are valid."""
    from mcas_question2_etl_spark.functions.geo import _is_valid_wkt

    assert _is_valid_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    # concave but simple
    assert _is_valid_wkt("POLYGON ((0 0, 10 0, 5 5, 10 10, 0 10, 0 0))")
    # bowtie: edges (0,0)-(10,10) and (10,0)-(0,10) cross mid-ring
    assert not _is_valid_wkt("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    # spike: edge doubles back along itself through a shared vertex
    assert not _is_valid_wkt("POLYGON ((0 0, 10 0, 5 0, 5 5, 0 5, 0 0))")
    assert not _is_valid_wkt("POLYGON ((0 0, 10 0, 4 0, 10 5, 0 5, 0 0))")
    # non-adjacent edge touching a vertex (pinch) is non-simple
    assert not _is_valid_wkt("POLYGON ((0 0, 10 0, 10 10, 5 0, 0 10, 0 0))")
    # zero-area and unclosed still rejected
    assert not _is_valid_wkt("POLYGON ((0 0, 0 0, 0 0, 0 0))")
    assert not _is_valid_wkt("POLYGON ((0 0, 1 0, 1 1))")


# ---------------------------------------------------------------------------
# dashboard read path — golden flagship expectation
# ---------------------------------------------------------------------------


@pytest.fixture()
def reference_views(spark):
    spark.createDataFrame(
        [
            (1, "Springfield", 2023, 1200, 300, 55, 91.5),
            (2, "Worcester", 2023, 800, 200, 40, 88.0),
            (3, "Lonely", 2023, 500, 100, 20, 95.0),  # town D: no election rows
        ],
        "district_code long, district_name string, year long, "
        "num_meets_exceeds_ela long, num_partial_meet_ela long, "
        "num_not_meet_ela long, percent_grad double",
    ).createOrReplaceTempView("school_district")
    spark.createDataFrame(
        [(1, "Springfield", "A"), (1, "Springfield", "B"), (2, "Worcester", "C"),
         (3, "Lonely", "D")],
        "district_code long, district_name string, town string",
    ).createOrReplaceTempView("district_town_lookup")
    spark.createDataFrame(
        [
            ("X", "A", 100, 50, 10, 160),
            ("X", "B", 200, 100, 20, 320),
            ("Y", "B", 10, 5, 1, 16),  # town B spans two counties
            ("Y", "C", 300, 150, 30, 480),
        ],
        "county string, town string, response_yes long, response_no long, "
        "response_blank long, response_total long",
    ).createOrReplaceTempView("election_result")


def test_flagship_golden(spark, reference_views):
    out = {r.district_code: r for r in dashboard.school_analysis(spark).collect()}
    # district 3's town has no election rows -> dropped by the inner join
    assert set(out) == {1, 2}
    d1 = out[1]
    # town B appears under counties X and Y -> two town_data rows join in
    assert d1.counties == "X, Y"
    assert d1.towns == "A, B, B"
    assert d1.response_yes == 310 and d1.response_total == 496
    assert d1.prop_yes == 62.5  # round(310/496*100, 1)
    assert d1.num_meets_exceeds_ela == 1200.0  # AVG over identical rows
    assert d1.prop_pass_mcas_ela == round(1200 / 1555 * 100, 1)
    d2 = out[2]
    assert d2.counties == "Y" and d2.towns == "C"
    assert d2.prop_yes == 62.5  # round(300/480*100, 1)


def test_shapefile_join_and_nulls_first_sort(spark, reference_views):
    shapes = spark.createDataFrame(
        [(1, "Springfield", "POLY1"), (2, "Worcester", "POLY2"), (3, "Lonely", "POLY3")],
        "district_code long, district_name string, geometry string",
    )
    rows = dashboard.shapefile_frame(spark, shapes).collect()
    # district 3 has no analysis row -> null prop_yes sorts FIRST
    assert rows[0].district_code == 3 and rows[0].prop_yes is None
    assert {r.district_code for r in rows} == {1, 2, 3}


def test_gis_pipeline_from_native_shapefile(spark, tmp_path):
    """End-to-end S4 -> G1/G2: .shp/.dbf fixture -> from_shapefile ->
    both pipeline branches, mirroring dags/district_gis_etl.py:42-74."""
    from tests.test_sources import _mk_dbf, _mk_shp

    x, y = 200000.0, 750000.0
    ring = [(x, y), (x, y + 1000), (x + 1000, y + 1000), (x + 1000, y), (x, y)]
    (tmp_path / "d.shp").write_bytes(_mk_shp([[ring]]))
    (tmp_path / "d.dbf").write_bytes(
        _mk_dbf(
            ["ORG8CODE", "DISTRICT_N", "MEMBERLIST"],
            [(7, "Regional North", "Towna, Hamlet")],  # fits the 16-char field
        )
    )
    src = district_gis.from_shapefile(spark, str(tmp_path / "*.shp")).cache()

    towns = {r.town for r in district_gis.build_crosswalk(src).collect()}
    assert towns == {"Towna", "Hamlet"}

    shapes = district_gis.build_shapes(src).collect()
    assert len(shapes) == 1 and shapes[0].district_code == "7"
    import re as _re

    lon, lat = map(
        float, _re.findall(r"(-?\d+\.\d+) (-?\d+\.\d+)", shapes[0].geometry)[0]
    )
    assert -74.0 < lon < -69.0 and 40.9 <= lat < 43.5

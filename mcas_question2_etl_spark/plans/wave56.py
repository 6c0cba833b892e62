"""Wave-56 extension specs: log-rank test, Hill power-law exponent,
monthly growth accounting, ABC-XYZ matrix, grid density hotspots.

Reference scope: all beyond-reference (SURVEY §2.13) — log-rank makes
the Kaplan-Meier family inferential, growth accounting extends the
lifecycle reports, ABC-XYZ completes the concentration family, grid
hotspots extend the spatial layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import concentration, segmentation, spatial, survival
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "logrank_retention_test",
    survival.logrank_test_sql(),
    "survival op — Mantel-Cox log-rank test between the retention "
    "curves of an md5 2-arm user split: same censored integer-day "
    "lifetimes as kaplan_meier_retention, exact risk sets via suffix "
    "sums over the distinct-lifetime table, per-time hypergeometric "
    "terms summed with 9dp rounding, 1-df 5% flag.",
)
def logrank_retention_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return survival.logrank_test(events)


@_spec(
    "powerlaw_alpha_doclen",
    concentration.hill_powerlaw_alpha_sql("documents", "source", "n_chars"),
    "stats op — Hill estimator of the document-length tail exponent "
    "per source (xmin=100): exact bigint tail counts, rounded ln "
    "sum, one fixed alpha expression; the scale-free-or-not summary "
    "behind the zipf rank plots.",
)
def powerlaw_alpha_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return concentration.hill_powerlaw_alpha(docs, "source", "n_chars")


@_spec(
    "monthly_growth_accounting",
    segmentation.monthly_growth_accounting_sql(),
    "growth op — Social-Capital growth accounting per month: active "
    "= new + retained + resurrected (identity holds per row), "
    "churned = prev active - retained; exact integer month indices "
    "and user-month grain joins.",
)
def monthly_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return segmentation.monthly_growth_accounting(events)


@_spec(
    "abc_xyz_matrix",
    concentration.abc_xyz_matrix_sql(
        "lineitem", "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    ),
    "ops op — ABC x XYZ part classification: DECIMAL-exact revenue "
    "prefix thresholds (no float boundary can flip a class) x weekly-"
    "demand coefficient of variation from exact bigint power sums; "
    "the joint stock-planning matrix.",
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return concentration.abc_xyz_matrix(
        li, "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
    )


_GLAT = "((c_custkey * 37) % 120) / 2.0 - 30"
_GLON = "((c_custkey * 73) % 720) / 2.0 - 180"


@_spec(
    "grid_density_hotspots",
    spatial.grid_density_hotspots_sql(
        f"SELECT {_GLAT} AS lat, {_GLON} AS lon FROM customer"
    ),
    "spatial op — 5-degree grid density hotspots over the synthetic "
    "customer coordinates: exact floor-division cells and counts, "
    "count-desc rank with cell tie-break, top 10; the bounded "
    "pre-clustering step for density work at scale.",
)
def grid_density_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.expr(_GLAT).alias("lat"), F.expr(_GLON).alias("lon")
    )
    return spatial.grid_density_hotspots(pts)

"""Dashboard read path (SURVEY.md §3.4) — the flagship SQL + R-side
derivations as ONE Spark lineage.

The reference runs three separate Postgres queries plus R glue
(dashboard/app_data.R): the flagship aggregation SQL, a town aggregate,
a WKT shapes read — then mutates/joins/sorts in R. Here the flagship
SQL runs verbatim under spark.sql() (STRING_AGG respelled as sorted
concat_ws∘collect_* — Postgres's unordered STRING_AGG is
nondeterministic, SURVEY §7.4), and the derivations/join/sort continue
the same lazy plan: one QueryExecution instead of 3 queries + glue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..quality import assert_unique_key

#: dashboard/sql/get_school_analysis_data.sql:1-28, with the two
#: STRING_AGGs respelled deterministically (sorted; DISTINCT -> set).
FLAGSHIP_SQL = """
SELECT
  school_district.district_code,
  school_district.district_name,
  school_district.year,
  concat_ws(', ', array_sort(collect_set(town_data.county))) AS counties,
  concat_ws(', ', array_sort(collect_list(town_data.town))) AS towns,
  AVG(school_district.num_meets_exceeds_ela) AS num_meets_exceeds_ela,
  AVG(school_district.num_partial_meet_ela) AS num_partial_meet_ela,
  AVG(school_district.num_not_meet_ela) AS num_not_meet_ela,
  AVG(school_district.percent_grad) AS percent_grad,
  SUM(town_data.response_yes) AS response_yes,
  SUM(town_data.response_no) AS response_no,
  SUM(town_data.response_blank) AS response_blank,
  SUM(town_data.response_total) AS response_total
FROM school_district
LEFT JOIN district_town_lookup
  ON school_district.district_code = district_town_lookup.district_code
INNER JOIN (
  SELECT
    county,
    town,
    SUM(response_yes) AS response_yes,
    SUM(response_no) AS response_no,
    SUM(response_blank) AS response_blank,
    SUM(response_total) AS response_total
  FROM election_result
  GROUP BY county, town
) town_data ON district_town_lookup.town = town_data.town
GROUP BY school_district.district_code, school_district.district_name,
         school_district.year
"""


def school_analysis(spark: SparkSession) -> DataFrame:
    """Flagship query + analytic columns (dashboard/app_data.R:34-40).

    Expects temp views ``school_district``, ``district_town_lookup``,
    ``election_result`` (register fixtures or production tables first).
    """
    agg = spark.sql(FLAGSHIP_SQL)
    df = agg.withColumn(
        "prop_yes", F.round(F.col("response_yes") / F.col("response_total") * 100, 1)
    ).withColumn(
        "prop_pass_mcas_ela",
        F.round(
            F.col("num_meets_exceeds_ela")
            / (
                F.col("num_meets_exceeds_ela")
                + F.col("num_partial_meet_ela")
                + F.col("num_not_meet_ela")
            )
            * 100,
            1,
        ),
    )
    # assert_that(length(unique(district_code)) == nrow(df)) — app_data.R:40
    assert_unique_key(df, "district_code", side="school analysis result")
    return df


def shapefile_frame(spark: SparkSession, shapes: DataFrame) -> DataFrame:
    """Shapes x analysis join + nulls-first arrange
    (dashboard/app_data.R:43-47): J5 multi-key left join after an int
    key cast, then arrange(!is.na(prop_yes), prop_yes)."""
    analysis = school_analysis(spark)
    return (
        shapes.withColumn("district_code", F.col("district_code").cast("int"))
        .join(
            analysis.withColumn(
                "district_code", F.col("district_code").cast("int")
            ),
            on=["district_code", "district_name"],
            how="left",
        )
        .orderBy(
            F.col("prop_yes").isNotNull().asc(),
            F.col("prop_yes").asc(),
        )
    )

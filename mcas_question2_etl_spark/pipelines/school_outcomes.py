"""ETL #1 — school district outcomes (school_outcomes_etl.py:99-137).

Raw scraped MCAS + graduation tables -> one row per district with
wide per-subject achievement counts and the graduation rate.

Spark shape: the whole transform is one lazy lineage — project/cast
(narrow) -> pivot (one shuffle on district_code) -> validated 1:1 join
(broadcast at dim size; sort-merge at scale) -> filter -> final
projection. The reference's intermediate materializations disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import comma_strip_cast
from ..operators.reshape import pivot_wide
from ..quality import validate_join

#: raw scraped column names (school_outcomes_etl.py:105, :122)
MCAS_RAW_COLS = ["District Code", "Subject", "M+E #", "PM #", "NM #"]
GRAD_RAW_COLS = ["District Name", "District Code", "Year", "% Graduated"]


def transform_district_data(mcas_raw: DataFrame, grad_raw: DataFrame) -> DataFrame:
    """Mirror of transform_district_data (school_outcomes_etl.py:99-137).

    Ref steps: subset/rename (:105-106) -> comma-strip int cast
    (:109-110) -> pivot wide on subject (:113-119) with '_'-joined
    names (:118) -> grad subset/rename/float cast (:121-124) ->
    merge validate='1:1' (:127) -> drop 'State Total' (:130) ->
    int casts (:131-132) -> ordered lowercase projection (:133-136).
    pandas .pivot raises on duplicate (district, subject) pairs, so
    assert_unique=True preserves that contract.
    """
    mcas = mcas_raw.select(
        F.col("District Code").alias("district_code"),
        F.col("Subject").alias("subject"),
        comma_strip_cast("M+E #").alias("num_meets_exceeds"),
        comma_strip_cast("PM #").alias("num_partial_meet"),
        comma_strip_cast("NM #").alias("num_not_meet"),
    )

    wide = pivot_wide(
        mcas,
        index=["district_code"],
        pivot_col="subject",
        values={
            "num_meets_exceeds": F.first("num_meets_exceeds"),
            "num_partial_meet": F.first("num_partial_meet"),
            "num_not_meet": F.first("num_not_meet"),
        },
        pivot_values=["ELA", "MATH"],
        assert_unique=True,
    )

    grad = grad_raw.select(
        F.col("District Name").alias("district_name"),
        F.col("District Code").alias("district_code"),
        F.col("Year").alias("year"),
        F.col("% Graduated").cast("double").alias("percent_grad"),
    )

    school = validate_join(wide, grad, on="district_code", how="inner", validate="1:1")
    school = school.filter(F.col("district_name") != "State Total")

    return school.select(
        F.col("district_code").cast("long").alias("district_code"),
        "district_name",
        F.col("year").cast("long").alias("year"),
        F.col("num_meets_exceeds_ela").cast("long").alias("num_meets_exceeds_ela"),
        F.col("num_partial_meet_ela").cast("long").alias("num_partial_meet_ela"),
        F.col("num_not_meet_ela").cast("long").alias("num_not_meet_ela"),
        "percent_grad",
    )

"""ETL #2 — election results (election_results_etl.py:80-131).

The reference runs a sequential per-county extract-transform-load loop
(:133-163) with a DELETE-then-append load per county. Spark shape: ALL
counties are one DataFrame; the transform is a single narrow
projection; the load is one dynamic-partition-overwrite write keyed on
county — the 14-iteration loop becomes partition parallelism, and the
delete+append becomes an atomic per-partition replace
(sources.io.write_partition_overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import comma_strip_cast, expand_directions, title_case

RESPONSE_COLS = ("response_yes", "response_no", "response_blank", "response_total")


def transform_election_results(raw: DataFrame) -> DataFrame:
    """Mirror of transform_county_data (election_results_etl.py:80-112),
    generalized from one county at a time to the whole relation.

    Ref steps: county column insert (:94 — already a column here, the
    per-county loop is gone) -> town title case (:97) -> N./S./E./W.
    expansion (:100-104) -> comma-strip int casts (:107-109).
    """
    town = expand_directions(title_case("town"))
    return raw.select(
        "county",
        town.alias("town"),
        *[comma_strip_cast(c).alias(c) for c in RESPONSE_COLS],
    )


def load_election_results(df: DataFrame, path: str) -> None:
    """K2 — per-county idempotent replace, as one declarative write."""
    from ..sources.io import write_partition_overwrite

    write_partition_overwrite(df, path, "county")

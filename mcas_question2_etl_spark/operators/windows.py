"""Window operators (SURVEY.md §2.5 W1 + extensions).

W1 (row_number per group) is the reference's entire window surface
(create_school_town_lookup.Rmd:41-42); top_k_per_group is the natural
extension a training-data pipeline needs constantly.

Scale note: a partitioned window shuffles once on the partition keys;
rank-then-filter for top-k pushes the filter into the window stage
(Spark's WindowGroupLimit / rank-limit pushdown handles this in recent
versions) so per-group state stays bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def row_number_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[str | Column], out_col: str = "index"
) -> DataFrame:
    """W1 — ``group_by(g) %>% mutate(index = row_number(k))``."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[str | Column], k: int
) -> DataFrame:
    """Extension — smallest/largest k rows per group via rank-filter."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )

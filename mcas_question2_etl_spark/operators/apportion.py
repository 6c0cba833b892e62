"""Largest-remainder (Hamilton) seat apportionment.

The reference repo's second ETL is an election pipeline
(election_results_etl.py); this operator supplies the allocation step
every election/quota system needs: distribute a fixed integer number
of seats proportionally to integer vote counts, exactly — floor
quotas first, then the leftover seats to the largest remainders.

All-integer construction: the floor quota is (votes * seats) DIV
total and the remainder is (votes * seats) MOD total — no float
quota anywhere, so ties and orderings are exact. Leftover seats go to
the top remainders with a deterministic (remainder desc, key asc)
order; the rank window runs over the PARTY-sized table, not the
corpus.

Scale shape: votes aggregate with map-side combine to one row per
party; everything after is party-table arithmetic with a broadcast
1-row total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder_seats(
    df: DataFrame,
    party_col: str,
    seats: int,
) -> DataFrame:
    """(party, votes, floor_seats, remainder, bonus, total_seats) —
    SUM(total_seats) == seats exactly."""
    votes = df.groupBy(F.col(party_col).alias("party")).agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    total = votes.agg(F.sum("votes").cast("bigint").alias("__T"))
    based = votes.crossJoin(F.broadcast(total)).select(
        "party",
        "votes",
        F.expr(f"votes * {seats} div __T").cast("bigint").alias("floor_seats"),
        F.expr(f"(votes * {seats}) % __T").cast("bigint").alias("remainder"),
    )
    leftover = based.agg(
        (F.lit(seats) - F.sum("floor_seats")).cast("bigint").alias("__left")
    )
    w = Window.orderBy(F.col("remainder").desc(), F.col("party"))
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "party",
            "votes",
            "floor_seats",
            "remainder",
            (F.col("__rk") <= F.col("__left")).cast("bigint").alias("bonus"),
            (
                F.col("floor_seats")
                + (F.col("__rk") <= F.col("__left")).cast("bigint")
            ).alias("total_seats"),
        )
    )


def largest_remainder_seats_sql(
    table: str,
    party_col: str,
    seats: int,
) -> str:
    """DuckDB twin of :func:`largest_remainder_seats`."""
    return f"""
    WITH votes AS (
      SELECT {party_col} AS party, CAST(COUNT(*) AS BIGINT) AS votes
      FROM {table} GROUP BY {party_col}
    ),
    t AS (SELECT CAST(SUM(votes) AS BIGINT) AS T FROM votes),
    based AS (
      SELECT party, votes,
             CAST(votes * {seats} // T AS BIGINT) AS floor_seats,
             CAST((votes * {seats}) % T AS BIGINT) AS remainder
      FROM votes, t
    ),
    l AS (SELECT CAST({seats} - SUM(floor_seats) AS BIGINT) AS lft FROM based),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY remainder DESC, party) AS rk
      FROM based
    )
    SELECT party, votes, floor_seats, remainder,
           CAST(CASE WHEN rk <= l.lft THEN 1 ELSE 0 END AS BIGINT) AS bonus,
           floor_seats
             + CAST(CASE WHEN rk <= l.lft THEN 1 ELSE 0 END AS BIGINT)
             AS total_seats
    FROM ranked, l
    """

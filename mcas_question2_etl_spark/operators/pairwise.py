"""Bradley-Terry pairwise-preference ratings via the MM algorithm.

Head-to-head outcomes (supplier A shipped faster than B inside the
same order; model X beat model Y in an eval; team A beat B) want a
GLOBAL ranking that respects strength-of-opposition — exactly what
win-rate sorting gets wrong. Bradley-Terry models
P(i beats j) = p_i / (p_i + p_j); the Minorize-Maximize update
(Hunter 2004, Ann. Statist.)

    p_i' = W_i / sum_j n_ij / (p_i + p_j)

converges monotonically, and a FIXED unrolled iteration count makes
it oracle-checkable (the same discipline as the IPF raking and
Markov power-iteration operators). Each round is one join of the
pair-aggregate table against the k-row ratings + a per-player sum —
pairs are aggregated once up front; raw events never re-shuffle.

Determinism: pair counts are exact bigints; per-round sums over a
player's opponents are double (addend order differs across engines),
so the FINAL ratings are rounded — intermediate ulp drift stays far
below the 6dp report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bradley_terry_ratings(
    pairs: DataFrame,
    iters: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Fit BT ratings from a pair-aggregate table (i, j, wins_i,
    wins_j) with i < j, one row per unordered pair (ties excluded
    upstream). Ratings start at 1 and are renormalized to mean 1
    each round (the MM scale gauge). Returns (player, wins, losses,
    rating) with rating rounded.
    """
    fwd = pairs.select(
        F.col("i").alias("p"),
        F.col("j").alias("o"),
        F.col("wins_i").alias("w"),
        (F.col("wins_i") + F.col("wins_j")).alias("n"),
    )
    rev = pairs.select(
        F.col("j").alias("p"),
        F.col("i").alias("o"),
        F.col("wins_j").alias("w"),
        (F.col("wins_i") + F.col("wins_j")).alias("n"),
    )
    # few, fatter partitions: the per-round jobs are tiny aggregates
    # whose wall-clock is task-scheduling overhead at 32+ partitions
    edges = fwd.unionByName(rev).coalesce(8).localCheckpoint(eager=False)
    totals = edges.groupBy("p").agg(
        F.sum("w").cast("bigint").alias("wins"),
        (F.sum("n") - F.sum("w")).cast("bigint").alias("losses"),
    )
    ratings = totals.select("p", F.lit(1.0).alias("r"))
    k_row = totals.agg(F.count(F.lit(1)).cast("bigint").alias("__k"))
    for _ in range(iters):
        ro = ratings.select(F.col("p").alias("o"), F.col("r").alias("ro"))
        # ratings are player-grain (tiny); broadcast both sides so the
        # edge table never shuffles inside the iteration
        denom = (
            edges.join(F.broadcast(ratings), "p")
            .join(F.broadcast(ro), "o")
            .groupBy("p")
            .agg(
                F.sum(
                    F.col("n").cast("double") / (F.col("r") + F.col("ro"))
                ).alias("__d")
            )
        )
        # the MM update is scale-covariant (scaling every p by c maps
        # to scaled output), so the mean-1 gauge is applied ONCE at
        # the end instead of per round — one fewer job per iteration
        ratings = totals.join(denom, "p").select(
            "p",
            (F.col("wins").cast("double") / F.col("__d")).alias("r"),
        ).localCheckpoint(eager=False)
    norm = ratings.agg(F.sum("r").alias("__s"))
    return (
        totals.join(ratings, "p")
        .crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(k_row))
        .select(
            F.col("p").alias("player"),
            "wins",
            "losses",
            F.round(
                F.col("r") * F.col("__k") / F.col("__s"), round_to
            ).alias("rating"),
        )
    )


def bradley_terry_ratings_sql(
    pairs_sql: str,
    iters: int = 6,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bradley_terry_ratings`; ``pairs_sql``
    yields (i, j, wins_i, wins_j) with i < j."""
    body = [
        f"pairs AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED ("
        " SELECT i AS p, j AS o, wins_i AS w, wins_i + wins_j AS n FROM pairs"
        " UNION ALL"
        " SELECT j AS p, i AS o, wins_j AS w, wins_i + wins_j AS n FROM pairs)",
        "totals AS MATERIALIZED (SELECT p, CAST(SUM(w) AS BIGINT) AS wins,"
        " CAST(SUM(n) - SUM(w) AS BIGINT) AS losses FROM edges GROUP BY p)",
        "k_row AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM totals)",
        "r0 AS MATERIALIZED (SELECT p, CAST(1.0 AS DOUBLE) AS r FROM totals)",
    ]
    prev = "r0"
    for i in range(iters):
        d, nrm = f"d{i}", f"r{i + 1}"
        body.append(
            f"{d} AS MATERIALIZED (SELECT edges.p,"
            f" SUM(CAST(edges.n AS DOUBLE) / (rp.r + ro.r)) AS dd"
            f" FROM edges"
            f" JOIN {prev} rp ON rp.p = edges.p"
            f" JOIN {prev} ro ON ro.p = edges.o"
            f" GROUP BY edges.p)"
        )
        body.append(
            f"{nrm} AS MATERIALIZED (SELECT totals.p,"
            f" CAST(totals.wins AS DOUBLE) / {d}.dd AS r"
            f" FROM totals JOIN {d} ON {d}.p = totals.p)"
        )
        prev = nrm
    return (
        "WITH "
        + ",\n    ".join(body)
        + f"""
    SELECT totals.p AS player, totals.wins, totals.losses,
           ROUND({prev}.r * k_row.k / (SELECT SUM(r) FROM {prev}),
                 {round_to}) AS rating
    FROM totals JOIN {prev} ON {prev}.p = totals.p CROSS JOIN k_row
    """
    )

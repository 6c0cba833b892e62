"""Market-basket association rules (support / confidence / lift) over
co-occurring items.

The classic Agrawal-Srikant frequent-pair mining, restricted to pairs
(the overwhelmingly useful case for recommendations and for spotting
bundled/leaked records in training corpora). Counts are basket-level:
support(a,b) = number of GROUPS containing both items, never row
counts, so duplicate line items cannot inflate a rule.

Determinism discipline: every support is an exact bigint; confidence
and lift are single divisions of those bigints in double — no
order-dependent float accumulation anywhere, so no rounding is needed.

Scale shape: baskets reduce to distinct (group, item) members in one
aggregation; the pair expansion is a self-equi-join on the group key
bounded by ``max_group`` (groups above the bound are dropped whole —
the clique-blowup guard, same policy as
:func:`.graph_metrics.cooccurrence_edges`), so work is
O(sum_g k_g^2) with k_g <= max_group, i.e. linear in baskets with a
constant-factor cap. Item supports ride the same members table;
everything joins back on fixed-width item keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_group: int = 8,
) -> DataFrame:
    """(item_a, item_b, n_ab, n_a, n_b, conf_a_b, conf_b_a, lift) for
    unordered pairs with basket co-support >= ``min_support``; lift is
    computed against the bounded-basket universe N."""
    members = df.select(group_col, item_col).distinct()
    sizes = members.groupBy(group_col).agg(F.count(F.lit(1)).alias("__k"))
    bounded = members.join(
        sizes.filter(F.col("__k") <= max_group).select(group_col), group_col
    )
    n_baskets = bounded.select(group_col).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__N")
    )
    item_sup = bounded.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    a = bounded.select(group_col, F.col(item_col).alias("item_a"))
    b = bounded.select(group_col, F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, group_col)
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(
            item_sup.select(
                F.col(item_col).alias("item_a"), F.col("__n").alias("n_a")
            ),
            "item_a",
        )
        .join(
            item_sup.select(
                F.col(item_col).alias("item_b"), F.col("__n").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab") / F.col("n_a")).alias("conf_a_b"),
            (F.col("n_ab") / F.col("n_b")).alias("conf_b_a"),
            (
                F.col("n_ab").cast("double")
                * F.col("__N")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def association_rules_sql(
    table: str,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_group: int = 8,
) -> str:
    """DuckDB twin of :func:`association_rules`."""
    return f"""
    WITH members AS (
      SELECT DISTINCT {group_col} AS g, {item_col} AS it FROM {table}
    ),
    bounded AS (
      SELECT g, it FROM members
      WHERE g IN (SELECT g FROM members GROUP BY g HAVING COUNT(*) <= {max_group})
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS N FROM bounded),
    sup AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM bounded GROUP BY it),
    pairs AS (
      SELECT x.it AS item_a, y.it AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bounded x JOIN bounded y ON x.g = y.g AND x.it < y.it
      GROUP BY x.it, y.it
      HAVING COUNT(*) >= {min_support}
    )
    SELECT p.item_a, p.item_b, p.n_ab, sa.n AS n_a, sb.n AS n_b,
           p.n_ab / CAST(sa.n AS DOUBLE) AS conf_a_b,
           p.n_ab / CAST(sb.n AS DOUBLE) AS conf_b_a,
           CAST(p.n_ab AS DOUBLE) * nb.N / (sa.n * sb.n) AS lift
    FROM pairs p
    JOIN sup sa ON sa.it = p.item_a
    JOIN sup sb ON sb.it = p.item_b
    CROSS JOIN nb
    """


def frequent_triples(
    df: DataFrame,
    basket_cols: list,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Level-3 frequent itemsets (Apriori's triple pass): count
    unordered item TRIPLES co-present in a basket, keep support >=
    ``min_support`` — the next rung above :func:`association_rules`'
    pairs for "what three behaviors cluster" questions.

    Scale containment: baskets reduce to DISTINCT (basket, item)
    first; the triple join is a 3-way self-equi-join on the basket
    key with a < ordering chain, so per-basket cost is C(k,3) over
    the basket's DISTINCT item count — bounded when baskets are
    (as in any behavioral log with a small event taxonomy). Counts
    are exact bigints; support_frac is one exact division. Output:
    (item_a, item_b, item_c, n_baskets, support_frac).
    """
    b = df.select(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in basket_cols])
        .alias("bk"),
        F.col(item_col).alias("i"),
    ).distinct()
    tot = b.agg(
        F.countDistinct("bk").cast("bigint").alias("__tot")
    )
    t1 = b.select("bk", F.col("i").alias("item_a"))
    t2 = b.select("bk", F.col("i").alias("item_b"))
    t3 = b.select("bk", F.col("i").alias("item_c"))
    triples = (
        t1.join(t2, "bk")
        .where(F.col("item_a") < F.col("item_b"))
        .join(t3, "bk")
        .where(F.col("item_b") < F.col("item_c"))
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
    )
    return triples.crossJoin(F.broadcast(tot)).select(
        "item_a",
        "item_b",
        "item_c",
        "n_baskets",
        (F.col("n_baskets").cast("double") / F.col("__tot")).alias(
            "support_frac"
        ),
    )


def frequent_triples_sql(
    table_sql: str,
    basket_cols: list,
    item_col: str,
    min_support: int = 2,
) -> str:
    """DuckDB twin of :func:`frequent_triples`; ``table_sql`` yields
    the basket rows."""
    bk = " || chr(31) || ".join(
        f"CAST({c} AS VARCHAR)" for c in basket_cols
    )
    return f"""
    WITH b AS (
      SELECT DISTINCT {bk} AS bk, {item_col} AS i FROM ({table_sql})
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM b),
    triples AS (
      SELECT t1.i AS item_a, t2.i AS item_b, t3.i AS item_c,
             CAST(COUNT(*) AS BIGINT) AS n_baskets
      FROM b t1
      JOIN b t2 ON t2.bk = t1.bk AND t1.i < t2.i
      JOIN b t3 ON t3.bk = t1.bk AND t2.i < t3.i
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= {min_support}
    )
    SELECT item_a, item_b, item_c, n_baskets,
           CAST(n_baskets AS DOUBLE) / tot.n AS support_frac
    FROM triples CROSS JOIN tot
    """

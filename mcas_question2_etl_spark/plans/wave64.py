"""Wave-64 extension specs: exact Shapley channel attribution, Wilson
proportion intervals, stratified ATE, rich-club coefficient,
Elias-gamma postings-compression estimate.

Reference scope: beyond-reference analytics (SURVEY §2.13). Shapley
completes the attribution family (last-touch, position-based) with the
game-theoretic allocator — exact over the 2^3 coalition lattice, no
sampling; the ATE spec adds stratification to the causal family
(DiD/CUPED/synthetic control); rich-club extends the graph-motif
family; the gamma-bits spec sizes the inverted index the BM25 path
serves from.
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --------------------------------------------------------------------------
# Shapley attribution: players are the three touch channels, the
# characteristic function is the conversion rate of the EXACT-set
# exposure cohort (v(empty) = baseline conversion of untouched users).
# With 3 players the coalition lattice is 8 cohorts and the Shapley sum
# has 4 terms per player — exact, no permutation sampling. The marginal
# table below is generated once and embedded as literals in BOTH
# engines, so the only data-dependent inputs are the 8 cohort rates.
# --------------------------------------------------------------------------

_CHANNELS = ("click", "view", "signup")  # bit 1, 2, 4


def _shapley_marginals() -> list[tuple[str, int, int, float]]:
    """(channel, mask_without, mask_with, weight) — weight =
    |S|! (n-|S|-1)! / n! for each S not containing the player."""
    rows = []
    n = len(_CHANNELS)
    for i, ch in enumerate(_CHANNELS):
        others = [b for b in range(n) if b != i]
        for r in range(n):
            for subset in combinations(others, r):
                m0 = sum(1 << b for b in subset)
                w = factorial(r) * factorial(n - r - 1) / factorial(n)
                rows.append((ch, m0, m0 | (1 << i), w))
    return rows


_MARGINALS = _shapley_marginals()

_COHORT_SQL = """
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS rate
      FROM (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    + 2 * MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS INTEGER) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM events GROUP BY user_id
      ) GROUP BY mask
"""

_MARGINAL_VALUES = ",\n      ".join(
    f"('{ch}', {m0}, {m1}, CAST({w!r} AS DOUBLE))" for ch, m0, m1, w in _MARGINALS
)


@_spec(
    "shapley_channel_attribution",
    f"""
    WITH cohorts AS ({_COHORT_SQL}),
    marg AS (
      SELECT * FROM (VALUES
      {_MARGINAL_VALUES}
      ) AS t(channel, m0, m1, w)
    )
    SELECT marg.channel,
           ROUND(SUM(marg.w * (COALESCE(c1.rate, 0.0)
                               - COALESCE(c0.rate, 0.0))), 6) AS shapley
    FROM marg
    LEFT JOIN cohorts c0 ON c0.mask = marg.m0
    LEFT JOIN cohorts c1 ON c1.mask = marg.m1
    GROUP BY marg.channel
    """,
    "attribution op — exact Shapley value allocation over the "
    "{{click, view, signup}} exposure lattice (v = exact-set cohort "
    "conversion rate, empty cohorts contribute 0): one user groupBy "
    "builds the 8-row cohort table, the 12-row literal marginal "
    "table broadcast-joins it twice; no permutation sampling.",
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.groupBy("user_id")
        .agg(
            (
                F.max((F.col("event_type") == "click").cast("int"))
                + 2 * F.max((F.col("event_type") == "view").cast("int"))
                + 4 * F.max((F.col("event_type") == "signup").cast("int"))
            )
            .cast("int")
            .alias("mask"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        )
        .groupBy("mask")
        .agg(
            (F.sum("conv").cast("double") / F.count(F.lit(1))).alias("rate")
        )
    )
    marg = spark.createDataFrame(
        _MARGINALS, "channel string, m0 int, m1 int, w double"
    )
    c0 = cohorts.select(F.col("mask").alias("m0"), F.col("rate").alias("r0"))
    c1 = cohorts.select(F.col("mask").alias("m1"), F.col("rate").alias("r1"))
    return (
        marg.join(F.broadcast(c0), "m0", "left")
        .join(F.broadcast(c1), "m1", "left")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum(
                    F.col("w")
                    * (
                        F.coalesce(F.col("r1"), F.lit(0.0))
                        - F.coalesce(F.col("r0"), F.lit(0.0))
                    )
                ),
                6,
            ).alias("shapley")
        )
    )


#: z for the 95% Wilson interval — shared literal so both engines
#: square and divide the same double.
_WILSON_Z = 1.959963984540054


@_spec(
    "wilson_ci_by_source",
    f"""
    WITH agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS p
      FROM documents GROUP BY source
    )
    SELECT source, n, ROUND(p, 6) AS p,
           ROUND((p + z2 / (2 * n)) / (1 + z2 / n)
                 - CAST({_WILSON_Z!r} AS DOUBLE)
                   * sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n),
                 6) AS ci_lo,
           ROUND((p + z2 / (2 * n)) / (1 + z2 / n)
                 + CAST({_WILSON_Z!r} AS DOUBLE)
                   * sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n),
                 6) AS ci_hi
    FROM (SELECT *, CAST({_WILSON_Z!r} AS DOUBLE)
                    * CAST({_WILSON_Z!r} AS DOUBLE) AS z2 FROM agg)
    """,
    "stats op — Wilson score 95% intervals for the per-source "
    "English rate (the proportion CI that behaves at small n and "
    "p near 0/1, unlike the Wald interval): one groupBy, closed "
    "form, exact integer inputs.",
)
def wilson_ci_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum((F.col("lang") == "en").cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("p"),
    )
    z = F.lit(_WILSON_Z)
    z2 = z * z
    n = F.col("n")
    p = F.col("p")
    center = (p + z2 / (2 * n)) / (1 + z2 / n)
    half = z * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n)
    return agg.select(
        "source",
        "n",
        F.round(p, 6).alias("p"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


@_spec(
    "stratified_ate_signup",
    """
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS treated,
             SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
               AS y,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT CAST(least(n_events // 8, 12) AS BIGINT) AS stratum,
             treated, y
      FROM users
    ),
    cells AS (
      SELECT stratum, treated, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy
      FROM strat GROUP BY stratum, treated
    ),
    paired AS (
      SELECT t.stratum, t.n + c.n AS n_b,
             t.sy / t.n - c.sy / c.n AS diff
      FROM cells t JOIN cells c
        ON c.stratum = t.stratum AND t.treated = 1 AND c.treated = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(n_b) AS BIGINT) AS n_users,
           ROUND(SUM(n_b * diff) / SUM(n_b), 4) AS ate
    FROM paired
    """,
    "causal op — stratified average treatment effect of 'has signup' "
    "on total purchase value, strata = integer activity buckets "
    "(n_events div 8 capped at 12 — exact integer keys, no float "
    "quantile boundaries): per-stratum treated-minus-control means "
    "weighted by stratum mass; strata missing either arm drop out "
    "(the standard overlap requirement). Two groupBys, no window.",
)
def stratified_ate_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("int")).alias("treated"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
        F.count(F.lit(1)).alias("n_events"),
    )
    strat = users.select(
        F.least((F.col("n_events") / 8).cast("long"), F.lit(12).cast("long")).alias(
            "stratum"
        ),
        "treated",
        "y",
    )
    cells = strat.groupBy("stratum", "treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").alias("sy")
    )
    t = cells.filter(F.col("treated") == 1).select(
        "stratum", F.col("n").alias("nt"), F.col("sy").alias("syt")
    )
    c = cells.filter(F.col("treated") == 0).select(
        "stratum", F.col("n").alias("nc"), F.col("sy").alias("syc")
    )
    paired = t.join(c, "stratum").select(
        (F.col("nt") + F.col("nc")).alias("n_b"),
        (F.col("syt") / F.col("nt") - F.col("syc") / F.col("nc")).alias("diff"),
    )
    return paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("n_b").cast("long").alias("n_users"),
        F.round(F.sum(F.col("n_b") * F.col("diff")) / F.sum("n_b"), 4).alias(
            "ate"
        ),
    )


_RICH_KS = (2, 4, 8)

_RC_EDGES_CTE = """
    members AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ), bounded AS MATERIALIZED (
      SELECT g, item FROM members
      WHERE g IN (SELECT g FROM members GROUP BY g
                  HAVING COUNT(*) <= 8)
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT a.item AS a, b.item AS b
      FROM bounded a JOIN bounded b ON a.g = b.g AND a.item < b.item
    )"""


@_spec(
    "rich_club_copurchase",
    f"""
    WITH {_RC_EDGES_CTE.strip().lstrip(',')},
    deg AS MATERIALIZED (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0
      ) GROUP BY n
    ),
    ks AS (SELECT CAST(unnest([{", ".join(map(str, _RICH_KS))}]) AS BIGINT) AS k),
    club_nodes AS (
      SELECT ks.k, deg.n FROM ks JOIN deg ON deg.d > ks.k
    ),
    club_edges AS (
      SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
      FROM ks JOIN e0 ON TRUE
      JOIN deg da ON da.n = e0.a JOIN deg db ON db.n = e0.b
      WHERE da.d > ks.k AND db.d > ks.k
      GROUP BY ks.k
    )
    SELECT cn.k,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MAX(COALESCE(ce.e_k, 0)) AS n_edges,
           ROUND(2.0 * MAX(COALESCE(ce.e_k, 0))
                 / (COUNT(*) * (COUNT(*) - 1)), 6) AS phi
    FROM club_nodes cn LEFT JOIN club_edges ce ON ce.k = cn.k
    GROUP BY cn.k
    HAVING COUNT(*) >= 2
    """,
    "graph op — rich-club coefficient phi(k) of the co-purchase "
    "graph (Zhou & Mondragon 2004): density among nodes of degree "
    "> k for k in {{2,4,8}}; degrees from one aggregation, club "
    "edges from two node-id equi-joins per k, exact integer counts.",
)
def rich_club_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph_metrics import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem")
    e = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    ).localCheckpoint(eager=False)
    parts = []
    for k in _RICH_KS:
        nodes_k = deg.filter(F.col("d") > k).agg(
            F.lit(int(k)).cast("bigint").alias("k"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
        edges_k = (
            e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
            .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
            .filter((F.col("da") > k) & (F.col("db") > k))
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        )
        parts.append(nodes_k.crossJoin(edges_k))
    from functools import reduce

    out = reduce(DataFrame.unionByName, parts).filter(F.col("n_nodes") >= 2)
    return out.select(
        "k",
        "n_nodes",
        "n_edges",
        F.round(
            2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
            6,
        ).alias("phi"),
    )


@_spec(
    "postings_gamma_bits",
    """
    WITH posts AS (
      SELECT term, doc_id,
             doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
               AS gap
      FROM (
        SELECT DISTINCT u.term, doc_id
        FROM documents, LATERAL unnest(string_split(lower(text), ' '))
             AS u(term)
        WHERE u.term <> ''
      )
    ),
    bits AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(2 * (length(bin(COALESCE(gap, doc_id + 1))) - 1) + 1)
                  AS BIGINT) AS gamma_bits
      FROM posts GROUP BY term
    )
    SELECT CAST(length(bin(df)) AS BIGINT) AS df_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(df) AS BIGINT) AS n_postings,
           CAST(SUM(gamma_bits) AS BIGINT) AS gamma_bits,
           ROUND(CAST(SUM(gamma_bits) AS DOUBLE) / SUM(df), 4)
             AS bits_per_posting
    FROM bits GROUP BY length(bin(df))
    """,
    "index op — Elias-gamma compressed size of the inverted index's "
    "d-gap posting lists (Witten/Moffat/Bell 'Managing Gigabytes'), "
    "the sizing companion to inverted_index_postings: gamma(g) = "
    "2*floor(log2 g)+1 bits computed EXACTLY as binary-string length "
    "(no float log2 at power-of-two boundaries); first posting "
    "encodes doc_id+1. Per df-magnitude bucket: postings and bits.",
)
def postings_gamma_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    posts = toks.select(
        "term",
        "doc_id",
        (F.col("doc_id") - F.lag("doc_id").over(w)).alias("gap"),
    )
    g = F.coalesce(F.col("gap"), F.col("doc_id") + 1)
    gbits = 2 * (F.length(F.conv(g.cast("string"), 10, 2)) - 1) + 1
    bits = posts.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(gbits.cast("long")).cast("long").alias("gamma_bits"),
    )
    bucket = F.length(F.conv(F.col("df").cast("string"), 10, 2)).cast("long")
    return bits.groupBy(bucket.alias("df_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("gamma_bits").cast("long").alias("gamma_bits"),
        F.round(
            F.sum("gamma_bits").cast("double") / F.sum("df"), 4
        ).alias("bits_per_posting"),
    )

"""Wave-65 extension specs: Good-Turing frequency smoothing, Kendall
tau-b, Cochran-Armitage trend test, simplified silhouette, Lorenz
curve deciles.

Reference scope: beyond-reference analytics (SURVEY §2.13).
Good-Turing is the classic language-model mass-reallocation estimator
(completes the unigram/bigram LM family); the silhouette spec is the
cluster-quality companion to kmeans_cluster_stats; Kendall joins
Spearman in the rank-correlation family; Cochran-Armitage adds the
ordered-proportion trend test; Lorenz deciles tabulate the curve the
Gini specs integrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import kmeans
from ..operators.ranking import with_ntile
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "good_turing_smoothing",
    """
    WITH freqs AS (
      SELECT u.term, CAST(COUNT(*) AS BIGINT) AS r
      FROM documents, LATERAL unnest(string_split(lower(text), ' ')) AS u(term)
      WHERE u.term <> ''
      GROUP BY u.term
    ),
    fof AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM freqs GROUP BY r
    )
    SELECT a.r, a.n_r,
           ROUND((a.r + 1) * COALESCE(b.n_r, 0) / CAST(a.n_r AS DOUBLE), 6)
             AS r_star
    FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
    WHERE a.r <= 10
    """,
    "LM op — Good-Turing smoothed counts r* = (r+1) N_{r+1}/N_r over "
    "the token frequency-of-frequencies (Good 1953; the estimator "
    "behind Katz backoff): one token groupBy, one tiny "
    "frequency-histogram self-join; exact integer inputs. Reported "
    "for the low-count head (r <= 10) where smoothing matters.",
)
def good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    fof = freqs.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    nxt = fof.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next"))
    return (
        fof.join(nxt, "r", "left")
        .filter(F.col("r") <= 10)
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_next"), F.lit(0))
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
        )
    )


@_spec(
    "kendall_tau_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS p,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.p - b.p) * (a.c - b.c) > 0 THEN 1 ELSE 0 END AS con,
             CASE WHEN (a.p - b.p) * (a.c - b.c) < 0 THEN 1 ELSE 0 END AS dis
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    t1 AS (SELECT SUM(tp * (tp - 1) / 2) AS ties FROM
           (SELECT COUNT(*) AS tp FROM daily GROUP BY p)),
    t2 AS (SELECT SUM(tc * (tc - 1) / 2) AS ties FROM
           (SELECT COUNT(*) AS tc FROM daily GROUP BY c)),
    agg AS (
      SELECT CAST(SUM(con) AS BIGINT) AS concordant,
             CAST(SUM(dis) AS BIGINT) AS discordant
      FROM pairs
    )
    SELECT np.n AS n_days, agg.concordant, agg.discordant,
           ROUND((agg.concordant - agg.discordant)
                 / sqrt((np.n * (np.n - 1) / 2.0 - t1.ties)
                        * (np.n * (np.n - 1) / 2.0 - t2.ties)), 6) AS tau_b
    FROM agg, np, t1, t2
    """,
    "stats op — Kendall tau-b (tie-corrected) between daily purchase "
    "and click counts, Spearman's companion: the all-pairs kernel is "
    "BOUNDED by the day axis (series-length^2, never event rows — "
    "the same documented bounded-kernel discipline as the exact "
    "Jaccard verifiers), tie terms from two tiny group-bys, all "
    "integer until the final ratio.",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("p"),
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("long")
        .alias("c"),
    ).localCheckpoint(eager=False)
    a = daily.select(
        F.col("day").alias("da"), F.col("p").alias("pa"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("p").alias("pb"), F.col("c").alias("cb")
    )
    sgn = (F.col("pa") - F.col("pb")) * (F.col("ca") - F.col("cb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        (sgn > 0).cast("int").alias("con"), (sgn < 0).cast("int").alias("dis")
    )
    agg = pairs.agg(
        F.sum("con").cast("long").alias("concordant"),
        F.sum("dis").cast("long").alias("discordant"),
    )
    np_ = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    t1 = (
        daily.groupBy("p")
        .agg(F.count(F.lit(1)).alias("tp"))
        .agg(F.sum(F.col("tp") * (F.col("tp") - 1) / 2).alias("ties1"))
    )
    t2 = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).alias("tc"))
        .agg(F.sum(F.col("tc") * (F.col("tc") - 1) / 2).alias("ties2"))
    )
    n = F.col("n_days")
    n0 = n * (n - 1) / 2.0
    return (
        agg.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "n_days",
            "concordant",
            "discordant",
            F.round(
                (F.col("concordant") - F.col("discordant"))
                / F.sqrt((n0 - F.col("ties1")) * (n0 - F.col("ties2"))),
                6,
            ).alias("tau_b"),
        )
    )


@_spec(
    "cochran_armitage_trend",
    """
    WITH cells AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x_i
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(n_i) AS DOUBLE) AS n,
             CAST(SUM(x_i) AS DOUBLE) AS x,
             SUM(s * x_i) AS sx,
             SUM(s * n_i) AS sn,
             SUM(s * s * n_i) AS ssn
      FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND((sx - sn * (x / n))
                 / sqrt((x / n) * (1 - x / n) * (ssn - sn * sn / n)),
                 4) AS z_trend,
           ROUND(POW((sx - sn * (x / n)), 2)
                 / ((x / n) * (1 - x / n) * (ssn - sn * sn / n)),
                 4) AS chi2_trend
    FROM m
    """,
    "stats op — Cochran-Armitage trend test: is the order-failure "
    "rate monotone in the priority score (ordinal 1..5 parsed from "
    "the priority label)? One groupBy to 5 cells, closed-form z from "
    "exact integer moments.",
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("long")
        .alias("x_i"),
    )
    m = cells.agg(
        F.sum("n_i").cast("double").alias("n"),
        F.sum("x_i").cast("double").alias("x"),
        F.sum(F.col("s") * F.col("x_i")).alias("sx"),
        F.sum(F.col("s") * F.col("n_i")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i")).alias("ssn"),
    )
    p = F.col("x") / F.col("n")
    num = F.col("sx") - F.col("sn") * p
    var = p * (1 - p) * (F.col("ssn") - F.col("sn") * F.col("sn") / F.col("n"))
    return m.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(num / F.sqrt(var), 4).alias("z_trend"),
        F.round(F.pow(num, 2) / var, 4).alias("chi2_trend"),
    )


@_spec(
    "simplified_silhouette_report",
    kmeans.simplified_silhouette_sql(k=8, iters=2),
    "ML-eval op — per-cluster simplified silhouette over the trained "
    "k-means codebook (operators/kmeans.py): a/b from the broadcast "
    "k-row codebook in one narrow sorted-struct expression (the "
    "full pairwise silhouette's O(n^2) replaced by O(n*k)); exact "
    "Q20 squared distances under the sqrt.",
)
def simplified_silhouette_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans.simplified_silhouette(emb, k=8, iters=2)


@_spec(
    "lorenz_curve_deciles",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS y
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT y, CAST(ntile(10) OVER (ORDER BY y, o_custkey) AS INTEGER)
               AS decile
      FROM spend
    ),
    per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(y) AS dy
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT SUM(dy) AS ty FROM per)
    SELECT decile, n_customers,
           ROUND(dy / ty, 6) AS share,
           ROUND(SUM(dy) OVER (ORDER BY decile
                               ROWS UNBOUNDED PRECEDING) / ty, 6)
             AS cum_share
    FROM per CROSS JOIN tot
    """,
    "econ op — Lorenz curve at decile resolution over per-customer "
    "spend (the tabulated curve the Gini specs integrate): deciles "
    "via the two-phase distributed NTILE, DECIMAL-exact spend sums, "
    "cumulative shares over the 10-row decile table only.",
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    ranked = with_ntile(spend, [F.col("y"), F.col("o_custkey")], 10, out_col="decile")
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("y").alias("dy"),
    )
    tot = per.agg(F.sum("dy").alias("ty"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.round(F.col("dy") / F.col("ty"), 6).alias("share"),
            F.round(F.sum("dy").over(w) / F.col("ty"), 6).alias("cum_share"),
        )
    )

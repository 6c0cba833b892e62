"""Maximum Mean Discrepancy (MMD) two-sample drift testing over
embedding columns, via Random Fourier Features (Rahimi & Recht,
NeurIPS 2007; Gretton et al., JMLR 2012).

The quadratic-time MMD² estimator needs |P|x|Q| kernel evaluations —
a non-starter on a 100-TB corpus. RFF makes it ONE SCAN: with
``z(x) = sqrt(2/D) * cos(W x + b)``, ``W ~ N(0, 1/sigma²)``,
``b ~ U[0, 2pi)``, the RBF kernel is ``k(x,y) ~ z(x)·z(y)``, so

    MMD²_rff = || mean_P z  -  mean_Q z ||²

— per-group means of a D-dim feature, a 2·D-row shuffle, then a
closed-form distance on the driver-side-tiny result.

Determinism discipline (wave 118): W and b are md5-derived constants
EMBEDDED AS LITERALS in both the Spark plan and the DuckDB oracle (no
RNG state, no per-row hashing); each cos() feature is rounded to 6 dp
(java.lang.Math.cos and libm may differ in the last ulp — the repo's
trig rule, cf. haversine) and accumulated as exact DECIMAL(10,6), so
the group means are bit-identical across engines and partition orders.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_uniform(tag: str, i: int) -> float:
    """Deterministic U[0,1) from md5 — no RNG state, identical anywhere."""
    h = hashlib.md5(f"mmd:{tag}:{i}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def rff_params(dim: int, n_features: int, sigma: float):
    """Box-Muller Gaussians for W (n_features x dim, scaled 1/sigma)
    and uniform phases b (n_features), all md5-derived constants."""
    w: list[list[float]] = []
    for d in range(n_features):
        row = []
        for k in range(dim):
            i = d * dim + k
            u1 = _md5_uniform("u1", i)
            u2 = _md5_uniform("u2", i)
            g = math.sqrt(-2.0 * math.log(1.0 - u1)) * math.cos(
                2.0 * math.pi * u2
            )
            row.append(round(g / sigma, 9))
        w.append(row)
    b = [
        round(2.0 * math.pi * _md5_uniform("b", d), 9)
        for d in range(n_features)
    ]
    return w, b


def _w_literal_spark(w: list[list[float]]) -> str:
    rows = ", ".join(
        "array(" + ", ".join(f"{v}D" for v in row) + ")" for row in w
    )
    return f"array({rows})"


def _b_literal_spark(b: list[float]) -> str:
    return "array(" + ", ".join(f"{v}D" for v in b) + ")"


def mmd_rff(
    emb: DataFrame,
    group_col,
    vec_col: str = "embedding",
    n_features: int = 32,
    sigma: float = 4.0,
    dim: int = 64,
    round_to: int = 9,
) -> DataFrame:
    """RFF-MMD² between the two groups defined by boolean ``group_col``
    (an expression; True = P, False = Q).

    Output (one row): (n_p, n_q, mmd2, mmd_scaled) where mmd_scaled =
    (n_p·n_q/(n_p+n_q)) · MMD² — the statistic whose null distribution
    is asymptotically pivotal, so it is comparable across corpus sizes.

    Plan: one scan computing the D rounded-cos features (array
    expressions, no Python), posexplode to (group, d, feature) — 2·D
    partial aggregates map-side — then a D-row join and a 1-row
    reduction. Feature sums are exact DECIMAL(28,6).
    """
    w, b = rff_params(dim, n_features, sigma)
    wlit, blit = _w_literal_spark(w), _b_literal_spark(b)
    scale = math.sqrt(2.0 / n_features)
    z = (
        f"transform(sequence(0, {n_features - 1}), d -> "
        f"cast(round({scale} * cos("
        f"aggregate(zip_with({wlit}[d], __x, (wv, xv) -> wv * xv), "
        f"cast(0.0 as double), (acc, v) -> acc + v) + {blit}[d]"
        f"), {6}) as decimal(10,6)))"
    )
    staged = emb.select(
        group_col.alias("__p"),
        F.col(vec_col).cast("array<double>").alias("__x"),
    ).withColumn("__z", F.expr(z))
    longf = staged.select(
        "__p", F.posexplode("__z").alias("d", "feat")
    )
    means = longf.groupBy("__p", "d").agg(
        F.sum("feat").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    p = means.filter(F.col("__p")).select(
        "d",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mp"),
        F.col("n").alias("np"),
    )
    q = means.filter(~F.col("__p")).select(
        "d",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mq"),
        F.col("n").alias("nq"),
    )
    diff = p.join(q, "d")
    out = diff.agg(
        F.max("np").alias("n_p"),
        F.max("nq").alias("n_q"),
        F.sum(
            (F.col("mp") - F.col("mq")) * (F.col("mp") - F.col("mq"))
        ).alias("__mmd2"),
    )
    nn = F.col("n_p").cast("double") * F.col("n_q").cast("double") / (
        F.col("n_p") + F.col("n_q")
    ).cast("double")
    return out.select(
        "n_p",
        "n_q",
        F.round("__mmd2", round_to).alias("mmd2"),
        F.round(nn * F.col("__mmd2"), round_to).alias("mmd_scaled"),
    )


def mmd_rff_sql(
    emb_sql: str,
    group_expr: str,
    vec_col: str = "embedding",
    n_features: int = 32,
    sigma: float = 4.0,
    dim: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`mmd_rff` (same embedded W/b literals, same
    6-dp feature rounding, same DECIMAL accumulation)."""
    w, b = rff_params(dim, n_features, sigma)
    wrows = ", ".join(
        "[" + ", ".join(f"{v}" for v in row) + "]" for row in w
    )
    blit = "[" + ", ".join(f"{v}" for v in b) + "]"
    scale = math.sqrt(2.0 / n_features)
    return f"""
    WITH e AS ({emb_sql}),
    wb AS (SELECT [{wrows}] AS w, {blit} AS b),
    staged AS (
      SELECT ({group_expr}) AS p,
             list_transform(range(1, {n_features + 1}), d ->
               CAST(round({scale} * cos(
                 list_sum(list_transform(range(1, {dim + 1}, 1), kk ->
                   w[d][kk] * CAST({vec_col}[kk] AS DOUBLE)))
                 + b[d]), 6) AS DECIMAL(10,6))) AS z
      FROM e CROSS JOIN wb
    ),
    longf AS (
      SELECT p, u.d, u.feat FROM staged,
        LATERAL (SELECT UNNEST(range(1, {n_features + 1})) AS d,
                        UNNEST(z) AS feat) u
    ),
    means AS (
      SELECT p, d, SUM(feat) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM longf GROUP BY p, d
    ),
    diff AS (
      SELECT pp.d,
             CAST(pp.s AS DOUBLE) / pp.n AS mp,
             CAST(qq.s AS DOUBLE) / qq.n AS mq,
             pp.n AS np, qq.n AS nq
      FROM (SELECT * FROM means WHERE p) pp
      JOIN (SELECT * FROM means WHERE NOT p) qq USING (d)
    )
    SELECT MAX(np) AS n_p,
           MAX(nq) AS n_q,
           ROUND(SUM((mp - mq) * (mp - mq)), {round_to}) AS mmd2,
           ROUND(CAST(MAX(np) AS DOUBLE) * MAX(nq)
                 / (MAX(np) + MAX(nq))
                 * SUM((mp - mq) * (mp - mq)), {round_to}) AS mmd_scaled
    FROM diff
    """

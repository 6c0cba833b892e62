"""Multinomial naive-Bayes source classifier with a resubstitution
confusion matrix.

Trains the classic add-one-smoothed multinomial NB on (token, label)
counts and scores every document against every label, reporting the
label-vs-argmax confusion matrix — the standard fast baseline for
"is this column predictable from the text?" (source/domain leakage
checks, weak-label quality audits, routing). Resubstitution (train =
eval corpus) is deliberate: the confusion matrix measures how
SEPARABLE the labels are, the audit question; plug a held-out split
from cv_fold_assignment in front for generalization numbers.

Determinism discipline: the float-hostile part of NB is the per-doc
log-likelihood SUM — thousands of doubles whose accumulation order
Spark does not fix, and an argmax sitting on top turns ulp noise into
a DISCRETE flip. Each token/prior log-probability is therefore cast
once to DECIMAL(20,12) (both engines round-half-up the same double to
12 fixed decimals; ln values are ~1e-16-relative identical, so a flip
requires the libm result to sit within an ulp of a half-ulp decimal
boundary AND the resulting 1e-12 score nudge to cross an argmax tie —
compounded improbability), after which every score is an EXACT,
order-free decimal sum and the argmax (tie broken by label ascending)
is engine-stable.

Scale shape: training is one explode + one (label, token) aggregation
— vocabulary-sized output (Zipf-tiny), broadcast everywhere. Scoring
re-explodes the corpus once, joins each token to its |labels| smoothed
log-probs via broadcast, and aggregates per (doc, label): the widest
thing shuffled is |labels| fixed-width rows per corpus token.
Unseen-token mass needs no vocab x label grid: a token absent from a
label contributes ln(1/(n_l+V)), so the per-label UNSEEN constant is
factored out and each (label, token) row carries its log-prob DELTA
against it — the join stays vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(20,12)"


def nbayes_confusion(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
) -> DataFrame:
    """(actual, predicted, n_docs) under add-one multinomial NB with
    document-frequency priors; argmax ties break by label ascending."""
    toks = df.select(
        F.col(id_col),
        F.col(label_col).alias("__y"),
        F.explode(F.split(F.col(text_col), " ")).alias("__t"),
    )
    vocab_n = toks.select("__t").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__V")
    )
    lab_tok = toks.groupBy("__y", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    lab_tot = lab_tok.groupBy("__y").agg(F.sum("__c").alias("__n"))
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("__totdocs"))
    prior = (
        df.groupBy(F.col(label_col).alias("__y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__d"))
        .crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(lab_tot), "__y")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "__y",
            F.log(F.col("__d") / F.col("__totdocs")).cast(_DEC).alias("__lp_prior"),
            # per-token unseen floor ln(1/(n_y+V)), paid once per token
            F.log(F.lit(1.0) / (F.col("__n") + F.col("__V")))
            .cast(_DEC)
            .alias("__lp_unseen"),
        )
    )
    # seen-token delta over the unseen floor: ln(c+1) exactly
    deltas = lab_tok.select(
        "__y", "__t", F.log(F.col("__c") + 1).cast(_DEC).alias("__dlp")
    )
    doc_len = toks.groupBy(id_col, "__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__len")
    )
    return _confusion_from_parts(toks, deltas, prior, doc_len, id_col)


def _confusion_from_parts(toks, deltas, prior, doc_len, id_col):
    d = deltas.select(
        F.col("__t").alias("__dt"),
        F.col("__y").alias("__ly"),
        "__dlp",
    )
    seen = (
        toks.join(F.broadcast(d), toks["__t"] == d["__dt"])
        .groupBy(F.col(id_col), F.col("__y").alias("__actual"), F.col("__ly"))
        .agg(F.sum("__dlp").alias("__seen"))
    )
    # every (doc, label) pair gets the baseline len * lp_unseen + prior,
    # plus the seen-token deltas (0 for labels sharing no token)
    base = doc_len.select(
        F.col(id_col), F.col("__y").alias("__actual"), "__len"
    ).crossJoin(F.broadcast(prior.select(F.col("__y").alias("__ly"), "__lp_prior", "__lp_unseen")))
    scored = (
        base.join(seen, [id_col, "__actual", "__ly"], "left")
        .select(
            F.col(id_col),
            "__actual",
            "__ly",
            (
                F.col("__lp_prior")
                + F.col("__len") * F.col("__lp_unseen")
                + F.coalesce(F.col("__seen"), F.lit(0).cast("decimal(20,12)"))
            ).alias("__score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(), F.col("__ly"))
    pred = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
    )
    return (
        pred.groupBy(
            F.col("__actual").alias("actual"), F.col("__ly").alias("predicted")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def nbayes_confusion_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
) -> str:
    """DuckDB twin of :func:`nbayes_confusion`."""
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT {id_col} AS id, {label_col} AS y,
             unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS V FROM toks),
    lab_tok AS (
      SELECT y, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY y, t
    ),
    lab_tot AS (SELECT y, CAST(SUM(c) AS BIGINT) AS n FROM lab_tok GROUP BY y),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS D FROM {table}),
    prior AS (
      SELECT p.y,
             CAST(ln(p.d / CAST(nd.D AS DOUBLE)) AS DECIMAL(20,12)) AS lp_prior,
             CAST(ln(1.0 / (lt.n + vocab.V)) AS DECIMAL(20,12)) AS lp_unseen
      FROM (SELECT {label_col} AS y, CAST(COUNT(*) AS BIGINT) AS d
            FROM {table} GROUP BY 1) p, nd, vocab, lab_tot lt
      WHERE lt.y = p.y
    ),
    deltas AS (
      SELECT y AS ly, t, CAST(ln(CAST(c + 1 AS DOUBLE)) AS DECIMAL(20,12)) AS dlp
      FROM lab_tok
    ),
    doc_len AS (
      SELECT id, y AS actual, CAST(COUNT(*) AS BIGINT) AS len
      FROM toks GROUP BY id, y
    ),
    seen AS (
      SELECT toks.id, toks.y AS actual, d.ly, SUM(d.dlp) AS s
      FROM toks JOIN deltas d ON d.t = toks.t
      GROUP BY toks.id, toks.y, d.ly
    ),
    scored AS (
      SELECT dl.id, dl.actual, pr.y AS ly,
             pr.lp_prior + dl.len * pr.lp_unseen
               + COALESCE(seen.s, CAST(0 AS DECIMAL(20,12))) AS score
      FROM doc_len dl
      CROSS JOIN prior pr
      LEFT JOIN seen ON seen.id = dl.id AND seen.ly = pr.y
    ),
    pred AS (
      SELECT id, actual, ly,
             row_number() OVER (
               PARTITION BY id ORDER BY score DESC, ly
             ) AS rk
      FROM scored
    )
    SELECT actual, ly AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY actual, ly
    """

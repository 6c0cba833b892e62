"""Per-document Shannon entropy quality signals — zero-shuffle.

Character- and token-level entropy are classic corpus-quality gates
(low char entropy ~ boilerplate/repetition, near-uniform ~ random
bytes; token entropy separates template spam from prose) and a cheap
proxy for compression ratio, the signal CCNet/RefinedWeb-style
pipelines use to drop machine-generated filler.

Scale shape: the whole computation is a PER-ROW Catalyst expression —
``array_sort`` + one ``aggregate`` fold over the sorted array counts
runs and accumulates Σ n_c·ln n_c in a single pass, so entropy is
computed inside the scan stage with ZERO shuffle and no Python. The
equivalent explode→groupBy(doc, char) formulation (what the DuckDB
oracle runs, making the differential genuinely two-sided) would
shuffle one row per CHARACTER — O(corpus bytes) — at 100 TB; the fold
shuffles nothing.

Entropy identity used: H = ln L − (Σ_c n_c ln n_c)/L  (nats), which
needs only the run-length fold, not per-class probabilities.

Reference scope: the reference repo (pandas/R ETL) has no
corpus-quality layer; this extends SURVEY.md §2.13's text-analysis
surface alongside gopher_quality_report / unigram_logprob_quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _run_nlogn(arr_sql: str) -> str:
    """Spark SQL expression: Σ n_c ln n_c over the value-runs of a
    sorted copy of ``arr_sql`` — one sequential fold, O(L log L) for
    the sort, no shuffle."""
    return f"""
    aggregate(
      array_sort({arr_sql}),
      named_struct('prev', cast(null as string),
                   'run',  cast(0 as bigint),
                   'acc',  cast(0.0 as double)),
      (s, x) -> CASE WHEN s.prev IS NOT NULL AND x = s.prev
           THEN named_struct('prev', s.prev, 'run', s.run + cast(1 as bigint),
                             'acc', s.acc)
           ELSE named_struct('prev', x, 'run', cast(1 as bigint),
                'acc', s.acc + CASE WHEN s.run > 1
                     THEN cast(s.run as double) * ln(cast(s.run as double))
                     ELSE cast(0.0 as double) END) END,
      s -> s.acc + CASE WHEN s.run > 1
           THEN cast(s.run as double) * ln(cast(s.run as double))
           ELSE cast(0.0 as double) END
    )"""


def entropy_nats(arr_sql: str) -> Column:
    """Shannon entropy (nats) of the multiset held in an array-typed
    SQL expression; 0.0 for empty/singleton arrays."""
    n = f"size({arr_sql})"
    return F.expr(
        f"CASE WHEN {n} > 1 THEN ln(cast({n} as double))"
        f" - ({_run_nlogn(arr_sql)}) / cast({n} as double)"
        f" ELSE cast(0.0 as double) END"
    )


def doc_entropy_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars_obs, char_entropy, n_tokens, token_entropy).

    Counts include whitespace characters (split on '' keeps them),
    matching the oracle's unnest semantics exactly.
    """
    chars = f"split({text_col}, '')"
    toks = f"split({text_col}, ' ')"
    return df.filter(F.length(text_col) >= 1).select(
        F.col(id_col),
        F.expr(f"size({chars})").cast("long").alias("n_chars_obs"),
        entropy_nats(chars).alias("char_entropy"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        entropy_nats(toks).alias("token_entropy"),
    )


def doc_entropy_report_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin via the explode→group formulation (deliberately a
    DIFFERENT algorithm than the Spark fold — same identity)."""

    def one(split_arg: str, prefix: str) -> str:
        return f"""
    {prefix}_cc AS (
      SELECT {id_col}, c, CAST(COUNT(*) AS DOUBLE) AS n
      FROM (SELECT {id_col},
                   unnest(string_split({text_col}, {split_arg})) AS c
            FROM {table} WHERE len({text_col}) >= 1)
      GROUP BY {id_col}, c
    ),
    {prefix}_e AS (
      SELECT {id_col}, CAST(SUM(n) AS BIGINT) AS L,
             CASE WHEN SUM(n) > 1
                  THEN ln(SUM(n)) - SUM(n * ln(n)) / SUM(n)
                  ELSE 0.0 END AS h
      FROM {prefix}_cc GROUP BY {id_col}
    )"""

    return f"""
    WITH {one("''", "ch")},
    {one("' '", "tk")}
    SELECT ch_e.{id_col},
           ch_e.L AS n_chars_obs, ch_e.h AS char_entropy,
           tk_e.L AS n_tokens,    tk_e.h AS token_entropy
    FROM ch_e JOIN tk_e USING ({id_col})
    """


def token_diversity_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token diversity profile via Hill numbers' exact
    members: vocabulary size (q=0) and inverse-Simpson effective
    vocabulary (q=2), plus the raw token mass — the ecology-standard
    "effective number of species" view of a corpus slice. A source
    whose effective vocab is far below its raw vocab is dominated by
    a few templates/boilerplate tokens even when the tail looks wide
    (the failure mode Shannon entropy alone smears; q=2 punishes
    dominance harder).

    Exactness: unlike Shannon (needs ln), the inverse-Simpson
    n^2 / sum c_t^2 is a RATIO OF EXACT INTEGERS — bigint sums of
    squared counts, order-free — so the single final division is
    engine-deterministic with no rounding anywhere.

    Scale shape: one explode + (group, token) count aggregation with
    map-side combine (vocab-sized result), then a group-sized
    reduction. The square-sum rides the count table, never the corpus.
    """
    tok = df.select(
        F.col(group_col), F.explode(F.split(F.col(text_col), " ")).alias("__t")
    )
    counts = tok.groupBy(group_col, "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    return (
        counts.groupBy(group_col)
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__c2"),
        )
        .select(
            group_col,
            "n_tokens",
            "vocab",
            (
                F.col("n_tokens").cast("double")
                * F.col("n_tokens")
                / F.col("__c2")
            ).alias("effective_vocab_q2"),
        )
    )


def token_diversity_by_source_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`token_diversity_by_source`."""
    return f"""
    WITH tok AS (
      SELECT {group_col} AS g, unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    c AS (SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY g, t)
    SELECT g AS {group_col},
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(c) AS DOUBLE) * SUM(c) / SUM(c * c) AS effective_vocab_q2
    FROM c GROUP BY g
    """


def diversity_histogram(
    df: DataFrame,
    key_col: str = "user_id",
    class_col: str = "event_type",
) -> DataFrame:
    """Population histogram of per-key behavioral diversity: each
    key's inverse-Simpson effective class count (how many event types
    does this user EFFECTIVELY spread over), floored to an integer
    bucket, then keys counted per bucket — the audit view for "are
    users mono-behavior or diverse" without emitting a per-user row.

    Exactness: per-key n^2 / sum c^2 is a single division of exact
    bigints — bit-identical across engines — and floor() of that
    identical double is identical too (uniform k-class keys land
    EXACTLY on k, which floors to k everywhere since the division is
    exact). No rounding, no ln.

    Scale shape: one (key, class) count aggregation, one key-grain
    reduction, one bucket-grain rollup — three shrinking map-side-
    combined aggregations, nothing else.
    """
    counts = df.groupBy(key_col, class_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    per_key = counts.groupBy(key_col).agg(
        F.sum("__c").cast("bigint").alias("__n"),
        F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__c2"),
    )
    return (
        per_key.select(
            F.floor(
                F.col("__n").cast("double") * F.col("__n") / F.col("__c2")
            )
            .cast("bigint")
            .alias("diversity_bucket")
        )
        .groupBy("diversity_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )


def diversity_histogram_sql(
    table: str = "events",
    key_col: str = "user_id",
    class_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`diversity_histogram`."""
    return f"""
    WITH counts AS (
      SELECT {key_col} AS k, {class_col} AS cl, CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1, 2
    ),
    per_key AS (
      SELECT k, CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c * c) AS BIGINT) AS c2
      FROM counts GROUP BY k
    )
    SELECT CAST(floor(CAST(n AS DOUBLE) * n / c2) AS BIGINT)
             AS diversity_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM per_key GROUP BY 1
    """


def transition_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
    round_to: int = 9,
) -> DataFrame:
    """Conditional entropy H(next | current) of the event-type Markov
    chain over per-user event sequences — "how predictable is the next
    action": 0 = deterministic flows, ln(k) = uniform chaos. The
    scalar summary of the wave-? transition matrix family (markov.py
    builds the chain; this scores its uncertainty), and the
    sequence-level cousin of the per-doc Shannon gates above.

    H = sum_ab (c_ab/N) * ln(c_a/c_ab), with c_ab the consecutive-
    pair counts (one lead() over each user's (ts, order_col)-ordered
    stream — ties broken by the order column, identically in both
    engines), c_a the from-state totals, N total transitions. Counts
    are exact bigints; each term is one ln on an exact integer ratio;
    the k^2-term sum is ROUNDed (default 9dp). Perplexity = exp(H),
    rounded the same.

    Output: one row (n_transitions, n_states, entropy_nats,
    perplexity).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    trans = (
        df.select(
            F.col(state_col).alias("a"),
            F.lead(state_col, 1).over(w).alias("b"),
        )
        .where(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    ca = trans.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    tot = trans.agg(
        F.sum("c_ab").cast("bigint").alias("N"),
        F.countDistinct("a").cast("bigint").alias("n_states"),
    )
    terms = trans.join(F.broadcast(ca), "a").crossJoin(F.broadcast(tot)).select(
        "N",
        "n_states",
        (
            F.col("c_ab").cast("double")
            / F.col("N")
            * F.log(F.col("c_a").cast("double") / F.col("c_ab"))
        ).alias("__t"),
    )
    return terms.groupBy("N", "n_states").agg(
        F.round(F.sum("__t"), round_to).alias("entropy_nats")
    ).select(
        F.col("N").alias("n_transitions"),
        "n_states",
        "entropy_nats",
        F.round(F.exp(F.col("entropy_nats")), round_to).alias("perplexity"),
    )


def transition_entropy_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`transition_entropy`."""
    return f"""
    WITH seq AS (
      SELECT {state_col} AS a,
             lead({state_col}, 1) OVER (PARTITION BY {user_col}
                 ORDER BY {ts_col}, {order_col}) AS b
      FROM {table}
    ),
    trans AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM seq WHERE b IS NOT NULL GROUP BY a, b
    ),
    ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM trans GROUP BY a),
    tot AS (
      SELECT CAST(SUM(c_ab) AS BIGINT) AS N,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS n_states
      FROM trans
    ),
    terms AS (
      SELECT tot.N, tot.n_states,
             CAST(trans.c_ab AS DOUBLE) / tot.N
               * ln(CAST(ca.c_a AS DOUBLE) / trans.c_ab) AS t
      FROM trans JOIN ca ON ca.a = trans.a CROSS JOIN tot
    ),
    h AS (
      SELECT N AS n_transitions, n_states,
             ROUND(SUM(t), {round_to}) AS entropy_nats
      FROM terms GROUP BY N, n_states
    )
    SELECT n_transitions, n_states, entropy_nats,
           ROUND(exp(entropy_nats), {round_to}) AS perplexity
    FROM h
    """

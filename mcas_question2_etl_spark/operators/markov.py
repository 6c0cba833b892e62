"""Markov-chain steady-state event mix via bounded power iteration.

Takes the per-user event-type transition counts (the order-1 chain the
transition-matrix spec already audits) and asks the follow-up product
question: if users keep behaving like this, what does the long-run
event mix converge to? Comparing the power-iterate against the
empirical mix surfaces momentum — event types whose stationary mass
exceeds today's share are growing under the observed dynamics.

Fixed ``rounds`` of pi <- pi.P from a uniform start keep the operator
oracle-expressible (unrolled CTEs, same discipline as the IPF/k-core
specs); convergence is visible in the result (pi at consecutive
rounds could be emitted by a caller that wants the trace).

Scale shape: the ONLY corpus-sized work is the lead-window transition
count (one shuffle on the user key — identical to the transition
matrix spec). Everything after operates on the k x k count table and
the k-row distribution (k = distinct event types), broadcast through
every join; power iterating costs rounds tiny joins, not scans.

States are the types observed as transition SOURCES (a final-event
type with no outgoing edge has an undefined row in P and is excluded
identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(frm, to, n) one-step transition counts per user sequence."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return (
        df.select(
            F.col(type_col).alias("frm"),
            F.lead(type_col, 1).over(w).alias("to"),
        )
        .filter(F.col("to").isNotNull())
        .groupBy("frm", "to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def stationary_mix(trans: DataFrame, rounds: int = 3) -> DataFrame:
    """(event_type, pi, empirical_share) after ``rounds`` power
    iterations from uniform over the source states.

    ``pi`` is renormalized at output so it is a proper probability
    distribution over the tracked (source) states: transitions INTO
    sink types with no outgoing edges leak mass out of the tracked
    state space each round, so the raw iterate sums to < 1 whenever
    sinks exist. The renormalized vector is the power iterate
    conditioned on remaining in the source-state space.
    """
    # localCheckpoint: executor-local lineage cut — not resilient to
    # executor loss / dynamic allocation; see operators/dedup.py caveat.
    trans = trans.localCheckpoint(eager=False)
    row_tot = trans.groupBy("frm").agg(F.sum("n").alias("__rt"))
    p = (
        trans.join(F.broadcast(row_tot), "frm")
        .select("frm", "to", (F.col("n") / F.col("__rt")).alias("p"))
        .localCheckpoint(eager=False)
    )
    states = row_tot.select("frm").localCheckpoint(eager=False)
    k = states.agg(F.count(F.lit(1)).cast("double").alias("__k"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "frm", (F.lit(1.0) / F.col("__k")).alias("pi")
    )
    for _ in range(rounds):
        pi = (
            pi.join(p, "frm")
            .groupBy(F.col("to").alias("frm"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
            # mass leaving the source-state space (transitions INTO a
            # sink type with no outgoing edges) is dropped by the
            # rejoin on frm next round; keep only tracked states now
            # so every round sees the same state set
            .join(states, "frm", "left_semi")
        )
    # renormalize: divide by the surviving mass so pi sums to exactly 1
    # over the tracked states (sinks absorb mass every round otherwise)
    pi_tot = pi.agg(F.sum("pi").alias("__pt"))
    pi = pi.crossJoin(F.broadcast(pi_tot)).select(
        "frm", (F.col("pi") / F.col("__pt")).alias("pi")
    )
    emp_tot = trans.agg(F.sum("n").cast("double").alias("__et"))
    emp = (
        trans.groupBy("frm")
        .agg(F.sum("n").alias("__fn"))
        .crossJoin(F.broadcast(emp_tot))
        .select("frm", (F.col("__fn") / F.col("__et")).alias("empirical_share"))
    )
    return (
        pi.join(emp, "frm")
        .select(F.col("frm").alias("event_type"), "pi", "empirical_share")
    )


def stationary_mix_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    rounds: int = 3,
) -> str:
    """DuckDB twin: transition counts + unrolled power iteration."""
    parts = [f"""
    tr AS MATERIALIZED (
      SELECT frm, to_, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT {type_col} AS frm,
               lead({type_col}, 1) OVER (
                 PARTITION BY {user_col} ORDER BY {ts_col}, {tiebreak_col}
               ) AS to_
        FROM {table}
      ) WHERE to_ IS NOT NULL
      GROUP BY frm, to_
    ),
    p AS MATERIALIZED (
      SELECT frm, to_, n / SUM(n) OVER (PARTITION BY frm) AS p FROM tr
    ),
    states AS MATERIALIZED (SELECT DISTINCT frm FROM tr),
    pi0 AS (
      SELECT frm, 1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM states) AS pi
      FROM states
    )"""]
    for r in range(rounds):
        parts.append(f"""
    pi{r + 1} AS (
      SELECT p.to_ AS frm, SUM(pi{r}.pi * p.p) AS pi
      FROM pi{r} JOIN p USING (frm)
      WHERE p.to_ IN (SELECT frm FROM states)
      GROUP BY p.to_
    )""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT pi{rounds}.frm AS event_type,
           pi{rounds}.pi / (SELECT SUM(pi) FROM pi{rounds}) AS pi,
           ft.fn / (SELECT CAST(SUM(n) AS DOUBLE) FROM tr) AS empirical_share
    FROM pi{rounds}
    JOIN (SELECT frm, CAST(SUM(n) AS DOUBLE) AS fn FROM tr GROUP BY frm) ft
      USING (frm)
    """
    )


def paths_to_conversion(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    conversion_type: str = "purchase",
    depth: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Top conversion paths: for every conversion event, the ordered
    sequence of the ``depth`` events immediately preceding it in the
    user's stream, rendered "a>b>c" — the path-mining report behind
    journey sankeys, complementing the transition matrix (pairwise)
    with short full sequences.

    Exactness: ordering is (ts, order_col) — fully deterministic;
    paths are exact strings from ``depth`` lag() calls sharing ONE
    user-window shuffle; shorter histories render their available
    prefix. Output: (path, n_conversions) for paths seen >=
    ``min_count`` times.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    lags = [
        F.lag(type_col, i).over(w) for i in range(depth, 0, -1)
    ]
    pathed = (
        df.select(
            F.col(type_col).alias("__t"),
            F.concat_ws(">", *lags).alias("path"),
        )
        .where(F.col("__t") == conversion_type)
        .where(F.col("path") != "")
    )
    return (
        pathed.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        .where(F.col("n_conversions") >= min_count)
    )


def paths_to_conversion_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    conversion_type: str = "purchase",
    depth: int = 3,
    min_count: int = 5,
) -> str:
    """DuckDB twin of :func:`paths_to_conversion`. concat_ws skips
    NULLs in both engines, so short histories agree."""
    lag_cols = ", ".join(
        f"lag({type_col}, {i}) OVER (PARTITION BY {user_col} "
        f"ORDER BY {ts_col}, {order_col}) AS l{i}"
        for i in range(depth, 0, -1)
    )
    concat_args = ", ".join(f"l{i}" for i in range(depth, 0, -1))
    return f"""
    WITH lagged AS (
      SELECT {type_col} AS t, {lag_cols}
      FROM {table}
    ),
    pathed AS (
      SELECT concat_ws('>', {concat_args}) AS path
      FROM lagged
      WHERE t = '{conversion_type}' AND concat_ws('>', {concat_args}) <> ''
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM pathed GROUP BY path
    HAVING COUNT(*) >= {min_count}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 127: gap-bounded skip-gram sequential patterns
# ──────────────────────────────────────────────────────────────────────────


def skipgram_patterns(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: int = 5,
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Gap-bounded sequential patterns "a THEN b (within the next
    ``gap`` events)" per user stream — the skip-gram generalization of
    :func:`transition_counts` (which sees only ADJACENT pairs, so
    'view ... later purchase' with interleaved clicks is invisible to
    it). This is the support/confidence core of PrefixSpan-style
    sequence mining restricted to length-2 patterns, which is the
    scale-honest cut: length-2 support needs one windowed projection,
    no candidate explosion.

    confidence(a->b) = c_ab / n_a (occurrences of a followed by b in
    window / occurrences of a with a full-or-partial window);
    lift = confidence / (consequent share of all emitted pairs).
    All counts exact integers; ordering (n_occurrences desc, a, b) is
    total, so the top-k cut is deterministic.

    Scale shape: ONE user-keyed shuffle for the ordered window (ties
    broken by ``id_col`` — a total event order, identical in both
    engines); the window materializes <= gap successor types per
    event, so pair rows are gap x events regardless of corpus size.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(1, gap)
    )
    nxt = events.select(
        F.col(type_col).alias("a"),
        F.collect_list(type_col).over(w).alias("__succ"),
    )
    pairs = nxt.select(
        "a", F.explode("__succ").alias("b")
    ).groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    n_a = pairs.groupBy(F.col("a").alias("ka")).agg(
        F.sum("n_occurrences").cast("bigint").alias("n_ant")
    )
    n_b = pairs.groupBy(F.col("b").alias("kb")).agg(
        F.sum("n_occurrences").cast("bigint").alias("n_con")
    )
    tot = pairs.agg(F.sum("n_occurrences").cast("bigint").alias("n_all"))
    out = (
        pairs.join(F.broadcast(n_a), pairs["a"] == n_a["ka"])
        .join(F.broadcast(n_b), pairs["b"] == n_b["kb"])
        .crossJoin(F.broadcast(tot))
    )
    conf = F.col("n_occurrences").cast("double") / F.col("n_ant").cast("double")
    lift = conf / (F.col("n_con").cast("double") / F.col("n_all").cast("double"))
    return (
        out.select(
            "a",
            "b",
            "n_occurrences",
            F.col("n_ant").alias("n_antecedent"),
            F.round(conf, round_to).alias("confidence"),
            F.round(lift, round_to).alias("lift"),
        )
        .orderBy(
            F.col("n_occurrences").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(top_k)
    )


def skipgram_patterns_sql(
    events_sql: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: int = 5,
    top_k: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`skipgram_patterns`."""
    return f"""
    WITH src AS ({events_sql}),
    nxt AS (
      SELECT {type_col} AS a,
             list({type_col}) OVER (
               PARTITION BY {user_col}
               ORDER BY {ts_col} ASC, {id_col} ASC
               ROWS BETWEEN 1 FOLLOWING AND {gap} FOLLOWING
             ) AS succ
      FROM src
    ),
    pairs AS (
      SELECT a, UNNEST(succ) AS b FROM nxt
    ),
    cnt AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY a, b
    ),
    n_a AS (SELECT a AS ka, CAST(SUM(n_occurrences) AS BIGINT) AS n_ant
            FROM cnt GROUP BY a),
    n_b AS (SELECT b AS kb, CAST(SUM(n_occurrences) AS BIGINT) AS n_con
            FROM cnt GROUP BY b),
    tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS n_all FROM cnt)
    SELECT a, b, n_occurrences,
           n_ant AS n_antecedent,
           ROUND(CAST(n_occurrences AS DOUBLE) / n_ant, {round_to})
             AS confidence,
           ROUND((CAST(n_occurrences AS DOUBLE) / n_ant)
                 / (CAST(n_con AS DOUBLE) / n_all), {round_to}) AS lift
    FROM cnt
    JOIN n_a ON ka = a
    JOIN n_b ON kb = b
    CROSS JOIN tot
    ORDER BY n_occurrences DESC, a ASC, b ASC
    LIMIT {top_k}
    """

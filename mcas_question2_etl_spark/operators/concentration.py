"""Concentration metrics over grouped frequency distributions.

HHI (Herfindahl–Hirschman, Σ share²) and the Gini coefficient of a
group's term-frequency distribution quantify how concentrated a
corpus slice is on few tokens — the audit signal for training-mixture
health (a source whose token mass collapses onto boilerplate terms
shows HHI/Gini spikes long before eyeballing samples would).

Scale shape: one (group, term) count aggregation — the only shuffle
that touches corpus-sized data, with map-side combine — then
per-group Σn, Σn², and the rank-weighted Gini sum over the COUNT
table (vocabulary-sized, not corpus-sized). The Gini rank window
partitions by group, so each group sorts only its own vocabulary;
Σ i·x_i is invariant under tie ordering, so the tiebreak only pins
determinism, not the value.

Gini (ascending-rank form): G = 2·Σ i·x_i / (n·Σ x_i) − (n+1)/n.

Reference scope: extends SURVEY.md §2.13's corpus-audit surface
(alongside source_token_divergence / zipf_token_ranks); no analogue
in the reference repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_concentration(
    counts: DataFrame,
    group_col: str = "source",
    count_col: str = "n",
    order_tiebreak: str = "term",
) -> DataFrame:
    """(group, n_classes, total, hhi, gini) from a (group, class,
    count) table. ``counts`` must be pre-aggregated (one row per
    (group, class))."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(count_col).asc(), F.col(order_tiebreak).asc()
    )
    ranked = counts.withColumn("__i", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum(count_col).cast("bigint").alias("total"),
            F.sum(F.col(count_col).cast("double") * F.col(count_col)).alias("__ss"),
            F.sum(F.col("__i").cast("double") * F.col(count_col)).alias("__iw"),
        )
        .select(
            group_col,
            "n_classes",
            "total",
            (F.col("__ss") / (F.col("total").cast("double") * F.col("total"))).alias("hhi"),
            (
                F.lit(2.0) * F.col("__iw")
                / (F.col("n_classes").cast("double") * F.col("total"))
                - (F.col("n_classes") + 1).cast("double") / F.col("n_classes")
            ).alias("gini"),
        )
    )


def token_concentration_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of tokenize → count → :func:`group_concentration`."""
    return f"""
    WITH tc AS (
      SELECT {group_col}, t AS term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT {group_col},
                   unnest(string_split({text_col}, ' ')) AS t
            FROM {table})
      GROUP BY {group_col}, t
    ),
    ranked AS (
      SELECT {group_col}, n,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY n ASC, term ASC) AS i
      FROM tc
    )
    SELECT {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(n) AS BIGINT) AS total,
           SUM(CAST(n AS DOUBLE) * n)
             / (CAST(SUM(n) AS DOUBLE) * SUM(n)) AS hhi,
           2.0 * SUM(CAST(i AS DOUBLE) * n)
             / (CAST(COUNT(*) AS DOUBLE) * SUM(n))
             - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini
    FROM ranked
    GROUP BY {group_col}
    """


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
) -> DataFrame:
    """ABC (Pareto) classification: rank keys by a 2-decimal measure
    descending, class A = keys inside the first ``a_cut`` of cumulative
    value, B up to ``b_cut``, C the tail — the standard inventory/
    revenue-concentration rollup ("which 20% of parts carry 80% of
    revenue").

    Exactness: per-key values, the running prefix, the grand total and
    the two thresholds are ALL decimals (cuts are decimal literals, so
    threshold = cut * total is exact) — class assignment never touches
    a float, so no boundary key can flip between engines. Only the
    reported revenue share divides to double at the end.

    Scale shape: one groupBy to key grain, then the distributed
    two-phase running sum (:func:`.ranking.with_running_sum` — range
    shuffle + per-partition windows, never a single-task global
    window), a broadcast 1-row total, and a 3-row class rollup.
    """
    from .ranking import with_running_sum

    per_key = df.groupBy(key_col).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__v")
    )
    total = per_key.agg(F.sum("__v").alias("__tot"))
    run = with_running_sum(
        per_key,
        [F.col("__v").desc(), F.col(key_col)],
        "__v",
        out_col="__run",
    ).crossJoin(F.broadcast(total))
    classed = run.withColumn(
        "abc_class",
        F.when(
            F.col("__run") <= F.expr(f"CAST({a_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("A"),
        )
        .when(
            F.col("__run") <= F.expr(f"CAST({b_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("B"),
        )
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("__v").cast("double").alias("class_value"),
            (F.sum("__v").cast("double") / F.max("__tot").cast("double")).alias(
                "value_share"
            ),
        )
    )


def abc_classes_sql(
    table: str,
    key_col: str,
    value_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
) -> str:
    """DuckDB twin of :func:`abc_classes` (plain running-sum window —
    the oracle does not need the distributed construction)."""
    return f"""
    WITH pk AS (
      SELECT {key_col} AS k, SUM(CAST({value_col} AS DECIMAL(18,2))) AS v
      FROM {table} GROUP BY {key_col}
    ),
    t AS (SELECT SUM(v) AS tot FROM pk),
    run AS (
      SELECT k, v, tot,
             SUM(v) OVER (ORDER BY v DESC, k
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM pk, t
    ),
    classed AS (
      SELECT k, v, tot,
             CASE WHEN cum <= CAST({a_cut} AS DECIMAL(3,2)) * tot THEN 'A'
                  WHEN cum <= CAST({b_cut} AS DECIMAL(3,2)) * tot THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM run
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(v) AS DOUBLE) AS class_value,
           CAST(SUM(v) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS value_share
    FROM classed GROUP BY abc_class
    """


def theil_decomposition(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 9,
) -> DataFrame:
    """Theil T inequality index with exact within/between GROUP
    decomposition — the property Gini famously lacks (Gini's overlap
    term is unattributable; Theil's T = T_within + T_between exactly,
    Theil 1967), which is why corpus audits that must ANSWER "is the
    length inequality inside sources or between them" need this next
    to token_gini_inequality.

        T_s (within group s) = Sxlnx_s / Sx_s - ln(Sx_s / n_s)
        between term_s       = share_s * ln(mu_s / mu)
        T = sum_s share_s * T_s + sum_s between_s,  share_s = Sx_s/Sx

    Exactness: Sx and n are exact bigints; the one row-order-
    sensitive quantity (sum of x*ln(x) over rows) is ROUNDed per
    group (default 9dp); everything downstream is fixed IEEE
    expressions on those values, with the tiny k-term totals rounded
    too. Rows with x <= 0 are excluded (ln domain). Output: one row
    per group (group, n, value_share, theil_within, between_term)
    plus broadcast totals (theil_total, within_total, between_total).
    """
    pos = df.where(F.col(value_col) > 0).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    per = pos.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.round(
            F.sum(
                F.col("x").cast("double")
                * F.log(F.col("x").cast("double"))
            ),
            round_to,
        ).alias("sxlnx"),
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("__N"),
        F.sum("sx").cast("bigint").alias("__SX"),
    )
    mu_s = F.col("sx").cast("double") / F.col("n")
    mu = F.col("__SX").cast("double") / F.col("__N")
    share = F.col("sx").cast("double") / F.col("__SX")
    t_within = F.col("sxlnx") / F.col("sx") - F.log(mu_s)
    between = share * F.log(mu_s / mu)
    rows = per.crossJoin(F.broadcast(tot)).select(
        "g",
        "n",
        share.alias("value_share"),
        t_within.alias("theil_within"),
        between.alias("between_term"),
    )
    totals = rows.agg(
        F.round(
            F.sum(F.col("value_share") * F.col("theil_within")), round_to
        ).alias("within_total"),
        F.round(F.sum("between_term"), round_to).alias("between_total"),
    ).select(
        "within_total",
        "between_total",
        (F.col("within_total") + F.col("between_total")).alias("theil_total"),
    )
    return rows.crossJoin(F.broadcast(totals)).select(
        F.col("g").alias(group_col),
        "n",
        "value_share",
        "theil_within",
        "between_term",
        "within_total",
        "between_total",
        "theil_total",
    )


def theil_decomposition_sql(
    table: str,
    group_col: str,
    value_col: str,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`theil_decomposition`."""
    return f"""
    WITH pos AS (
      SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS x
      FROM {table} WHERE {value_col} > 0
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             ROUND(SUM(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))),
                   {round_to}) AS sxlnx
      FROM pos GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(sx) AS BIGINT) AS sxt
      FROM per
    ),
    rows_ AS (
      SELECT g, n,
             CAST(sx AS DOUBLE) / sxt AS value_share,
             sxlnx / sx - ln(CAST(sx AS DOUBLE) / n) AS theil_within,
             (CAST(sx AS DOUBLE) / sxt)
               * ln((CAST(sx AS DOUBLE) / n)
                    / (CAST(sxt AS DOUBLE) / nt)) AS between_term
      FROM per CROSS JOIN tot
    ),
    totals AS (
      SELECT ROUND(SUM(value_share * theil_within), {round_to})
               AS within_total,
             ROUND(SUM(between_term), {round_to}) AS between_total
      FROM rows_
    )
    SELECT rows_.g AS {group_col}, rows_.n, rows_.value_share,
           rows_.theil_within, rows_.between_term,
           totals.within_total, totals.between_total,
           totals.within_total + totals.between_total AS theil_total
    FROM rows_ CROSS JOIN totals
    """


def hill_powerlaw_alpha(
    df: DataFrame,
    group_col: str,
    value_col: str,
    xmin: int = 100,
    round_to: int = 9,
) -> DataFrame:
    """Hill estimator of the power-law tail exponent per group:
    alpha = 1 + n / sum(ln(x/xmin)) over values >= xmin (Clauset-
    Shalizi-Newman's discrete MLE approximation) — the one-number
    heavy-tail summary behind "is this length/degree distribution
    scale-free", sharper than eyeballing the zipf rank plot.

    Exact bigint tail counts; the ln sum is ROUNDed (row order);
    alpha is then one fixed expression. Output: (group, n_tail,
    xmin, alpha); groups whose tail sum is 0 (all values == xmin)
    emit NULL alpha.
    """
    tail = df.where(F.col(value_col) >= xmin).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("x"),
    )
    agg = tail.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.round(
            F.sum(F.log(F.col("x") / xmin)), round_to
        ).alias("__s"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_tail",
        F.lit(xmin).cast("bigint").alias("xmin"),
        F.when(
            F.col("__s") > 0, 1 + F.col("n_tail") / F.col("__s")
        ).alias("alpha"),
    )


def hill_powerlaw_alpha_sql(
    table: str,
    group_col: str,
    value_col: str,
    xmin: int = 100,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`hill_powerlaw_alpha`."""
    return f"""
    WITH tail AS (
      SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS x
      FROM {table} WHERE {value_col} >= {xmin}
    ),
    agg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_tail,
             ROUND(SUM(ln(x / {xmin})), {round_to}) AS s
      FROM tail GROUP BY g
    )
    SELECT g AS {group_col}, n_tail,
           CAST({xmin} AS BIGINT) AS xmin,
           CASE WHEN s > 0 THEN 1 + n_tail / s END AS alpha
    FROM agg
    """


def abc_xyz_matrix(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qty_col: str,
    date_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
    x_cv: float = 0.5,
    y_cv: float = 1.0,
) -> DataFrame:
    """ABC x XYZ inventory classification matrix: ABC ranks keys by
    revenue concentration (same decimal-exact machinery as
    :func:`abc_classes`), XYZ classifies demand VARIABILITY via the
    coefficient of variation of weekly quantity (X = steady, cv <
    ``x_cv``; Y = variable; Z = erratic) — the joint view ops teams
    actually plan stock from (an A/Z part needs very different
    handling than A/X).

    Exactness: revenue prefix sums and thresholds are all DECIMAL
    (no float boundary); weekly quantities are exact bigints and the
    cv is one fixed IEEE expression on exact power sums, so class
    verdicts are engine-identical. Output: (abc_class, xyz_class,
    n_keys, revenue).
    """
    from .ranking import with_running_sum

    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__v")
    )
    total = per_key.agg(F.sum("__v").alias("__tot"))
    run = with_running_sum(
        per_key,
        [F.col("__v").desc(), F.col("k")],
        "__v",
        out_col="__run",
    ).crossJoin(F.broadcast(total))
    # EXCLUSIVE-prefix convention (vs abc_classes' inclusive): a key
    # belongs to the class whose band its cumulative share STARTS in,
    # so a single dominant key still reads A (inclusive classing would
    # throw a >80%-alone key straight to C).
    abc = run.select(
        "k",
        "__v",
        F.when(
            F.col("__run") - F.col("__v")
            < F.expr(f"CAST({a_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("A"),
        )
        .when(
            F.col("__run") - F.col("__v")
            < F.expr(f"CAST({b_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    weekly = df.groupBy(
        F.col(key_col).alias("k"),
        F.expr(
            f"datediff(cast({date_col} as date), date'1970-01-01') div 7"
        ).alias("__wk"),
    ).agg(F.sum(F.col(qty_col).cast("bigint")).cast("bigint").alias("__q"))
    mom = weekly.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__kw"),
        F.sum("__q").cast("bigint").alias("__s1"),
        F.sum(F.col("__q") * F.col("__q")).cast("bigint").alias("__s2"),
    )
    kw = F.col("__kw").cast("double")
    mean = F.col("__s1").cast("double") / kw
    sd = F.sqrt(F.col("__s2").cast("double") / kw - mean * mean)
    xyz = mom.select(
        "k",
        F.when(sd / mean < x_cv, F.lit("X"))
        .when(sd / mean < y_cv, F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "k")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("__v").cast("double").alias("revenue"),
        )
    )


def abc_xyz_matrix_sql(
    table: str,
    key_col: str,
    value_col: str,
    qty_col: str,
    date_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
    x_cv: float = 0.5,
    y_cv: float = 1.0,
) -> str:
    """DuckDB twin of :func:`abc_xyz_matrix`."""
    return f"""
    WITH per_key AS (
      SELECT {key_col} AS k,
             SUM(CAST({value_col} AS DECIMAL(18,2))) AS v
      FROM {table} GROUP BY 1
    ),
    total AS (SELECT SUM(v) AS tot FROM per_key),
    run AS (
      SELECT k, v,
             SUM(v) OVER (ORDER BY v DESC, k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      FROM per_key
    ),
    abc AS (
      SELECT k, v,
             CASE WHEN r - v < CAST({a_cut} AS DECIMAL(3,2)) * tot THEN 'A'
                  WHEN r - v < CAST({b_cut} AS DECIMAL(3,2)) * tot THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM run CROSS JOIN total
    ),
    weekly AS (
      SELECT {key_col} AS k,
             date_diff('day', DATE '1970-01-01', CAST({date_col} AS DATE))
               // 7 AS wk,
             CAST(SUM(CAST({qty_col} AS BIGINT)) AS BIGINT) AS q
      FROM {table} GROUP BY 1, 2
    ),
    mom AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS kw,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM weekly GROUP BY k
    ),
    xyz AS (
      SELECT k,
             CASE WHEN sqrt(CAST(s2 AS DOUBLE) / CAST(kw AS DOUBLE)
                            - (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE))
                              * (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE)))
                       / (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE)) < {x_cv}
                  THEN 'X'
                  WHEN sqrt(CAST(s2 AS DOUBLE) / CAST(kw AS DOUBLE)
                            - (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE))
                              * (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE)))
                       / (CAST(s1 AS DOUBLE) / CAST(kw AS DOUBLE)) < {y_cv}
                  THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM mom
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(abc.v) AS DOUBLE) AS revenue
    FROM abc JOIN xyz ON xyz.k = abc.k
    GROUP BY 1, 2
    """


def gini_by_period(
    df: DataFrame,
    period_col,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of per-unit value within each period — the
    inequality TREND view ("is revenue concentrating quarter over
    quarter"), complementing the single-shot token_gini_inequality
    and the Theil decomposition (which splits by group, not time).

    Sorted-rank formula G = 2*sum(r*x)/(n*sum(x)) - (n+1)/n over
    ascending (value, unit) ranks WITHIN each period — the rank
    window is partitioned by period, so no single-task global sort.
    Values accumulate in DECIMAL(18,2) and the rank-weighted sum in
    DECIMAL(38,2): every input to the final fixed IEEE expression is
    exact, zero rounding. Output: (period, n_units, total_value,
    gini).
    """
    per_unit = df.groupBy(
        period_col.alias("q"), F.col(unit_col).alias("u")
    ).agg(F.sum(F.col(value_col).cast("decimal(18,2)")).cast("decimal(18,2)").alias("x"))
    w = Window.partitionBy("q").orderBy(F.col("x").asc(), F.col("u").asc())
    ranked = per_unit.select(
        "q", "x", F.row_number().over(w).cast("bigint").alias("r")
    )
    agg = ranked.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum((F.col("r").cast("decimal(18,0)") * F.col("x")).cast("decimal(38,2)"))
        .alias("srx"),
    )
    n = F.col("n").cast("double")
    g = (
        2 * F.col("srx").cast("double") / (n * F.col("sx").cast("double"))
        - (n + 1) / n
    )
    return agg.select(
        F.col("q").alias("period"),
        F.col("n").alias("n_units"),
        F.col("sx").cast("double").alias("total_value"),
        g.alias("gini"),
    )


def gini_by_period_sql(
    table_sql: str,
    period_sql: str,
    unit_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`gini_by_period`; ``table_sql`` yields the
    raw rows, ``period_sql`` the period expression over them."""
    return f"""
    WITH src AS ({table_sql}),
    per_unit AS (
      SELECT {period_sql} AS q, {unit_col} AS u,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS x
      FROM src GROUP BY 1, 2
    ),
    ranked AS (
      SELECT q, x,
             CAST(row_number() OVER (PARTITION BY q ORDER BY x ASC, u ASC)
                  AS BIGINT) AS r
      FROM per_unit
    ),
    agg AS (
      SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
             SUM(CAST(CAST(r AS DECIMAL(18,0)) * x AS DECIMAL(38,2))) AS srx
      FROM ranked GROUP BY q
    )
    SELECT q AS period, n AS n_units, CAST(sx AS DOUBLE) AS total_value,
           2 * CAST(srx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE) AS gini
    FROM agg
    """

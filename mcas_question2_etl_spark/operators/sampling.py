"""Dataset-construction operators: deterministic splits, class
balancing, stratified samples.

Training pipelines need *reproducible* membership — a row's split must
not depend on partitioning, row order, cluster size, or engine, or
every rerun leaks test data into train. So membership derives from a
hash of a stable key (md5 → bucket in [0,100)), never from RNG state:
the same row lands in the same split on any engine, which also makes
these operators oracle-checkable. Spark's native randomSplit/sampleBy
(seeded per-partition RNG) is fine for one-off local sampling but its
assignment changes with repartitioning — the footgun these avoid.

All narrow projections/filters except class balancing, which pays one
shuffle on the label (unavoidable: the per-class quota is global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key_col: str, buckets: int = 100) -> F.Column:
    """Stable bucket in [0, buckets): md5 of the key's string form.
    (Engine-portable, unlike xxhash64/murmur which differ per engine.)"""
    h = f"cast(conv(substring(md5(cast({key_col} as string)), 1, 15), 16, 10) as bigint)"
    return F.expr(f"{h} % {buckets}")


def hash_bucket_sql(key_col: str, buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {buckets}"
    )


def train_test_split(
    df: DataFrame, key_col: str, test_pct: int = 20
) -> DataFrame:
    """Adds a ``split`` column: 'test' for the ``test_pct`` hash slice,
    'train' otherwise. A filter, not a shuffle; adding rows later never
    reassigns existing ones (hash membership is per-row, not quantile)."""
    b = hash_bucket(key_col)
    return df.withColumn(
        "split", F.when(b < test_pct, "test").otherwise("train")
    )


def balanced_sample(
    df: DataFrame, label_col: str, per_class: int, order_col: str
) -> DataFrame:
    """Class-balanced downsample: the first ``per_class`` rows per label
    by ``order_col`` (deterministic — for an unbiased draw, order by
    ``hash_bucket(order_col)`` instead, still reproducible).

    One shuffle on the label; WindowGroupLimit pushes the per-class
    limit below the sort, so each partition keeps at most ``per_class``
    rows per label before the exchange."""
    w = Window.partitionBy(label_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_class)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Domain-mixture downsample: keep each row with its domain's
    per-100 rate (e.g. ``{"en": 100, "fr": 25}`` keeps all English and
    a quarter of French). Membership is ``hash_bucket(key) < rate`` —
    deterministic per row, independent of partitioning and engine, and
    monotone in the rate: raising a domain's rate only ADDS documents,
    it never swaps the kept set (the property corpus rebuilds rely on;
    seeded ``sampleBy`` reshuffles membership on every repartition).

    A scan-side filter: no shuffle, no join — the rate table compiles
    into one CASE expression, so at 100 TB this is free inside the
    same stage as the parquet scan.
    """
    b = hash_bucket(key_col)
    rate = F.lit(default_rate)
    for dom, pct in sorted(rates.items()):
        rate = F.when(F.col(domain_col) == dom, pct).otherwise(rate)
    return df.filter(b < rate)


def mixture_sample_sql(
    key_col: str, domain_col: str, rates: dict[str, int], default_rate: int = 0
) -> str:
    """DuckDB twin of :func:`mixture_sample` (a WHERE predicate)."""
    whens = " ".join(
        f"WHEN {domain_col} = '{dom}' THEN {pct}"
        for dom, pct in sorted(rates.items())
    )
    return f"{hash_bucket_sql(key_col)} < (CASE {whens} ELSE {default_rate} END)"


#: 15 hex digits = 60 bits, so the uniform-draw divisor is an exact
#: power of two and the division is rounding-free
_U_DIV = float(1 << 60)


def weighted_sample_topk(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    exponential-keys): draw ``k`` rows with probability proportional to
    ``weight_col``, deterministically.

    Each row gets a pseudo-uniform u in (0, 1] from the md5 of its key
    (never from RNG state), an exponential key -ln(u)/w, and the k
    SMALLEST keys win — the classic distributed weighted reservoir,
    here as one TakeOrdered: no shuffle of the table, no driver-side
    reservoir, reproducible on any engine/partitioning. Rows with
    non-positive weight are excluded.
    """
    h = (
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 15), 16, 10)"
        f" as bigint)"
    )
    u = f"(({h}) + 1) / {_U_DIV}"
    ekey = F.expr(f"-ln({u}) / {weight_col}")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", ekey)
        .orderBy(F.col("sample_key").asc(), F.col(key_col).asc())
        .limit(k)
    )


def weighted_sample_topk_sql(
    key_col: str, weight_col: str, k: int, table: str, cols: str
) -> str:
    """DuckDB twin of :func:`weighted_sample_topk`."""
    h = f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    u = f"(({h}) + 1) / {_U_DIV}"
    return f"""
    SELECT {cols}, -ln({u}) / {weight_col} AS sample_key
    FROM {table} WHERE {weight_col} > 0
    ORDER BY sample_key ASC, {key_col} ASC
    LIMIT {k}
    """


def budget_head(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Greedy budget-constrained curation: walk each partition in
    priority order, keep rows while the running weight stays within
    ``budget``.

    The LLM-corpus shape: "take the best documents from each source
    until that source's token budget is spent". One window (sort within
    the part_col shuffle, running SUM over unbounded-preceding rows) —
    no iteration, no driver state; at 100 TB each source's scan is an
    independent sorted partition stream.

    ``order_cols`` must make the order total (include a unique id) or
    the greedy prefix is nondeterministic. Adds ``cum_weight`` and
    ``keep``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cum_weight", F.sum(weight_col).over(w).cast("long")
    ).withColumn("keep", F.col("cum_weight") <= budget)


def temperature_rates(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    budget: int,
) -> DataFrame:
    """Temperature-based mixture allocation (the multilingual-sampling
    rule of mT5/XLM-R): target share of domain d is
    n_d^alpha / sum_e n_e^alpha, and the per-domain keep rate to hit a
    ``budget`` of rows is min(1, budget * share / n_d). alpha = 1
    preserves the natural mix; alpha -> 0 flattens it (upweights tail
    domains); alpha > 1 sharpens heads.

    One aggregation over the corpus produces (domain, n, share, rate);
    the table is domains-sized, so it broadcasts into the sampling
    filter. All arithmetic is closed-form doubles over exact counts —
    identical in any engine.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n").cast("double"), F.lit(alpha))).alias("z")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "share", F.pow(F.col("n").cast("double"), F.lit(alpha)) / F.col("z")
        )
        .withColumn(
            "rate",
            F.least(F.lit(1.0), F.lit(float(budget)) * F.col("share") / F.col("n")),
        )
    )


def temperature_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    alpha: float,
    budget: int,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Apply :func:`temperature_rates` as a deterministic hash filter:
    keep rows whose uniform hash_bucket(key)/buckets falls under their
    domain's rate. Same monotone-membership guarantee as
    mixture_sample — raising alpha or budget only ADDS rows. The rate
    table broadcasts; the filter is scan-side."""
    rates = temperature_rates(df, domain_col, alpha, budget).select(
        domain_col, "rate"
    )
    u = hash_bucket(key_col, buckets).cast("double") / buckets
    return df.join(F.broadcast(rates), domain_col).filter(u < F.col("rate"))


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    the md5 hash of the key (then the key itself as tiebreak) — the
    web-corpus "per-domain cap" (C4/RefinedWeb keep at most N pages per
    registered domain so megadomains can't dominate the training mix).

    Hash order, not arrival order: membership survives repartitioning
    and re-crawls, per this module's no-RNG contract. One window over
    the group key; with heavy skew (one domain = half the corpus) the
    window's sort is per-group and the cap discards early at scale via
    rank short-circuit (Spark's window TopK pushdown in AQE), or swap
    in the two-phase top-k from operators/windows.py.
    """
    order = [F.md5(F.col(key_col).cast("string")), F.col(key_col)]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    measure_col: str,
    key_col: str,
    budget: int = 100,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation + deterministic take.

    Optimal allocation puts sampling budget where the variance is:
    n_h = floor(budget * N_h*s_h / SUM_h N_h*s_h) — the minimum-variance
    design for estimating the population mean of ``measure_col`` under
    a fixed total budget, the right way to build eval/QA samples from
    heterogeneous corpus strata (vs proportional allocation, which
    wastes budget on large homogeneous strata).

    Determinism discipline: s_h comes from exact integer moments
    (sum, sum-of-squares over a BIGINT measure), the per-stratum
    weights N_h*s_h are cast to DECIMAL(28,6) BEFORE the cross-stratum
    total — decimal addition is exact and order-free, where a double
    SUM over strata could differ in the last ulp between engines and
    flip the floor() at an integer boundary. The final ratio divides
    two bit-identical decimals in double space, so floor() sees the
    same value everywhere. The realized take is the stratum's first
    n_h rows in md5(key) order (hash-deterministic, partition-independent).

    Returns per stratum: (stratum, n_rows, sigma, alloc, n_kept).
    One aggregation shuffle + one window shuffle on the stratum key.
    """
    stats = (
        df.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum(F.col(measure_col).cast("bigint")).alias("__sx"),
            F.sum(
                F.col(measure_col).cast("bigint") * F.col(measure_col).cast("bigint")
            ).alias("__sx2"),
        )
        .withColumn(
            "__sigma",
            F.sqrt(
                (
                    F.col("__sx2").cast("double")
                    - F.col("__sx").cast("double") * F.col("__sx") / F.col("__n")
                )
                / (F.col("__n") - 1)
            ),
        )
        .withColumn(
            "__w",
            (F.col("__n").cast("double") * F.col("__sigma")).cast("decimal(28,6)"),
        )
    )
    total = stats.agg(F.sum("__w").cast("decimal(38,6)").alias("__wt"))
    alloc = stats.crossJoin(F.broadcast(total)).select(
        F.col(stratum_col),
        F.col("__n").alias("n_rows"),
        F.col("__sigma").alias("sigma"),
        F.floor(
            F.lit(float(budget))
            * (F.col("__w").cast("double") / F.col("__wt").cast("double"))
        )
        .cast("bigint")
        .alias("alloc"),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    ranked = df.select(F.col(stratum_col), F.col(key_col)).withColumn(
        "__rk", F.row_number().over(w)
    )
    kept = (
        ranked.join(F.broadcast(alloc.select(stratum_col, "alloc")), stratum_col)
        .filter(F.col("__rk") <= F.col("alloc"))
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return alloc.join(kept, stratum_col, "left").na.fill({"n_kept": 0})


def neyman_allocation_sql(
    table: str,
    stratum_col: str,
    measure_col: str,
    key_col: str,
    budget: int = 100,
) -> str:
    """DuckDB twin of :func:`neyman_allocation`."""
    return f"""
    WITH stats AS (
      SELECT {stratum_col},
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST({measure_col} AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST({measure_col} AS BIGINT)
                      * CAST({measure_col} AS BIGINT)) AS BIGINT) AS sx2
      FROM {table} GROUP BY {stratum_col}
    ),
    sg AS (
      SELECT {stratum_col}, n_rows,
             sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_rows)
                  / (n_rows - 1)) AS sigma
      FROM stats
    ),
    wd AS (
      SELECT {stratum_col}, n_rows, sigma,
             CAST(CAST(n_rows AS DOUBLE) * sigma AS DECIMAL(28,6)) AS w
      FROM sg
    ),
    t AS (SELECT CAST(SUM(w) AS DECIMAL(38,6)) AS wt FROM wd),
    alloc AS (
      SELECT {stratum_col}, n_rows, sigma,
             CAST(floor({budget}.0 * (CAST(w AS DOUBLE) / CAST(wt AS DOUBLE)))
                  AS BIGINT) AS alloc
      FROM wd, t
    ),
    ranked AS (
      SELECT {stratum_col}, {key_col},
             row_number() OVER (
               PARTITION BY {stratum_col}
               ORDER BY md5(CAST({key_col} AS VARCHAR)), {key_col}
             ) AS rk
      FROM {table}
    ),
    kept AS (
      SELECT r.{stratum_col}, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM ranked r JOIN alloc a USING ({stratum_col})
      WHERE r.rk <= a.alloc
      GROUP BY r.{stratum_col}
    )
    SELECT a.{stratum_col}, a.n_rows, a.sigma, a.alloc,
           COALESCE(k.n_kept, 0) AS n_kept
    FROM alloc a LEFT JOIN kept k USING ({stratum_col})
    """


def negative_sampling_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor id, ``k`` pseudo-random NEGATIVE ids drawn from the
    same table by modular arithmetic over the DENSE id range — no
    RNG state, no join, so the pairing is reproducible on any
    engine/partitioning (the same discipline as hash_bucket splits).

    offset_i = (id * 31 + i * 97) %% (N - 1) + 1  (always nonzero)
    negative = lo + ((id - lo + offset_i) %% N)   (never the anchor)

    Requires a dense integer id domain [lo, hi] (the generated
    tables' doc_id/custkey shape); callers with sparse ids should
    densify via the repo's two-phase rank first. Pure scan-stage
    integer expressions; one broadcast of the 2-value bounds row.
    Output: (anchor, neg_rank, negative).
    """
    bounds = df.agg(
        F.min(F.col(id_col)).cast("bigint").alias("__lo"),
        F.max(F.col(id_col)).cast("bigint").alias("__hi"),
    )
    ranks = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias(
        "neg_rank"
    )
    based = df.select(F.col(id_col).cast("bigint").alias("anchor")).crossJoin(
        F.broadcast(bounds)
    ).select("anchor", "__lo", "__hi", ranks)
    return based.select(
        "anchor",
        F.col("neg_rank").cast("int").alias("neg_rank"),
        F.expr(
            "__lo + ((anchor - __lo + ((anchor * 31 + neg_rank * 97) "
            "% (__hi - __lo) + 1)) % (__hi - __lo + 1))"
        ).cast("bigint").alias("negative"),
    )


def negative_sampling_pairs_sql(
    table: str,
    id_col: str,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`negative_sampling_pairs`."""
    ranks = ", ".join(str(i) for i in range(k))
    return f"""
    WITH bounds AS (
      SELECT CAST(MIN({id_col}) AS BIGINT) AS lo,
             CAST(MAX({id_col}) AS BIGINT) AS hi
      FROM {table}
    ),
    based AS (
      SELECT CAST({id_col} AS BIGINT) AS anchor, lo, hi, i AS neg_rank
      FROM {table} CROSS JOIN bounds
      CROSS JOIN (SELECT unnest([{ranks}]) AS i)
    )
    SELECT anchor, CAST(neg_rank AS INTEGER) AS neg_rank,
           CAST(lo + ((anchor - lo + ((anchor * 31 + neg_rank * 97)
                       % (hi - lo) + 1)) % (hi - lo + 1)) AS BIGINT)
             AS negative
    FROM based
    """

"""Event-time windowed aggregations over a streaming events source.

Scale notes: watermarks bound the state store (late rows beyond the
watermark are dropped, so state is O(active windows), not O(stream));
the windowed aggregate shuffles on (window, key) with partial
aggregation; AvailableNow processes a backlog in rate-limited batches
instead of one giant micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, path: str) -> T.StructType:
    """Streaming file sources need an explicit schema; infer it from a
    one-off batch footer read so NANOS-as-long and MICROS files both
    work (see catalog.load_table)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the events parquet, normalizing ts to
    TimestampType (same ns->us truncation / NTZ cast as the batch
    catalog path)."""
    raw = spark.readStream.schema(_events_schema(spark, path)).parquet(path)
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts/sums — the streaming twin of
    the batch ``events_tumbling_window`` query (plans/relational.py);
    the watermark admits late data up to 2 hours then finalizes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-user activity (each event lands in
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows: per-user sessions closed after ``gap`` of
    inactivity — the dynamic-window primitive tumbling windows can't
    express."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def user_cumulative_value(events: DataFrame, timeout_minutes: int = 30) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running value total + event count, emitted on every batch; state
    expires after ``timeout_minutes`` of processing-time inactivity.

    The pattern the built-in windowed aggs can't express: arbitrary
    per-key state evolving across micro-batches.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, total_value double, n_events long"
    state_schema = "total_value double, n_events long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [total], "n_events": [n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_within_watermark(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once dedup: drop re-deliveries of the same key
    arriving within the watermark horizon (at-least-once source ->
    effectively-once sink).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes the key's first-seen event time, so state is
    O(keys per horizon) — bounded — where a plain ``dropDuplicates``
    on a stream retains every key forever and OOMs at 100 TB/day.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(df: DataFrame, query_name: str, timeout_sec: int = 120):
    """Execute a streaming plan over everything currently available,
    then stop (the reference's daily-refresh semantics, exactly-once).
    Results land in the in-memory table ``query_name``."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(_output_mode(df))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def _output_mode(df: DataFrame) -> str:
    logical = df._jdf.queryExecution().logical().toString()
    if "FlatMapGroupsInPandasWithState" in logical:
        return "update"  # the only mode applyInPandasWithState supports
    if "Aggregate" in logical:
        # checked BEFORE Deduplicate: a static join side may contain a
        # distinct() whose Deduplicate node must not demote an
        # aggregating stream to append mode
        return "complete"
    if "Deduplicate" in logical:
        return "append"  # dedup streams have no aggregate to re-emit
    return "append"  # stateless transform/join-only streams


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on: str, broadcast_dim: bool = True
) -> DataFrame:
    """Stream-static join: decorate a stream with a slowly-changing
    dimension table (user profile, customer master, allowlist).

    Stream-static inner/left joins are STATELESS — each micro-batch
    joins against the current dim snapshot, nothing is buffered — so
    this costs one broadcast per batch and no state store. The static
    side is re-read per batch, which is precisely what makes it the
    right shape for slowly-changing dims: an updated dim file is picked
    up on the next trigger without restarting the query. Broadcast is
    the default because dims are small; disable for a large static side
    and Spark plans a shuffled join of the batch instead.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, "left")


def apply_batch_once(
    spark,
    state_path: str,
    batch_id: int,
    partial: DataFrame,
    merge,
) -> bool:
    """Merge a micro-batch's ``partial`` into the parquet snapshot at
    ``state_path`` exactly once per ``batch_id`` — the retry guard the
    additive maintainers need under foreachBatch's at-least-once
    contract.

    foreachBatch can re-deliver a batch whose snapshot overwrite
    SUCCEEDED but whose checkpoint commit didn't (failure in the gap);
    re-merging additive state then double-counts. The last applied
    batch id is therefore stored IN the snapshot itself (constant
    ``__batch_id`` column — same atomicity domain as the data, unlike
    a sidecar file), and a batch with id <= the stored one is skipped.
    Valid within one checkpoint lineage: deleting the checkpoint while
    keeping the state restarts batch numbering and must be treated as
    operator error (wipe both or neither).

    ``merge(snapshot_df, partial_df) -> DataFrame`` combines the prior
    state (``__batch_id`` already dropped) with the batch partial.
    Returns True if the batch was applied, False if skipped as a
    retry.
    """
    try:
        snap = spark.read.parquet(state_path)
        applied = snap.agg(F.max("__batch_id")).first()[0]
        if applied is not None and applied >= batch_id:
            return False
        merged = merge(snap.drop("__batch_id"), partial)
    except Exception:  # first batch: no snapshot yet
        merged = partial
    (
        merged.withColumn("__batch_id", F.lit(int(batch_id)))
        .localCheckpoint(eager=True)
        .write.mode("overwrite")
        .parquet(state_path)
    )
    return True


def read_state(spark, state_path: str) -> DataFrame:
    """Read a maintained snapshot without its ``__batch_id`` marker."""
    snap = spark.read.parquet(state_path)
    return snap.drop("__batch_id")


def maintain_aggregate(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: tuple[str, ...] = ("event_type",),
    timeout_sec: int = 120,
):
    """Incremental aggregate-table maintenance via foreachBatch — the
    standard streaming->serving-table pattern (counts/sums per key kept
    current in a parquet table as batches arrive).

    Each micro-batch computes its partial (count, sum) per key —
    additive, so merging with the snapshot is a union + re-aggregate,
    never a rescan of history. Exactly-once comes from the streaming
    checkpoint (an already-processed batch is not re-delivered after
    restart) PLUS the :func:`apply_batch_once` batch-id guard, which
    closes foreachBatch's at-least-once gap: a batch whose overwrite
    landed but whose checkpoint commit didn't is skipped on retry
    instead of double-counted. The merged snapshot is
    localCheckpoint-materialized BEFORE the overwrite, because lazily
    overwriting a parquet path that the same plan is reading corrupts
    the read.

    At scale the snapshot overwrite becomes a partition overwrite on
    the key's hash bucket (sources/io.write_partition_overwrite) so a
    batch touching few keys rewrites few files.
    """

    def merge(snap: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            snap.unionByName(partial)
            .groupBy(*keys)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        apply_batch_once(
            batch_df.sparkSession, state_path, batch_id, partial, merge
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def stream_stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the clicks
    that preceded it within ``attribution_window`` for the same user.

    Both sides carry watermarks and the join condition time-bounds the
    match in BOTH directions, so Spark can expire buffered rows: a
    click older than watermark + window and a purchase older than the
    watermark are evicted from the state store. Without the time bound
    a stream-stream join would buffer both streams forever — the state
    size here is O(events per window horizon), which is what makes the
    join viable on an unbounded 100 TB/day stream. Output is append
    mode (matches emit once both sides' watermarks pass).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (event-count, max-value) via ``transformWithState``
    — Spark 4's arbitrary-state API (successor to
    ``applyInPandasWithState``, cf. user_cumulative_value above): typed
    ValueState survives across micro-batches in the state store, and the
    operator emits one updated row per user per batch.

    The aggregates are order-independent (count and max), so the
    emitted values are deterministic under any partitioning/batch
    split — which is what the exactly-once test asserts. State is one
    fixed-width row per user: O(users), the minimal stateful footprint.

    Env gate: transformWithState's Python driver worker imports
    google.protobuf, which this container ships broken, so the test
    skips here (run it on a normal cluster image); the
    applyInPandasWithState twin above is the in-container-verified
    custom-stateful path.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mx", T.DoubleType()),
        ]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = 0, float("-inf")
            if self._state.exists():
                n, mx = self._state.get()
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType="user_id long, n_events long, max_value double",
        outputMode="Update",
        timeMode="None",
    )


def maintain_latest_state(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: tuple[str, ...] = ("user_id",),
    version_col: str = "ts",
    tiebreak: str = "event_id",
    timeout_sec: int = 120,
):
    """foreachBatch row-level MERGE: keep the latest row per key in a
    parquet snapshot (the streaming CDC-compaction / serving-table
    pattern, complementing `maintain_aggregate`).

    Where `maintain_aggregate` is ADDITIVE (a replayed batch would
    double-count, so it leans on the checkpoint for exactly-once), the
    last-writer-wins merge here is IDEMPOTENT BY CONSTRUCTION: the
    survivor per key is the max over a total order (version, tiebreak),
    and max is insensitive to re-delivery. Losing the checkpoint and
    replaying the whole stream converges to the same snapshot — the
    stronger operational guarantee, available whenever the merge is a
    lattice join rather than a sum (cf. CRDT join semantics).

    Per batch: compact the batch itself first (cheap, bounded by batch
    size), then merge with the snapshot via the same compaction. At
    scale the snapshot side co-partitions on the key (bucketed table)
    so the merge shuffles only the batch.
    """
    from ..operators.upsert import latest_by_key

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        compacted = latest_by_key(batch_df, list(keys), version_col, tiebreak)
        try:
            snap = spark.read.parquet(state_path)
            merged = latest_by_key(
                snap.unionByName(compacted), list(keys), version_col, tiebreak
            )
        except Exception:  # first batch: no snapshot yet
            merged = compacted
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def maintain_time_bucket_rollup(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: tuple[str, ...] = ("event_type",),
    bucket_seconds: int = 3600,
    timeout_sec: int = 120,
):
    """Continuous-aggregate maintenance for the hypertable rollup
    (operators/timeseries.time_bucket_rollup): each micro-batch's
    per-bucket summaries merge additively into the materialized
    finest-grain rollup — the streaming half of the TimescaleDB
    continuous-aggregate pattern whose batch half is rollup_coarser.

    Every summary is a semigroup (SUM/SUM/MIN/MAX), so merging is a
    union + re-aggregate over only the buckets the batch touched plus
    the snapshot — never a rescan of raw history. Exactly-once: the
    streaming checkpoint suppresses redelivery and the
    :func:`apply_batch_once` batch-id guard skips a retried batch whose
    overwrite already landed (the at-least-once gap); the merged
    snapshot materializes (localCheckpoint) before overwriting the
    path it read. At scale the overwrite becomes a partition overwrite
    keyed by the bucket, so late data rewrites only its own bucket's
    files.
    """
    from ..operators.timeseries import time_bucket_rollup

    def merge(snap: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            snap.unionByName(partial)
            .groupBy(*keys, "bucket_us")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_key").alias("sum_key"),
                F.min("min_us").alias("min_us"),
                F.max("max_us").alias("max_us"),
            )
        )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        partial = time_bucket_rollup(
            batch_df, "ts", list(keys), bucket_seconds, "user_id"
        )
        apply_batch_once(
            batch_df.sparkSession, state_path, batch_id, partial, merge
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def maintain_trending_terms(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    top_k: int = 20,
    timeout_sec: int = 120,
):
    """Live trending-terms table: per micro-batch, merge the batch's
    event-type counts additively into a full count snapshot, then
    materialize the top-``top_k`` view from the merged counts — the
    streaming leaderboard pattern (counts are the mergeable state;
    the ranking is DERIVED per refresh, never maintained
    incrementally, because rank is not additive).

    Exactly-once by the same checkpoint + :func:`apply_batch_once`
    batch-id-guard pairing as maintain_aggregate (the additive counts
    state is what the guard protects; re-deriving the top-k on a retry
    is harmless). Writes two tables under ``state_path``: ``counts``
    (the mergeable state, corpus-complete) and ``topk`` (the serving
    view). At scale the counts table is vocabulary-sized and the top-k
    is a TakeOrdered over it — the raw stream never re-scans.
    """

    def merge(snap: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            snap.unionByName(partial)
            .groupBy("event_type")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        counts_path = f"{state_path}/counts"
        topk_path = f"{state_path}/topk"
        apply_batch_once(spark, counts_path, batch_id, partial, merge)
        (
            read_state(spark, counts_path)
            .orderBy(F.col("cnt").desc(), F.col("event_type"))
            .limit(top_k)
            .write.mode("overwrite")
            .parquet(topk_path)
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)

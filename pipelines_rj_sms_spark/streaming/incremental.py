"""Structured-Streaming facet — the streaming analog of the reference's
scheduled incremental loads (SURVEY §1.1: no true streaming exists in the
reference; recurring 30-min monitors + daily windows map naturally onto
Trigger.AvailableNow micro-batches and watermarked window aggregates).

- incremental_ingest: file-source stream -> conform -> partitioned sink,
  Trigger.AvailableNow (process-everything-then-stop — the scheduled-batch
  semantics with streaming's exactly-once bookkeeping via checkpoint).
- windowed_monitor: the HCI 30-minute monitoring aggregate
  (reports/monitoramento_hci/tasks.py:17-70) as a watermarked tumbling
  window groupBy — late events within the watermark still count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def incremental_ingest(spark: SparkSession, source_path: str,
                       schema: StructType, sink_path: str,
                       checkpoint_path: str, fmt: str = "parquet",
                       ts_col: str | None = None) -> StreamingQuery:
    """Exactly-once incremental file ingestion (the S10-S12 + K1 loop).

    New files under ``source_path`` are discovered per micro-batch; the
    checkpoint replaces the reference's progress table for this path
    (O1 semantics at file granularity).
    """
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .load(source_path)
        .withColumn("_loaded_at", F.current_timestamp())
    )
    if ts_col is not None:
        d = F.col(ts_col).cast("date")
        stream = (
            stream.withColumn("ano_particao", F.year(d))
            .withColumn("mes_particao", F.month(d))
            .withColumn("data_particao", d)
        )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
    )
    if ts_col is not None:
        writer = writer.partitionBy("ano_particao", "mes_particao", "data_particao")
    return writer.start()


def windowed_monitor(events: DataFrame, ts_col: str = "ts",
                     group_cols: tuple[str, ...] = ("event_type",),
                     window_duration: str = "30 minutes",
                     watermark: str = "10 minutes") -> DataFrame:
    """A1/A2 as a streaming aggregate: per-window event counts + approx
    distinct users, tolerant of late data within the watermark.

    approx_count_distinct (HLL) instead of exact distinct: exact distinct
    over an unbounded stream needs unbounded state; HLL state is O(1) per
    group-window — the 100 TB-safe choice.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(
            F.count("*").alias("qtd"),
            F.approx_count_distinct("user_id").alias("usuarios"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols, "qtd", "usuarios",
        )
    )


def stream_upsert(stream_df: DataFrame, table: str, key_cols: list[str],
                  order_col: str, connection_factory,
                  checkpoint_path: str, dialect: str = "mysql",
                  available_now: bool = True) -> StreamingQuery:
    """Streaming reverse-ETL (the K5 upsert, stream-shaped): per
    micro-batch, keep the latest row per key (W3 semantics — duplicate
    keys within a batch collapse deterministically), then keyed upsert.

    foreachBatch + the checkpoint give effectively-once delivery: a
    replayed batch re-upserts the same keys idempotently.
    """
    from pipelines_rj_sms_spark.operators.dedup import dedup_keep_last
    from pipelines_rj_sms_spark.sinks.jdbc_upsert import upsert

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        latest = dedup_keep_last(batch_df, keys=key_cols, order_col=order_col)
        upsert(latest, table, key_cols, connection_factory, dialect=dialect)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(stream: DataFrame, keys: list[str], ts_col: str,
                 delay: str = "10 minutes") -> DataFrame:
    """Streaming W3/U2: drop duplicate keys arriving within the
    watermark window (`dropDuplicatesWithinWatermark`, the bounded-state
    form — plain dropDuplicates on a stream keeps ALL keys forever,
    which is unbounded state at 100 TB/day). Duplicates separated by
    more than ``delay`` are NOT collapsed; pair with the batch
    dedup_keep_last compaction (K-family) for full-history dedup —
    the standard lambda split of the reference's scheduled dedup jobs.
    """
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(keys))


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str | list[str],
                         how: str = "left") -> DataFrame:
    """Stream-static dimension enrich (the C21/geocode posture without
    the HTTP hop): each micro-batch broadcast-joins the static dim —
    stateless, no watermark needed, dim re-read per batch so a
    lakehouse-refreshed dimension is picked up live.
    """
    return stream.join(F.broadcast(dim), on, how)


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str, left_ts: str, right_ts: str,
                         lower: str = "0 seconds",
                         upper: str = "15 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream equi-join with a time-interval predicate — the
    streaming analog of the batch range/as-of join (timeseries.py):
    right-side rows match a left row when right_ts lands in
    [left_ts - lower-bound .. left_ts + upper]. Both sides carry
    watermarks so Catalyst can bound join state (rows outside the
    interval + watermark are evicted, keeping state O(window), not
    O(stream)).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.expr(f"{left_ts} - interval {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {upper}"))
    )
    return lw.join(rw, cond)


def run_stream_once(query: StreamingQuery, timeout_s: int = 300) -> None:
    """Await an AvailableNow query's completion (test/driver helper)."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()


def stream_corpus_dedup(stream_df: DataFrame, out_path: str,
                        store_path: str, checkpoint_path: str,
                        id_col: str, text_col: str,
                        num_hashes: int = 32, bands: int = 8,
                        sim_threshold: float = 0.5,
                        hash_fn: str = "xxhash64",
                        available_now: bool = True) -> StreamingQuery:
    """Streaming corpus ingestion with cross-batch NEAR-dup dedup.

    `stream_dedup` (watermarked dropDuplicates) removes exact key
    repeats within the watermark; this operator removes *near*
    duplicates against everything ever accepted, with no watermark
    horizon: each micro-batch runs `dedup.incremental_lsh_dedup`
    against the persisted signature store at ``store_path``, appends
    survivors to ``out_path`` and their signatures to the store. State
    is the store itself — ~a few hundred bytes per accepted doc, the
    corpus text never re-read (the 100 TB continuous-curation shape).

    Effectively-once without a transactional table format, via write
    ordering + batch-id partitioning:
    - accepted docs land in an ``_ingest_batch=<id>`` partition with
      DYNAMIC overwrite — a replayed batch rewrites its own partition
      instead of appending twice;
    - signatures append AFTER the docs. Crash before the sig write ->
      replay recomputes the identical accepted set (store unchanged)
      and overwrites the same partition. Crash after it -> replay
      rejects every doc as its own store duplicate, produces an empty
      accepted set, and dynamic overwrite of an empty frame touches no
      partitions — prior output stands, and no duplicate sigs append
      (the rejected docs' sigs are filtered from accepted_sigs too).
    Ids must be unique across batches, as in incremental_lsh_dedup.
    """
    from pipelines_rj_sms_spark.operators.cache import release
    from pipelines_rj_sms_spark.operators.dedup import incremental_lsh_dedup

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_path)
        except Exception:
            store = None
        accepted, sigs = incremental_lsh_dedup(
            batch_df, store, id_col, text_col,
            num_hashes=num_hashes, bands=bands,
            sim_threshold=sim_threshold, hash_fn=hash_fn)
        sigs = sigs.persist()
        sigs.count()  # pin before the store it reads is appended to
        (accepted.withColumn("_ingest_batch", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_ingest_batch").parquet(out_path))
        sigs.write.mode("append").parquet(store_path)
        sigs.unpersist()
        release(accepted)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_scd2(stream_df: DataFrame, history_path: str,
                checkpoint_path: str, key_col: str, ts_col: str,
                state_cols: list[str] | str,
                tiebreak_col: str | None = None,
                n_buckets: int = 64,
                available_now: bool = True) -> StreamingQuery:
    """Continuously maintained SCD2 history: each micro-batch of
    observations merges into the validity-interval table at
    ``history_path`` via `scd.merge_history` — only batch-touched keys
    recompress (append-only delivery per key, as that operator
    requires).

    The history is partitioned by a hash bucket of the key
    (``_kb = pmod(xxhash64(key), n_buckets)``), so a batch touches only
    its keys' buckets: the target read partition-prunes to those
    buckets and DYNAMIC overwrite rewrites only them — cost scales
    with the batch's key spread, never the table (the merge_upsert
    posture applied to interval history).

    Replay semantics: an ``_applied`` marker parquet records merged
    batch ids; a replayed batch id is skipped, so the normal
    crash/restart path is effectively-once. The unprotected window is
    a crash BETWEEN the history write and the marker append — a replay
    then re-merges that batch: interval boundaries stay correct
    (states re-assert themselves), but that batch's ``n_obs``
    contributions double. If exact observation counts matter across
    that window, rebuild from the raw log (compress_history is the
    oracle-checked full recompute).

    Batch ids are scoped to the checkpoint, so the marker rows carry
    the checkpoint's fingerprint alongside the id: a restart on the
    SAME checkpoint skips its replayed batches, while a different
    query (fresh checkpoint, e.g. a second source feeding the same
    history) gets its own marker namespace instead of having its
    batch 0 silently swallowed by the first query's batch 0.
    """
    from pipelines_rj_sms_spark.operators.scd import (
        compress_history, merge_history)

    if isinstance(state_cols, str):
        state_cols = [state_cols]
    marker_path = history_path.rstrip("/") + "_applied"
    ck_id = _checkpoint_fingerprint(checkpoint_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if _batch_already_applied(spark, marker_path, ck_id, batch_id):
            return
        kb = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        exists = True
        try:
            hist = spark.read.parquet(history_path)
        except Exception:
            exists = False
        if exists:
            touched = [r[0] for r in batch_df.select(
                kb.alias("_kb")).distinct().collect()]  # ≤ n_buckets
            hist_t = hist.filter(F.col("_kb").isin(touched)).drop("_kb")
            merged = merge_history(hist_t, batch_df, key_col, ts_col,
                                   state_cols, tiebreak_col)
        else:
            merged = compress_history(batch_df, key_col, ts_col,
                                      state_cols, tiebreak_col)
        out = merged.withColumn("_kb", F.pmod(F.xxhash64(F.col(key_col)),
                                              F.lit(n_buckets))).persist()
        out.count()  # materialize BEFORE overwriting the partitions read
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_kb").parquet(history_path))
        out.unpersist()
        _mark_batch_applied(spark, marker_path, ck_id, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _checkpoint_fingerprint(checkpoint_path: str) -> str:
    """Stable id for a streaming query's checkpoint. Spark batch ids
    are scoped PER CHECKPOINT (two queries both start at batch 0), so
    replay markers key on (checkpoint, batch_id) — a bare batch-id
    marker would make a second query's batch 0 look already-applied."""
    import hashlib
    return hashlib.md5(checkpoint_path.encode("utf-8")).hexdigest()[:16]


def _batch_already_applied(spark, marker_path: str, ck_id: str,
                           batch_id: int) -> bool:
    try:
        marks = spark.read.parquet(marker_path)
    except Exception:
        return False
    return bool(
        marks.filter((F.col("ck") == ck_id)
                     & (F.col("batch_id") == batch_id)).take(1))


def _mark_batch_applied(spark, marker_path: str, ck_id: str,
                        batch_id: int) -> None:
    spark.createDataFrame([(ck_id, batch_id)],
                          "ck string, batch_id long") \
        .write.mode("append").parquet(marker_path)


def _overwrite_touched_partitions(merged: DataFrame, rollup_path: str,
                                  date_col: str) -> None:
    """Safely replace just the date partitions present in ``merged``.

    Two failure modes on a vanilla SparkSession are closed here (both
    found in review): (1) a static `mode("overwrite")` deletes EVERY
    prior date partition, not just the touched ones — the explicit
    `partitionOverwriteMode=dynamic` writer option makes the scope
    per-partition regardless of session defaults; (2) the merge plan
    lazily reads the same files the overwrite is about to delete, so
    the frame is persisted and forced with a count() BEFORE any file is
    touched (the same discipline `stream_scd2` uses). The count is one
    row per (date x group) — bounded by the rollup grain, not the data.
    """
    merged = merged.persist()
    try:
        merged.count()
        (merged.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(date_col).parquet(rollup_path))
    finally:
        merged.unpersist()


def stream_expectations(stream_df: DataFrame, expectations,
                        report_path: str, checkpoint_path: str,
                        quarantine_path: str | None = None,
                        available_now: bool = True) -> StreamingQuery:
    """Streaming data-contract gate: evaluate the declarative
    expectations suite (`quality/expectations.py`) on EVERY
    micro-batch and append the per-batch report (batch id + one row
    per expectation) to a parquet history — the continuous form of the
    reference's cron'd quality checks, with the same one-scan
    evaluation inside each batch.

    With ``quarantine_path``, rows violating any row-level expectation
    (everything except `unique`) are appended there instead of being
    silently counted — the split-the-stream pattern (clean rows are
    the caller's stream; this gate only observes). foreachBatch +
    checkpoint give effectively-once report/quarantine appends on
    replay (batch-id partition overwrite).
    """
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.quality.expectations import (
        run_expectations)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = run_expectations(batch_df, expectations) \
            .withColumn("batch_id", F.lit(batch_id))
        (report.coalesce(1).write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(report_path))
        if quarantine_path is not None:
            viol = None
            for e in expectations:
                v = e.violation()
                if v is not None:
                    viol = v if viol is None else (viol | v)
            if viol is not None:
                bad = batch_df.filter(viol) \
                    .withColumn("batch_id", F.lit(batch_id))
                (bad.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(quarantine_path))

    writer = (stream_df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sketch_rollup(stream_df: DataFrame, rollup_path: str,
                         checkpoint_path: str,
                         group_cols: list[str], value_col: str,
                         date_col: str, lg_k: int = 12,
                         available_now: bool = True) -> StreamingQuery:
    """Continuous-aggregate maintenance for the HLL distinct rollup
    (the hypertable pattern, stream-shaped): each micro-batch builds
    fine-grain (date x group) sketches and MERGES them into the
    persisted rollup table — re-reading only the date partitions the
    batch touches, union-merging sketch bytes (`hll_union_agg`), and
    dynamic-overwriting just those partitions. Late data folds into
    its own date's sketch; queries at any coarser grain keep using
    `sketches.merge_rollup` over the same table unchanged.

    State lives in the parquet rollup, not the stream. Replay
    semantics, stated precisely: the DISTINCT estimates are
    exactly-once under replay — a re-merged batch's values fold onto
    registers they already set, so HLL union is idempotent for
    duplicates. The companion ``row_count`` is a plain additive sum
    and therefore at-least-once under replay; treat it as a freshness
    signal, not an exact count (the exact path is the lakehouse
    merge_upsert with batch markers, as in `stream_scd2`).
    """
    from pipelines_rj_sms_spark.operators.sketches import build_sketches

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = build_sketches(batch_df, [date_col, *group_cols],
                               value_col, lg_k=lg_k)
        dates = [r[0] for r in fresh.select(date_col).distinct().collect()]
        try:
            existing = (spark.read.parquet(rollup_path)
                        .filter(F.col(date_col).isin(dates)))
            both = existing.unionByName(fresh)
        except Exception:
            both = fresh
        merged = (both.groupBy(date_col, *group_cols)
                  .agg(F.hll_union_agg(F.col("distinct_sketch"),
                                       F.lit(True))
                       .alias("distinct_sketch"),
                       F.sum("row_count").alias("row_count")))
        _overwrite_touched_partitions(merged, rollup_path, date_col)

    writer = (stream_df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_additive_rollup(stream_df: DataFrame, rollup_path: str,
                           checkpoint_path: str,
                           group_cols: list[str], date_col: str,
                           sum_cols: list[str] | None = None,
                           available_now: bool = True) -> StreamingQuery:
    """EXACT continuous aggregate — the additive companion to
    `stream_sketch_rollup`: each micro-batch's per-(date x group)
    counts and sums merge into the persisted rollup by ADDITION,
    touching only the batch's date partitions (partition-pruned read +
    dynamic overwrite).

    Addition is not replay-idempotent, so this one carries the
    `_applied` batch-marker guard (same discipline and same documented
    crash window as `stream_scd2`): a replayed batch id is skipped
    outright. Queries aggregate the rollup further with plain
    sum()/group-by at any coarser grain — additivity is the whole
    point (count/sum only; for distincts use the sketch rollup, for
    keyed upserts use merge_upsert).

    Determinism note: ``sum_cols`` keep their native type — pass
    BIGINT fixed-point units (or pre-quantized `det_units`) for
    replay-exact rollups; a raw double sum here carries the usual
    combine-order ulp (see functions/numeric.py), which matters if the
    rollup feeds hash-compared downstream outputs.
    """
    sums = list(sum_cols or [])
    marker_path = rollup_path.rstrip("/") + "_applied"
    ck_id = _checkpoint_fingerprint(checkpoint_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if _batch_already_applied(spark, marker_path, ck_id, batch_id):
            return
        aggs = [F.count("*").alias("row_count")] + [
            F.sum(c).alias(f"sum_{c}") for c in sums]
        fresh = batch_df.groupBy(date_col, *group_cols).agg(*aggs)
        dates = [r[0] for r in fresh.select(date_col).distinct().collect()]
        try:
            existing = (spark.read.parquet(rollup_path)
                        .filter(F.col(date_col).isin(dates)))
            both = existing.unionByName(fresh)
        except Exception:
            both = fresh
        merged = both.groupBy(date_col, *group_cols).agg(
            F.sum("row_count").alias("row_count"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sums])
        _overwrite_touched_partitions(merged, rollup_path, date_col)
        _mark_batch_applied(spark, marker_path, ck_id, batch_id)

    writer = (stream_df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quantile_rollup(stream_df: DataFrame, rollup_path: str,
                           checkpoint_path: str,
                           group_cols: list[str], value_col: str,
                           date_col: str, k: int = 400,
                           available_now: bool = True) -> StreamingQuery:
    """Continuous KLL quantile rollup — the percentile companion to
    `stream_sketch_rollup`: per micro-batch, build fine-grain
    (date x group) KLL sketches and merge them into the persisted
    rollup (partition-pruned read of the batch's dates + dynamic
    overwrite). Query any coarser grain with
    `sketches.merge_quantile_rollup`, unchanged.

    Replay semantics: re-merging a batch re-inserts its values, which
    doubles their WEIGHT uniformly — quantile estimates are
    scale-invariant under uniform duplication, so replayed estimates
    stay within the sketch's rank-error bound; ``row_count`` is
    additive and therefore at-least-once (same trade documented on the
    additive rollup, resolved there with batch markers when exactness
    matters).
    """
    from pipelines_rj_sms_spark.operators.sketches import (
        build_quantile_sketches)

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = build_quantile_sketches(
            batch_df, [date_col, *group_cols], value_col, k=k)
        dates = [r[0] for r in fresh.select(date_col).distinct().collect()]
        try:
            existing = (spark.read.parquet(rollup_path)
                        .filter(F.col(date_col).isin(dates)))
            both = existing.unionByName(fresh)
        except Exception:
            both = fresh
        merged = (both.groupBy(date_col, *group_cols)
                  .agg(F.kll_merge_agg_double(F.col("quantile_sketch"))
                       .alias("quantile_sketch"),
                       F.sum("row_count").alias("row_count")))
        _overwrite_touched_partitions(merged, rollup_path, date_col)

    writer = (stream_df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

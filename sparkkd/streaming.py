"""Structured Streaming ingestion: the distributed dynamic-insert path.

The reference's ``add()`` appends a value and amortizes index maintenance
(logarithmic rebuild of the trailing power-of-2 block,
``src/_kdtree_median.hpp:433-441``; queries scan a forest of trees plus a
linear tail ``:394-407``).  The streaming twin:

* micro-batches of new image rows arrive via ``readStream`` (file source
  here; kafka in production — same code from ``foreachBatch`` down);
* each batch is a log-structured ``SnapshotStore.append`` (new immutable
  snapshot = parent files + delta files; readers see base ∪ deltas — the
  forest);
* the batch's DIRTY CELLS are recorded in the snapshot manifest, so
  downstream index maintenance rebuilds per-cell trees only where data
  changed;
* compaction fires on the same doubling rule as the reference's rebuild.

Also provides a windowed event-rate aggregation (watermark + tumbling
window) over the ``events`` table shape, demonstrating the
late-data-tolerant streaming aggregation pattern.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cells, engine
from .snapshots import SnapshotStore

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string,"
    " caption string, phash long"
)


def dirty_cells(batch: DataFrame, level: int) -> list[int]:
    """Cells touched by a micro-batch (drives selective tree rebuilds)."""
    rows = (
        engine.with_cell(engine.with_coords(batch), level)
        .select("cell_id")
        .distinct()
        .collect()
    )
    return sorted(r["cell_id"] for r in rows)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    store: SnapshotStore,
    level: int,
    checkpoint_dir: str,
    compact: bool = True,
):
    """File-source streaming ingest -> snapshot append per micro-batch.

    Returns the StreamingQuery; callers use availableNow-style draining
    (``q.processAllAvailable()``) in tests.  Exactly-once: the snapshot
    append is idempotent per epoch via the epoch marker in the manifest —
    a replayed epoch (restart after crash between append and checkpoint
    commit) is skipped.
    """

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # idempotence across restarts: skip epochs already ingested
        last = store.latest_snapshot_id()
        if last is not None:
            man = store.manifest(last)
            done = man.get("epochs", [])
            if epoch_id in done:
                return
        dirty = dirty_cells(batch, level)
        snap_id = store.append(batch)
        man_path = store._manifest_path(snap_id)
        man = json.loads(man_path.read_text())
        prev = store.manifest(snap_id - 1).get("epochs", []) if snap_id > 1 else []
        man["epochs"] = prev + [epoch_id]
        man["dirty_cells"] = dirty
        man_path.write_text(json.dumps(man, indent=1))
        if compact and store.needs_compaction():
            store.compact(spark)

    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )


QUERY_SCHEMA = "query_id string, qlat double, qlon double"
POSE_QUERY_SCHEMA = (
    "query_id string, qw double, qx double, qy double, qz double,"
    " tx double, ty double, tz double"
)


def stream_knn_enrich(
    spark: SparkSession,
    query_dir: str,
    index,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 8,
):
    """Streaming kNN enrichment: micro-batches of query points are answered
    against a PREBUILT GeoIndex (build once, query many — the reference's
    contract, streamed) and appended as parquet per epoch.  foreachBatch
    gives exactly-once per epoch through the checkpoint; the index's
    pre-partitioned corpus cache means each micro-batch shuffles only its
    own (small) candidate side."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        index.knn_join(batch, k=k).write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    return (
        spark.readStream.schema(QUERY_SCHEMA)
        .parquet(query_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )


def stream_pose_enrich(
    spark: SparkSession,
    query_dir: str,
    index,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 8,
):
    """Streaming angular kNN enrichment over the ROTATION space: pose
    micro-batches answered against a prebuilt So3Index (or Se3Index) —
    identical contract to stream_knn_enrich, same exactly-once-per-epoch
    semantics; only the input schema differs (pose quaternions +
    translations)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        index.knn_join(batch, k=k).write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    return (
        spark.readStream.schema(POSE_QUERY_SCHEMA)
        .parquet(query_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )


def asof_join_events(
    events: DataFrame, target_type: str = "click", ref_type: str = "view"
) -> DataFrame:
    """AS-OF join on the events stream shape: for every event of
    ``target_type``, the most recent (ts <=, ties by event_id desc)
    ``ref_type`` event of the SAME user — the classic point-in-time
    enrichment Spark lacks as a built-in.

    Composition of existing DataFrame ops (no UDF): tag both sides, union,
    ONE window per user ordered by (ts, is_target, event_id) and
    last(ignorenulls) carries the ref id/value forward.  One shuffle on
    user_id; no range join, no cross join.  Returns
    (event_id, ref_event_id, ref_value, gap_us) with NULL ref columns for
    targets with no prior ref event."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    ref = src.filter(F.col("event_type") == ref_type).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_target"),
        F.col("event_id").alias("tag_id"),
        F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
        F.col("ts").alias("r_ts"),
    )
    tgt = src.filter(F.col("event_type") == target_type).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_target"),
        F.col("event_id").alias("tag_id"),
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(None).cast("timestamp").alias("r_ts"),
    )
    # refs sort BEFORE targets at equal ts (is_target asc), so ts-equality
    # counts as "prior"; among equal-ts refs the max event_id wins — both
    # choices mirrored exactly in the oracle SQL
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_target", "tag_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ref.unionByName(tgt).select(
        "user_id",
        "ts",
        "is_target",
        "tag_id",
        F.last("r_id", ignorenulls=True).over(w).alias("ref_event_id"),
        F.last("r_value", ignorenulls=True).over(w).alias("ref_value"),
        F.last("r_ts", ignorenulls=True).over(w).alias("ref_ts"),
    )
    return carried.filter(F.col("is_target") == 1).select(
        F.col("tag_id").alias("event_id"),
        "ref_event_id",
        "ref_value",
        (F.unix_micros("ts") - F.unix_micros("ref_ts")).alias("gap_us"),
    )


def windowed_event_rates(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Late-data-tolerant windowed aggregation over the events stream shape
    (event_id, ts, user_id, event_type, value, props): count + sum(value)
    per (window, event_type).  Works on both a static DataFrame (tests,
    oracle comparison) and a readStream DataFrame (production)."""
    # parquet timestamp[us] arrives as TIMESTAMP_NTZ; watermarks need
    # TIMESTAMP — cast in both modes so batch oracle and stream agree
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(F.window("ts", window).alias("w"), "event_type").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    ).select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_us: int = 21_600_000_000,
    key: str = "user_id",
) -> DataFrame:
    """Distributed interval-overlap (RANGE) join: every pair of a left and
    a right interval sharing ``key`` whose half-open ``[start_us, end_us)``
    intervals overlap.  Inputs carry ``(key, id, start_us, end_us)`` with
    non-negative epochs; rows with ``end_us <= start_us`` (empty intervals)
    match nothing by definition and are dropped.  Output:
    ``(key, l_id, r_id, overlap_us)`` — all integers, engine-exact.

    Spark has no range-join operator; the naive form is an equi-join on
    ``key`` with a theta residual, which degenerates to per-key nested
    loops when keys are few or hot.  This is the canonical BUCKETED range
    join instead: each interval explodes to the fixed-width time bins it
    covers (``sequence`` over integer bin ids — pure JVM built-ins, explode
    factor ``O(duration/bin_us + 1)``), candidates come from one
    co-partitioned equi-join on ``(key, bin)``, and each qualifying pair is
    emitted EXACTLY ONCE by crediting it to the bin containing
    ``greatest(l.start_us, r.start_us)`` — a bin both sides provably cover
    (max(start) is >= each start and, on overlap, <= min(end)-1) — so
    there is no ``distinct``, one shuffle per side, and per-task work is
    bounded by per-(key, bin) density (AQE skew split is the backstop for
    hot bins).  Pick ``bin_us`` near the typical interval length: that
    keeps the explode factor ~2 while the bin key does the pruning.

    This is the 1-D time-domain twin of the bbox interval-overlap
    predicate in ``engine.raster_vector_join`` (SURVEY §2.4; the
    one-axis specialization of the reference's region-overlap test,
    ``src/_l2space.hpp:134-168``) — the second charter-named temporal
    join after :func:`asof_join_events`.
    """
    def binned(df: DataFrame, side: str) -> DataFrame:
        return (
            df.filter(F.col("end_us") > F.col("start_us"))
            .select(
                F.col(key),
                F.col("id").alias(f"{side}_id"),
                F.col("start_us").alias(f"{side}s"),
                F.col("end_us").alias(f"{side}e"),
                F.explode(
                    F.sequence(
                        F.expr(f"start_us DIV {bin_us}"),
                        F.expr(f"(end_us - 1) DIV {bin_us}"),
                    )
                ).alias("bin"),
            )
        )

    pairs = binned(left, "l").join(binned(right, "r"), [key, "bin"])
    return (
        pairs.filter(
            (F.col("ls") < F.col("re"))
            & (F.col("rs") < F.col("le"))
            & (F.expr(f"greatest(ls, rs) DIV {bin_us}") == F.col("bin"))
        )
        .select(
            key,
            "l_id",
            "r_id",
            (F.least("le", "re") - F.greatest("ls", "rs")).alias("overlap_us"),
        )
    )


def sessionize(events: DataFrame, gap_us: int = 300_000_000) -> DataFrame:
    """Per-user SESSIONS with an inactivity gap (batch gaps-and-islands):
    a new session starts when the gap to the user's previous event exceeds
    ``gap_us`` microseconds.  Returns one row per session:
    (user_id, session_no, session_start_us, session_end_us, n_events,
    total_value).

    Pure window functions + one groupBy — whole-stage codegen, one shuffle
    on user_id; the DuckDB oracle mirrors lag/sum-over/epoch_us term for
    term.  This is the BATCH twin of :func:`stream_sessionize` (the
    applyInPandasWithState path): on any closed input both produce
    identical sessions, reconciled in tests."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > F.lit(gap_us)
            ),
            1,
        )
        .otherwise(0)
    )
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = src.withColumn("brk", brk).withColumn(
        "session_no", F.sum("brk").over(ws).cast("int")
    )
    return tagged.groupBy("user_id", "session_no").agg(
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _sessionize_batch(ts_us, vals, cur, gap_us):
    """Vectorized gaps-and-islands over ONE sorted batch of a user's
    events.  ``cur`` is the open session ``(start_us, end_us, n, total)``
    or None.  Returns ``(closed_sessions, new_cur)``.

    The open state session absorbs the batch PREFIX: its running end
    after merging events [0, i) is ``max(e0, ts_us[i-1])`` (batch
    ascending), so the first index where
    ``ts_us[i] - max(e0, ts_us[i-1]) > gap`` closes it.  Past that point
    e0 is irrelevant and plain ``diff(ts) > gap`` segments the rest.
    Segment totals come from ``np.add.reduceat`` (pairwise summation —
    within float epsilon of a scalar loop; emitted values are rounded
    to 2 decimals downstream, so the order never shows)."""
    import numpy as np

    closed: list[tuple[int, int, int, float]] = []
    n = len(ts_us)
    if not n:
        return closed, cur
    if cur is not None:
        s0, e0, n0, t0 = cur
        prev = np.empty(n, dtype=np.int64)
        prev[0] = e0
        if n > 1:
            np.maximum(ts_us[:-1], e0, out=prev[1:])
        sb = (ts_us - prev) > gap_us
        k = int(np.argmax(sb)) if sb.any() else n
        if k == 0:
            closed.append((int(s0), int(e0), int(n0), float(t0)))
            cur = None
        else:
            pref = float(np.add.reduceat(vals[:k], [0])[0])
            cur = (
                int(s0),
                int(max(e0, ts_us[k - 1])),
                int(n0) + k,
                float(t0) + pref,
            )
            if k < n:
                closed.append(cur)
                cur = None
    else:
        k = 0
    if k < n:
        rest_ts = ts_us[k:]
        rest_v = vals[k:]
        brk = np.empty(len(rest_ts), dtype=bool)
        brk[0] = True
        brk[1:] = (rest_ts[1:] - rest_ts[:-1]) > gap_us
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(rest_ts))
        sums = np.add.reduceat(rest_v, starts)
        for i in range(len(starts) - 1):
            closed.append(
                (
                    int(rest_ts[starts[i]]),
                    int(rest_ts[ends[i] - 1]),
                    int(ends[i] - starts[i]),
                    float(sums[i]),
                )
            )
        j = len(starts) - 1
        cur = (
            int(rest_ts[starts[j]]),
            int(rest_ts[-1]),
            int(len(rest_ts) - starts[j]),
            float(sums[j]),
        )
    return closed, cur


def stream_dedup_exact(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Streaming exact dedup for an ingestion pipeline: emit the FIRST
    arrival per content hash, drop later duplicates, with dedup state
    BOUNDED by the event-time watermark (``dropDuplicatesWithinWatermark``
    — Spark expires a hash's state once the watermark passes its event
    time, so 10^12-document ingestion streams with finite state).

    The streaming twin of :func:`sparkkd.datapipe.dedup_exact` (same
    md5 content hash).  Semantics differ exactly as Spark documents:
    batch keeps a deterministic keeper (min doc_id) over the WHOLE
    corpus, streaming keeps the first arrival and may re-admit a
    duplicate separated by more than the watermark horizon — the batch
    op is the compaction-time backstop.  Output: the input columns plus
    ``content_hash``, one row per distinct in-horizon hash."""
    hashed = docs.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withColumn("content_hash", F.md5(F.concat_ws("\x1f", *content_cols)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_sessionize(
    events: DataFrame,
    gap_us: int = 300_000_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator via ``applyInPandasWithState``
    (the charter's named mechanism): per-user sessionization over an
    event stream, emitting a session only once it is CLOSED — either a
    later event of the same user broke the gap inside a batch, or the
    event-time watermark passed ``session_end + gap`` (state timeout).

    State per user: (start_us, end_us, n, total) of the OPEN session —
    O(1) per key regardless of stream length; the watermark bounds state
    lifetime, so 10^9 users stream with bounded memory.  Emitted rows
    match :func:`sessionize` on the same closed input (reconciled in
    tests) except ``session_no`` (a batch-global ordinal a stream cannot
    know); join on (user_id, session_start_us) instead."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    ).withWatermark("ts", watermark)
    out_schema = (
        "user_id int, session_start_us long, session_end_us long,"
        " n_events long, total_value double"
    )
    state_schema = "start_us long, end_us long, n long, total double"

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            s0, e0, n0, t0 = state.get
            closed.append((s0, e0, n0, t0))
            state.remove()
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [uid] * len(closed),
                        "session_start_us": [c[0] for c in closed],
                        "session_end_us": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                        "total_value": [round(c[3], 2) for c in closed],
                    }
                )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts")
        # normalize to ns first — Arrow may hand datetime64[us] or [ns]
        ts_us = (
            rows["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            // 1000
        )
        vals = rows["value"].to_numpy()
        cur = state.get if state.exists else None  # (start, end, n, total)
        seg_closed, cur = _sessionize_batch(ts_us, vals, cur, gap_us)
        closed.extend(seg_closed)
        state.update(cur)
        # close the open session once event time passes end + gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [round(c[3], 2) for c in closed],
                }
            )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

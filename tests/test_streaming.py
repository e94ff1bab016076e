"""Streaming ingest: micro-batch append -> snapshot forest, dirty cells,
idempotent restart; windowed event aggregation vs batch oracle."""

import time

import pyarrow.parquet as pq
import pytest

from sparkkd import streaming, synth
from sparkkd.snapshots import SnapshotStore

pytestmark = pytest.mark.spark


def _write_batch(dirpath, n, seed, name):
    t = synth.gen_images(n, seed=seed)
    pq.write_table(t, dirpath / name)


def test_stream_ingest_appends_snapshots(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    store = SnapshotStore(tmp_path / "snap")
    _write_batch(src, 120, 42, "b1.parquet")

    q = streaming.stream_ingest(
        spark, str(src), store, level=5, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        sid1 = store.latest_snapshot_id()
        assert sid1 is not None
        assert store.read(spark).count() == 120

        _write_batch(src, 80, 43, "b2.parquet")
        q.processAllAvailable()
        assert store.read(spark).count() == 200
        man = store.manifest()
        assert man["dirty_cells"] or man["operation"] == "compact"
    finally:
        q.stop()

    # restart with same checkpoint: no reprocessing, counts stable
    q2 = streaming.stream_ingest(
        spark, str(src), store, level=5, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q2.processAllAvailable()
        assert store.read(spark).count() == 200
    finally:
        q2.stop()


def test_epoch_ledger_survives_compaction(spark, tmp_path):
    """Exactly-once across compaction: compact() must carry the ingested-
    epoch ledger into the new manifest, so a micro-batch replayed after a
    crash (checkpoint loss) post-compaction is still skipped."""
    import shutil

    src = tmp_path / "in3"
    src.mkdir()
    store = SnapshotStore(tmp_path / "snap3")
    _write_batch(src, 60, 45, "b1.parquet")
    ckpt = tmp_path / "ckpt_epoch"
    q = streaming.stream_ingest(
        spark, str(src), store, level=5, checkpoint_dir=str(ckpt), compact=True
    )
    try:
        q.processAllAvailable()
        _write_batch(src, 80, 46, "b2.parquet")  # 80 >= 60 -> compaction fires
        q.processAllAvailable()
    finally:
        q.stop()
    man = store.manifest()
    assert man["operation"] == "compact"
    assert man.get("epochs") == [0, 1]  # ledger survived the compaction
    assert store.read(spark).count() == 140

    # crash scenario: checkpoint wiped -> the file source replays everything
    # as already-seen epochs; the ledger must dedupe them
    shutil.rmtree(ckpt)
    q2 = streaming.stream_ingest(
        spark, str(src), store, level=5, checkpoint_dir=str(ckpt), compact=True
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert store.read(spark).count() == 140  # no duplicated rows


def test_dirty_cells_tracked(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    store = SnapshotStore(tmp_path / "snap2")
    _write_batch(src, 60, 44, "b1.parquet")
    q = streaming.stream_ingest(
        spark,
        str(src),
        store,
        level=5,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        compact=False,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    man = store.manifest()
    batch = spark.read.parquet(str(src / "b1.parquet"))
    assert man["dirty_cells"] == streaming.dirty_cells(batch, 5)
    assert len(man["dirty_cells"]) > 0


def test_windowed_event_rates_matches_batch_oracle(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        streaming.windowed_event_rates(events, window="5 minutes")
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    events.createOrReplaceTempView("ev")
    want = (
        spark.sql(
            """
        SELECT window(ts, '5 minutes').start AS win_start,
               window(ts, '5 minutes').end AS win_end,
               event_type, count(*) AS n_events, sum(value) AS total_value
        FROM ev GROUP BY window(ts, '5 minutes'), event_type
        """
        )
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) > 0


def test_windowed_event_rates_streaming_mode(spark, tmp_path):
    """Drive the same aggregation through an actual streaming query
    (file source -> memory sink) and reconcile with the batch result."""
    import shutil

    events_path = "/root/testdata/sf0.001/events.parquet"
    src = tmp_path / "events_in"
    src.mkdir()
    shutil.copy(events_path, src / "events.parquet")  # file source needs a dir
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = streaming.windowed_event_rates(stream, window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM winagg")
            .toPandas()
            .sort_values(["win_start", "event_type"])
            .reset_index(drop=True)
        )
    finally:
        q.stop()
    batch = (
        streaming.windowed_event_rates(
            spark.read.parquet(events_path), window="5 minutes"
        )
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(batch)


def test_asof_join_events_matches_scalar_oracle(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        streaming.asof_join_events(events)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pdf = events.toPandas()
    ref = pdf[pdf["event_type"] == "view"]
    tgt = pdf[pdf["event_type"] == "click"]
    assert len(got) == len(tgt) > 0
    by_user = {u: g.sort_values(["ts", "event_id"]) for u, g in ref.groupby("user_id")}
    got_idx = got.set_index("event_id")
    import math

    for t in tgt.itertuples():
        g = by_user.get(t.user_id)
        cand = g[g["ts"] <= t.ts] if g is not None else None
        row = got_idx.loc[t.event_id]
        if cand is None or len(cand) == 0:
            assert row["ref_event_id"] is None or math.isnan(row["ref_event_id"])
        else:
            best = cand.iloc[-1]  # max (ts, event_id)
            assert int(row["ref_event_id"]) == int(best["event_id"])
            assert row["ref_value"] == best["value"]


def test_stream_knn_enrich_matches_batch(spark, tmp_path, sf0001_fixtures):
    """Micro-batched kNN enrichment through a prebuilt GeoIndex must equal
    the batch join, per epoch."""
    import pyarrow.parquet as pq2

    from sparkkd import engine

    images = spark.read.parquet(str(sf0001_fixtures / "images.parquet"))
    queries_pdf = spark.read.parquet(str(sf0001_fixtures / "queries.parquet")).toPandas()
    idx = engine.GeoIndex(spark, images, n_images_hint=2000)
    try:
        src = tmp_path / "qstream"
        src.mkdir()
        out = tmp_path / "enriched"
        import pyarrow as pa

        pq2.write_table(pa.Table.from_pandas(queries_pdf.iloc[:80]), src / "q1.parquet")
        q = streaming.stream_knn_enrich(
            spark, str(src), idx, str(out), str(tmp_path / "ckpt_knn"), k=4
        )
        try:
            q.processAllAvailable()
            pq2.write_table(pa.Table.from_pandas(queries_pdf.iloc[80:150]), src / "q2.parquet")
            q.processAllAvailable()
        finally:
            q.stop()
        got = (
            spark.read.parquet(str(out))
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)[["query_id", "image_id", "dist", "rank"]]
        )
        want = (
            idx.knn_join(
                spark.createDataFrame(queries_pdf.iloc[:150]), k=4
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)[["query_id", "image_id", "dist", "rank"]]
        )
        assert len(got) == 150 * 4
        assert got.equals(want)
    finally:
        idx.unpersist()


def test_sessionize_matches_scalar_oracle(spark):
    """Batch gaps-and-islands sessionization vs a scalar python oracle."""
    import pandas as pd

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    gap_us = 300_000_000
    got = (
        streaming.sessionize(events, gap_us=gap_us)
        .toPandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    pdf = events.toPandas().sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, g in pdf.groupby("user_id"):
        ts = g["ts"].to_numpy().astype("datetime64[ns]").astype("int64") // 1000
        vals = g["value"].to_numpy()
        sess = None
        sno = 0
        for t, v in zip(ts, vals):
            if sess is None or t - sess[1] > gap_us:
                if sess is not None:
                    want.append((uid, sno, *sess))
                sno += 1
                sess = (int(t), int(t), 1, float(v))
            else:
                sess = (sess[0], int(t), sess[2] + 1, sess[3] + float(v))
        want.append((uid, sno, *sess))
    want_df = pd.DataFrame(
        want,
        columns=[
            "user_id", "session_no", "session_start_us", "session_end_us",
            "n_events", "total_value",
        ],
    )
    want_df["total_value"] = want_df["total_value"].round(2)
    want_df = want_df.sort_values(["user_id", "session_no"]).reset_index(drop=True)
    assert len(got) == len(want_df)
    for c in got.columns:
        if c == "total_value":
            assert (got[c].round(2) == want_df[c]).all(), c
        else:
            assert (got[c].astype("int64") == want_df[c].astype("int64")).all(), c


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: run the events through a
    FILE stream in two chunks + a watermark-advancing sentinel; every
    emitted (closed) session must equal the batch sessionize row for the
    same (user_id, session_start_us), and most sessions must have closed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as papq

    import pyarrow.compute as pc

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tbl = papq.read_table("/root/testdata/sf0.001/events.parquet")
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    src = tmp_path / "ev"
    src.mkdir()
    half = len(tbl) // 2
    # slice the ORIGINAL arrow table (a pandas round trip changes the
    # parquet timestamp physical type and breaks the stream's schema)
    papq.write_table(tbl.slice(0, half), src / "a.parquet")
    papq.write_table(tbl.slice(half), src / "b.parquet")
    # sentinel: far-future event for a user outside the compare set —
    # advances the watermark so open-session timeouts fire
    sent = tbl.slice(len(tbl) - 1).to_pandas()
    sent["user_id"] = 10_000_001
    sent["ts"] = sent["ts"] + pd.Timedelta(days=2)
    papq.write_table(
        pa.Table.from_pandas(sent, schema=tbl.schema, preserve_index=False),
        src / "z_sentinel.parquet",
    )

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        streaming.stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("sess_out").toPandas()
        .query("user_id < 10_000_000")
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    batch = (
        streaming.sessionize(events)
        .toPandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    bmap = {
        (r.user_id, r.session_start_us): r for r in batch.itertuples()
    }
    assert len(got) > 0.5 * len(batch)  # most sessions closed
    for r in got.itertuples():
        b = bmap[(r.user_id, r.session_start_us)]
        assert r.session_end_us == b.session_end_us
        assert r.n_events == b.n_events
        assert abs(r.total_value - round(b.total_value, 2)) < 1e-9
    # no session emitted twice
    assert got.duplicated(["user_id", "session_start_us"]).sum() == 0


def test_sessionize_batch_kernel_matches_scalar():
    """_sessionize_batch (the vectorized applyInPandasWithState kernel)
    vs a scalar event loop, across randomized multi-batch streams —
    including states whose end exceeds every batch timestamp (late
    events inside the watermark) and single-event batches."""
    import numpy as np

    from sparkkd.streaming import _sessionize_batch

    rng = np.random.default_rng(7)
    gap_us = 1_000
    for trial in range(200):
        n_ev = int(rng.integers(1, 40))
        # clustered timestamps so both merges and breaks occur
        ts = np.sort(
            rng.integers(0, 20_000, size=n_ev).astype(np.int64)
        )
        vals = np.round(rng.uniform(0.0, 10.0, size=n_ev), 2)
        n_batches = int(rng.integers(1, 4))
        cuts = np.sort(rng.integers(0, n_ev + 1, size=n_batches - 1))
        bounds = [0, *cuts.tolist(), n_ev]

        # scalar reference over the SAME batch sequence
        def scalar(ts_us, vs, cur):
            closed = []
            for t, v in zip(ts_us, vs):
                t = int(t)
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (t, t, 1, float(v))
                else:
                    cur = (
                        cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(v)
                    )
            return closed, cur

        cur_v = cur_s = None
        if trial % 3 == 0:
            # open state that may dominate the whole batch (late events)
            e0 = int(rng.integers(0, 40_000))
            cur_v = cur_s = (e0 - 5, e0, 3, 1.25)
        all_v, all_s = [], []
        for b in range(len(bounds) - 1):
            lo, hi = bounds[b], bounds[b + 1]
            cv, cur_v = _sessionize_batch(ts[lo:hi], vals[lo:hi], cur_v, gap_us)
            cs, cur_s = scalar(ts[lo:hi], vals[lo:hi], cur_s)
            all_v.extend(cv)
            all_s.extend(cs)
        def same(a, b):
            # (start, end, n) exact; total within float-summation epsilon
            return a[:3] == b[:3] and abs(a[3] - b[3]) < 1e-9

        assert (cur_v is None) == (cur_s is None), trial
        if cur_v is not None:
            assert same(cur_v, cur_s), trial
        assert len(all_v) == len(all_s), trial
        for a, b in zip(all_v, all_s):
            assert same(a, b), trial


def test_stream_dedup_exact_bounded_state(spark, tmp_path):
    """Streaming exact dedup: duplicates within the watermark horizon are
    dropped (one emission per content hash), the emitted hash set equals
    the batch dedup_exact hash set, and every emitted row is a real
    input row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as papq

    from sparkkd import datapipe

    rng = np.random.default_rng(11)
    n_texts = 60
    texts = [f"text body {i} " + " ".join(f"w{j}" for j in rng.integers(0, 50, 8))
             for i in range(n_texts)]
    # 200 events over 60 distinct texts -> plenty of in-horizon dups
    pick = rng.integers(0, n_texts, 200)
    base = pd.Timestamp("2026-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [texts[i] for i in pick],
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in np.sort(rng.integers(0, 300, 200))],
        }
    )
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # pandas produces ns timestamps, which Spark's parquet reader rejects
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl["ts"].cast(pa.timestamp("us")),
    )
    src = tmp_path / "docs"
    src.mkdir()
    papq.write_table(tbl.slice(0, 100), src / "a.parquet")
    papq.write_table(tbl.slice(100), src / "b.parquet")

    docs = spark.read.parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = (
        streaming.stream_dedup_exact(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("dedup_out").toPandas()
    batch = datapipe.dedup_exact(docs).toPandas()
    # one emission per distinct hash, sets equal to the batch op's
    assert got["content_hash"].is_unique
    assert set(got["content_hash"]) == set(batch["text_hash"])
    # each emitted row is a genuine input row (first-arrival semantics)
    by_id = pdf.set_index("doc_id")
    for r in got.itertuples():
        assert by_id.loc[r.doc_id, "text"] == r.text


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketed range join vs a brute-force pandas non-equi join across
    random interval shapes: multi-bin spans, bin-boundary-aligned ends,
    point-adjacent (touching) intervals, empty intervals, several bin
    widths — row set AND overlap lengths exact, each pair exactly once."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for bin_us in (10, 100, 1000):
        n_l, n_r = 300, 280
        def mk(n):
            start = rng.integers(0, 5000, n)
            dur = rng.integers(0, 400, n)  # 0 => empty interval
            # force some ends onto exact bin boundaries
            end = start + dur
            snap = rng.random(n) < 0.3
            end[snap] = ((end[snap] // bin_us) + 1) * bin_us
            return pd.DataFrame(
                {
                    "user_id": rng.integers(0, 6, n),
                    "id": np.arange(n, dtype=np.int64),
                    "start_us": start.astype(np.int64),
                    "end_us": end.astype(np.int64),
                }
            )

        lp, rp = mk(n_l), mk(n_r)
        got = (
            streaming.interval_overlap_join(
                spark.createDataFrame(lp),
                spark.createDataFrame(rp),
                bin_us=bin_us,
            )
            .toPandas()
            .sort_values(["user_id", "l_id", "r_id"])
            .reset_index(drop=True)
        )
        m = lp.merge(rp, on="user_id", suffixes=("_l", "_r"))
        m = m[
            (m.start_us_l < m.end_us_r)
            & (m.start_us_r < m.end_us_l)
            & (m.end_us_l > m.start_us_l)
            & (m.end_us_r > m.start_us_r)
        ]
        want = pd.DataFrame(
            {
                "user_id": m.user_id,
                "l_id": m.id_l,
                "r_id": m.id_r,
                "overlap_us": np.minimum(m.end_us_l, m.end_us_r)
                - np.maximum(m.start_us_l, m.start_us_r),
            }
        ).sort_values(["user_id", "l_id", "r_id"]).reset_index(drop=True)
        assert len(got) == len(want), (bin_us, len(got), len(want))
        # exactly-once: no duplicate pairs from multi-bin co-coverage
        assert not got.duplicated(["user_id", "l_id", "r_id"]).any()
        for c in want.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (bin_us, c)


def test_interval_overlap_join_wide_spans_single_emission(spark):
    """Intervals covering MANY bins (explode factor ~50) still emit each
    overlapping pair exactly once, and fully-nested intervals report the
    inner interval's length."""
    import pandas as pd

    lp = pd.DataFrame(
        {"user_id": [1, 1], "id": [10, 11],
         "start_us": [0, 2_000], "end_us": [5_000, 2_500]}
    )
    rp = pd.DataFrame(
        {"user_id": [1, 2], "id": [20, 21],
         "start_us": [100, 100], "end_us": [4_900, 4_900]}
    )
    got = (
        streaming.interval_overlap_join(
            spark.createDataFrame(lp), spark.createDataFrame(rp), bin_us=100
        )
        .toPandas()
        .sort_values(["l_id", "r_id"])
        .reset_index(drop=True)
    )
    # user 2's interval matches nothing; user 1: both l intervals hit r=20
    assert got[["user_id", "l_id", "r_id", "overlap_us"]].values.tolist() == [
        [1, 10, 20, 4_800],
        [1, 11, 20, 500],
    ]

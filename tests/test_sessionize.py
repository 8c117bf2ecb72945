"""Gap sessionization: batch (window-function) and streaming
(applyInPandasWithState custom stateful operator) must agree."""

import datetime
import time

from pyspark.sql import functions as F


def _ev(uid, minute, eid):
    return (eid, datetime.datetime(2024, 1, 1, 10, minute, 0), uid)


def test_sessionize_batch(spark):
    from iceberg_python_spark.streaming import sessionize

    rows = [
        # user 1: two sessions (gap > 30min between minute 20 and 55+31)
        _ev(1, 0, 1),
        _ev(1, 10, 2),
        _ev(1, 20, 3),
        _ev(1, 55, 4),  # 35min gap -> new session
        # user 2: one session
        _ev(2, 5, 5),
        _ev(2, 6, 6),
    ]
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    out = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_us, r.session_end_us)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    us = lambda m: int(datetime.datetime(2024, 1, 1, 10, m, tzinfo=datetime.timezone.utc).timestamp() * 1e6)  # noqa: E731
    assert out[(1, 0)] == (3, us(0), us(20))
    assert out[(1, 1)] == (1, us(55), us(55))
    assert out[(2, 0)] == (2, us(5), us(6))


def test_sessionize_batch_ntz(spark):
    """TIMESTAMP_NTZ input (pyspark 4.1 reads naive parquet timestamps as
    NTZ by default) must produce identical epoch-µs sessions — the r04
    regression: unix_micros rejects NTZ."""
    from iceberg_python_spark.streaming import sessionize

    rows = [_ev(1, 0, 1), _ev(1, 10, 2), _ev(1, 55, 4), _ev(2, 5, 5)]
    ltz = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    ntz = spark.createDataFrame(rows, "event_id: long, ts: timestamp_ntz, user_id: long")
    key = lambda r: (r.user_id, r.session_id)  # noqa: E731
    want = {key(r): (r.n_events, r.session_start_us, r.session_end_us) for r in sessionize(ltz, gap_minutes=30).collect()}
    got = {key(r): (r.n_events, r.session_start_us, r.session_end_us) for r in sessionize(ntz, gap_minutes=30).collect()}
    assert want == got and len(want) == 3


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Feed the same events through the stateful streaming operator in
    two micro-batches; closed sessions must match the batch operator."""
    from iceberg_python_spark.streaming import sessionize, sessionize_stream

    batch1 = [_ev(1, 0, 1), _ev(1, 10, 2), _ev(1, 20, 3), _ev(2, 5, 5), _ev(2, 6, 6)]
    # batch 2: user1 re-appears after the gap; a far-future event pushes
    # the watermark past every session's timeout so all of them close
    batch2 = [_ev(1, 55, 4), (99, datetime.datetime(2024, 1, 2, 10, 0, 0), 9)]
    src = str(tmp_path / "stream_src")
    schema = "event_id: long, ts: timestamp, user_id: long"
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more empty-ish pass lets event-time timeouts fire
        spark.createDataFrame([(100, datetime.datetime(2024, 1, 3), 9)], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r.key, r.session_start_us): (r.session_end_us, r.n_events)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    full = spark.createDataFrame(batch1 + batch2[:1], schema)
    want = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in sessionize(full, gap_minutes=30).collect()
    }
    for k, v in want.items():
        assert got.get(k) == v, (k, v, got)


def test_upsert_stream_cdc_apply(spark, tmp_path):
    """Two CDC micro-batches (with an intra-batch duplicate key) merge
    into the table; final state = last-write-wins per key."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import upsert_stream

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id: long, v: string, seq: long"
    )
    cat = ips.SqliteCatalog("cdc", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.cdc_target", schema_from_spark(base.schema))
    t.append(base)

    src = str(tmp_path / "cdc_src")
    # batch: update id=2 twice (seq 2 then 3 must win), insert id=4
    batch = spark.createDataFrame(
        [(2, "b2", 2), (2, "b3", 3), (4, "d", 2)], "id: long, v: string, seq: long"
    )
    batch.write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = upsert_stream(
        stream, t, str(tmp_path / "cdc_ckpt"), join_cols=["id"], dedupe_keep_last_by="seq"
    )
    q.awaitTermination(60)
    got = {r.id: (r.v, r.seq) for r in t.refresh().scan().to_df().collect()}
    assert got == {1: ("a", 1), 2: ("b3", 3), 3: ("c", 1), 4: ("d", 2)}


def test_upsert_stream_with_deletes(spark, tmp_path):
    """Changefeed apply: one batch carrying updates, deletes, inserts,
    and a delete+reinsert conflict — deletes land as equality deletes,
    upserts merge, all in one transaction; latest change per key wins."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import upsert_stream

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0), (5, "e", 0)], "id: long, v: string, seq: long"
    )
    cat = ips.SqliteCatalog("cdc2", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.cdc_del_target", schema_from_spark(base.schema))
    t.append(base)

    cdc_schema = "id: long, v: string, seq: long, op: string"
    batch = [
        (1, "a2", 1, "U"),        # plain update
        (2, None, 1, "D"),        # delete existing key
        (4, "d", 1, "I"),         # insert new key
        (3, None, 1, "D"),        # delete...
        (3, "c2", 2, "I"),        # ...then reinsert (latest wins -> row kept)
        (5, "e2", 1, "U"),        # update...
        (5, None, 2, "D"),        # ...then delete (latest wins -> gone)
        (9, None, 1, "D"),        # delete of a key that never existed: no-op
    ]
    src = str(tmp_path / "cdc_del_src")
    spark.createDataFrame(batch, cdc_schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], cdc_schema).schema).parquet(src)
    q = upsert_stream(
        stream, t, str(tmp_path / "cdc_del_ckpt"),
        join_cols=["id"], dedupe_keep_last_by="seq", op_col="op",
    )
    q.awaitTermination(60)
    got = {r.id: r.v for r in t.refresh().scan().to_df().collect()}
    assert got == {1: "a2", 3: "c2", 4: "d"}, got


def test_upsert_stream_null_op_not_dropped(spark, tmp_path):
    """Rows with a NULL op_col must apply as upserts, not vanish
    (ADVICE r5: NULL fails both isin branches -> silent data loss)."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import upsert_stream

    base = spark.createDataFrame([(1, "a", 0)], "id: long, v: string, seq: long")
    cat = ips.SqliteCatalog("cdc3", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.cdc_null_op", schema_from_spark(base.schema))
    t.append(base)

    cdc_schema = "id: long, v: string, seq: long, op: string"
    batch = [
        (1, "a2", 1, None),  # malformed feed: missing op -> upsert, not dropped
        (2, "b", 1, "I"),
    ]
    src = str(tmp_path / "cdc_null_src")
    spark.createDataFrame(batch, cdc_schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], cdc_schema).schema).parquet(src)
    q = upsert_stream(
        stream, t, str(tmp_path / "cdc_null_ckpt"),
        join_cols=["id"], dedupe_keep_last_by="seq", op_col="op",
    )
    q.awaitTermination(60)
    got = {r.id: r.v for r in t.refresh().scan().to_df().collect()}
    assert got == {1: "a2", 2: "b"}, got


def test_append_stream_replayed_batch_skipped(spark, tmp_path):
    """Exactly-once: a foreachBatch batch_id that already committed (the
    at-least-once replay after failure recovery) must be skipped — the
    sink finds its (query-key, batch-id) marker on the branch. A NEW
    batch id still lands, and a different query's sink is unaffected."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import _last_committed_batch_id, _query_key, append_stream

    base = spark.createDataFrame([(0, "z")], "id: long, v: string")
    cat = ips.SqliteCatalog("eo", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.eo_target", schema_from_spark(base.schema))

    src = str(tmp_path / "eo_src")
    spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string").write.mode("append").parquet(src)
    ckpt = str(tmp_path / "eo_ckpt")
    stream = spark.readStream.schema(base.schema).parquet(src)
    append_stream(stream, t, ckpt).awaitTermination(60)
    t.refresh()
    assert t.scan().to_df().count() == 2
    qk = _query_key(ckpt)
    last = _last_committed_batch_id(t, qk)
    assert last is not None

    # simulate the replay: a NEW sink instance (fresh cursor, as after a
    # driver restart) receives an already-committed batch id. Drive the
    # sink contract directly — Structured Streaming wraps it, but the
    # replay behavior lives in the sink function itself.
    cursor_probe = spark.createDataFrame([(9, "dup")], "id: long, v: string")
    import iceberg_python_spark.streaming as streaming_mod

    cursor = {"last": None, "primed": False}

    def sink(batch_df, batch_id):
        fresh = t.refresh()
        if not cursor["primed"]:
            cursor["last"] = streaming_mod._last_committed_batch_id(fresh, qk)
            cursor["primed"] = True
        if cursor["last"] is not None and batch_id <= cursor["last"]:
            return
        fresh.append(batch_df, snapshot_properties={"streaming-query": qk, "streaming-batch-id": str(batch_id)})
        cursor["last"] = batch_id

    sink(cursor_probe, last)  # replay of committed batch -> skipped
    t.refresh()
    assert t.scan().to_df().count() == 2
    sink(cursor_probe, last + 1)  # genuinely new batch -> lands
    t.refresh()
    assert t.scan().to_df().count() == 3
    # other writers' snapshots between batches don't confuse the walk
    t.append(spark.createDataFrame([(10, "x")], "id: long, v: string"))
    assert _last_committed_batch_id(t.refresh(), qk) == last + 1
    # a different checkpoint = a different query: starts from scratch
    assert _last_committed_batch_id(t, _query_key(str(tmp_path / "other_ckpt"))) is None


def test_upsert_stream_marker_on_all_snapshots(spark, tmp_path):
    """The delete+upsert CDC transaction tags BOTH its snapshots with the
    batch marker (default_snapshot_properties), so the replay walk finds
    it no matter which snapshot is branch head."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import _last_committed_batch_id, _query_key, upsert_stream

    base = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "id: long, v: string, seq: long")
    cat = ips.SqliteCatalog("eo2", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.eo2_target", schema_from_spark(base.schema))
    t.append(base)

    src = str(tmp_path / "eo2_src")
    cdc_schema = "id: long, v: string, seq: long, op: string"
    spark.createDataFrame([(1, None, 2, "D"), (3, "c", 2, "U")], cdc_schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.createDataFrame([], cdc_schema).schema
    ).parquet(src)
    ckpt = str(tmp_path / "eo2_ckpt")
    q = upsert_stream(stream, t, ckpt, join_cols=["id"], op_col="op")
    q.awaitTermination(60)
    t.refresh()
    got = {r.id for r in t.scan().to_df().collect()}
    assert got == {2, 3}
    qk = _query_key(ckpt)
    assert _last_committed_batch_id(t, qk) == 0
    # every snapshot of the transaction carries the marker
    tagged = [s for s in t.metadata.snapshots if s.summary.get("streaming-query") == qk]
    assert len(tagged) >= 1
    for s in tagged:
        assert s.summary["streaming-batch-id"] == "0"


def test_incremental_source_bounded_polling(spark, tmp_path):
    """max_snapshots rate-limits each poll to N snapshots of history;
    repeated polls walk to the head, and the union over bounded polls
    equals one unbounded poll."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.streaming import changelog_source, incremental_source

    cat = ips.SqliteCatalog("bp", str(tmp_path / "wh"), spark)
    df0 = spark.range(0, 10).toDF("id")
    t = cat.create_table("db.bp_t", df0.schema)
    cursor = None
    t.append(df0)
    start = t.refresh().current_snapshot().snapshot_id
    for lo in (10, 20, 30):
        t.append(spark.range(lo, lo + 10).toDF("id"))
    # bounded: three polls of one snapshot each
    seen = []
    cur = start
    for _ in range(3):
        df, cur2 = incremental_source(t, cursor=cur, max_snapshots=1)
        rows = sorted(r.id for r in df.collect())
        assert len(rows) == 10  # exactly one append per poll
        seen += rows
        assert cur2 != cur
        cur = cur2
    # caught up: next poll is empty and the cursor stops moving
    df, cur3 = incremental_source(t, cursor=cur, max_snapshots=1)
    assert df.count() == 0 and cur3 == cur
    # equivalence with the unbounded poll
    df_all, _ = incremental_source(t, cursor=start)
    assert sorted(r.id for r in df_all.collect()) == seen
    # changelog source honors the same bound
    ch, ccur = changelog_source(t, cursor=start, max_snapshots=2)
    assert ch.count() == 20
    assert ccur != t.current_snapshot().snapshot_id


def test_dedup_stream_exact_matches_batch(spark, tmp_path):
    """Content-digest streaming dedup across two micro-batches keeps
    exactly the batch-dedup survivor set (first occurrence per digest)."""
    from iceberg_python_spark.streaming import dedup_stream_exact

    schema = "doc_id: long, text: string"
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema  # in-batch dup
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    out = dedup_stream_exact(stream, key_cols=None, text_col="text")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    def survivors():
        rows = spark.sql("SELECT doc_id, text FROM dd_out").collect()
        return sorted((r.doc_id, r.text) for r in rows)

    def ok(rows):
        # one survivor per content; in-batch duplicate picks an ARBITRARY
        # representative (dropDuplicates semantics), cross-batch dups must
        # lose to batch 1's row
        by_text = {}
        for d, t in rows:
            if t in by_text:
                return False
            by_text[t] = d
        return (
            set(by_text) == {"alpha", "beta", "gamma"}
            and by_text["alpha"] in (1, 3)  # either in-batch dup may survive
            and by_text["beta"] == 2        # batch-1 row beats batch-2 dup
            and by_text["gamma"] == 5
        )

    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.sql("SELECT count(*) c FROM dd_out").first().c < 2:
            time.sleep(0.5)
        # batch 2: one cross-batch dup ("beta") + one new doc
        spark.createDataFrame([(4, "beta"), (5, "gamma")], schema).write.mode("append").parquet(src)
        rows = []
        while time.time() < deadline:
            rows = survivors()
            if ok(rows):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert ok(rows), rows


def test_append_stream_dedup_idempotent_ingestion(spark, tmp_path):
    """Dedup sink: in-batch dups collapse, keys already in the table are
    skipped, fresh keys land — one row per key after both batches."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import append_stream_dedup

    schema = "id: long, v: string"
    base = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    cat = ips.SqliteCatalog("ddsink", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.dd_target", schema_from_spark(base.schema))
    t.append(base)

    src = str(tmp_path / "sink_src")
    # in-batch dup (3), table dup (2), fresh (3, 4)
    spark.createDataFrame([(2, "b_again"), (3, "c"), (3, "c_dup"), (4, "d")], schema).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = append_stream_dedup(stream, t, str(tmp_path / "sink_ckpt"), key_cols=["id"])
    q.awaitTermination(60)

    got = sorted(r.id for r in t.refresh().scan().to_df().collect())
    assert got == [1, 2, 3, 4]
    # value for key 2 is the ORIGINAL row (dedup skips, not overwrites)
    vals = {r.id: r.v for r in t.scan().to_df().collect()}
    assert vals[2] == "b"

    # replay-equivalent second run over the same source: no new rows
    q2 = append_stream_dedup(stream, t, str(tmp_path / "sink_ckpt2"), key_cols=["id"])
    q2.awaitTermination(60)
    assert t.refresh().scan().to_df().count() == 4


def test_append_stream_neardup_matches_batch_composition(spark, tmp_path):
    """Streaming near-dup ingestion (VERDICT r10 #6): two micro-batches
    through append_stream_neardup must land exactly the docs the BATCH
    composition (lsh_index + dedup_against_lsh_index applied
    sequentially) keeps, the persisted index must cover precisely the
    survivors, and a replay over a fresh checkpoint appends nothing."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.operators.dedup import dedup_against_lsh_index, lsh_index
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import append_stream_neardup

    schema = "doc_id: long, text: string"
    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again today",
        2: "completely different content about spark shuffles and partitions here",
        3: "the quick brown fox jumps over the lazy dog again and again today",  # dup of 1
        4: "a third unique document discussing iceberg snapshots and manifests",
        5: "completely different content about spark shuffles and partitions here",  # dup of 2
        6: "yet another novel document on jpeg huffman tables and idct math",
    }
    b1 = spark.createDataFrame([(i, texts[i]) for i in (1, 2)], schema)
    b2 = spark.createDataFrame([(i, texts[i]) for i in (3, 4, 5, 6)], schema)
    cat = ips.SqliteCatalog("ndsink", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.nd_target", schema_from_spark(b1.schema))
    idx = cat.create_table(
        "db.nd_index",
        schema_from_spark(spark.createDataFrame([], "doc_id: long, band: int, bucket: bigint").schema),
    )

    # batches arrive as two parquet files -> two availableNow micro-batches
    src = str(tmp_path / "nd_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    q = append_stream_neardup(
        spark.readStream.schema(b1.schema).parquet(src).where("doc_id <= 2"),
        t, idx, str(tmp_path / "nd_ckpt1"), "doc_id", "text",
    )
    q.awaitTermination(60)
    b2.coalesce(1).write.mode("append").parquet(src)
    q = append_stream_neardup(
        spark.readStream.schema(b1.schema).parquet(src),
        t, idx, str(tmp_path / "nd_ckpt2"), "doc_id", "text",
    )
    q.awaitTermination(60)

    got = sorted(r.doc_id for r in t.refresh().scan().to_df().collect())
    # batch composition: 1,2 land; 3 and 5 are exact re-crawls (recall 1
    # against the persisted index), 4 and 6 are novel
    assert got == [1, 2, 4, 6]
    # index covers exactly the survivors
    idx_ids = {r.doc_id for r in idx.refresh().scan(selected_fields=("doc_id",)).to_df().collect()}
    assert idx_ids == {1, 2, 4, 6}
    # equivalence against the direct batch composition
    all_docs = spark.createDataFrame([(i, texts[i]) for i in sorted(texts)], schema)
    i1 = lsh_index(all_docs.where("doc_id <= 2"), "doc_id", "text")
    parts = dedup_against_lsh_index(all_docs.where("doc_id > 2"), i1, "doc_id", "text")
    batch_keep = {1, 2} | {r.doc_id for r in parts["survivors"].collect()}
    assert set(got) == batch_keep
    # replay of the full source on a fresh checkpoint: every doc is
    # either an exact re-crawl (flagged) or already committed — no growth
    q = append_stream_neardup(
        spark.readStream.schema(b1.schema).parquet(src),
        t, idx, str(tmp_path / "nd_ckpt3"), "doc_id", "text",
    )
    q.awaitTermination(60)
    assert t.refresh().scan().to_df().count() == 4
    assert idx.refresh().scan().to_df().where("doc_id not in (1,2,4,6)").count() == 0


def test_time_rollup(spark):
    """Multi-resolution rollup from one pass: bucket edges are integer
    floor-divisions of epoch time, counts per width sum to the input,
    and finer buckets nest inside coarser ones."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import time_rollup

    rows = [
        (1, "a", "2024-01-01 00:10:00", 1.0),
        (2, "a", "2024-01-01 00:50:00", 2.0),
        (3, "a", "2024-01-01 01:10:00", 4.0),
        (4, "b", "2024-01-01 23:59:59", 8.0),
    ]
    df = spark.createDataFrame(rows, "id: long, k: string, ts: string, v: double").select(
        "id", "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = time_rollup(df, "ts", ["k"], "v", [3600, 86400])
    rows_out = {(r.width_s, str(r.bucket_start), r.k): (r.n_events, r.sum_value) for r in out.collect()}
    assert rows_out[(3600, "2024-01-01 00:00:00", "a")] == (2, 3.0)
    assert rows_out[(3600, "2024-01-01 01:00:00", "a")] == (1, 4.0)
    assert rows_out[(86400, "2024-01-01 00:00:00", "a")] == (3, 7.0)
    assert rows_out[(86400, "2024-01-01 00:00:00", "b")] == (1, 8.0)
    # per-width totals each equal the input row count
    per_width = {r.width_s: r.n for r in out.groupBy("width_s").agg(F.sum("n_events").alias("n")).collect()}
    assert per_width == {3600: 4, 86400: 4}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="widths_seconds"):
        time_rollup(df, "ts", ["k"], "v", [])


def test_gapfill_locf_interp_and_edges(spark):
    """Dense grid over the observed span; LOCF carries the last
    observation, interp is exactly linear between neighbors, both NULL
    outside their defined ranges; observed buckets pass through."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import gapfill

    rows = [
        ("a", "2024-01-01 00:10:00", 10.0),
        ("a", "2024-01-01 00:20:00", 20.0),
        ("a", "2024-01-01 03:05:00", 40.0),
        ("b", "2024-01-01 01:30:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r["k"], str(r["bucket_start"])): r
        for r in gapfill(df, "ts", ["k"], "v", 3600).collect()
    }
    assert len(out) == 8  # 2 keys x 4 hourly buckets of the global span
    a1 = out[("a", "2024-01-01 01:00:00")]
    assert a1["n_events"] == 0 and a1["filled"] and a1["sum_value"] is None
    assert a1["value_locf"] == 30.0
    assert abs(a1["value_interp"] - (30.0 + 10.0 / 3)) < 1e-9
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert a0["n_events"] == 2 and not a0["filled"] and a0["sum_value"] == 30.0
    assert a0["value_interp"] == 30.0  # observed buckets pass through
    b0 = out[("b", "2024-01-01 00:00:00")]
    assert b0["value_locf"] is None and b0["value_interp"] is None  # before first obs
    b3 = out[("b", "2024-01-01 03:00:00")]
    assert b3["value_locf"] == 5.0 and b3["value_interp"] is None  # after last obs
    # empty input: no span, no grid, no crash
    assert gapfill(df.where("k = 'zzz'"), "ts", ["k"], "v", 3600).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="width_seconds"):
        gapfill(df, "ts", ["k"], "v", 0)
    with _pytest.raises(ValueError, match="unknown fill"):
        gapfill(df, "ts", ["k"], "v", 3600, fill=("locf", "spline")).collect()
    # unknown fill validates BEFORE the empty-input early return too
    with _pytest.raises(ValueError, match="unknown fill"):
        gapfill(df.where("k = 'zzz'"), "ts", ["k"], "v", 3600, fill=("bogus",))


def test_gapfill_wide_span_keeps_axis_unbroadcast(spark):
    """ADVICE r13: past ~1e6 buckets the generated axis must NOT be
    broadcast (a year at 1s is ~3e7 rows through the driver); the
    small distinct-keys side broadcasts instead, results identical."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import gapfill

    rows = [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-02-01 00:00:00", 2.0)]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = gapfill(df, "ts", ["k"], "v", 1, fill=())  # 31 days at 1s > 1e6 buckets
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Range (bucket axis) side must not sit under a BroadcastExchange
    import re as _re

    for m in _re.finditer(r"BroadcastExchange[\s\S]{0,400}?Range \(", plan):
        raise AssertionError("bucket axis was broadcast on a wide span")
    n = out.count()
    assert n == 31 * 24 * 3600 + 1
    filled = out.where("n_events = 0").count()
    assert filled == n - 2


def test_funnel_greedy_anchor_semantics(spark):
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import funnel

    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:10:00", "click"),
        (1, "2024-01-01 00:20:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 09:00:00", "click"),  # outside the 1h window
        (3, "2024-01-01 00:00:00", "click"),  # wrong order: not a chain start
        (3, "2024-01-01 00:05:00", "view"),  # anchors here
        (3, "2024-01-01 00:06:00", "click"),
        (4, "2024-01-01 00:00:00", "error"),  # no step events -> absent
        # greedy anchor: the EARLIEST view anchors even when a later
        # view would have completed the funnel
        (5, "2024-01-01 00:00:00", "view"),
        (5, "2024-01-01 05:00:00", "view"),
        (5, "2024-01-01 05:10:00", "click"),
    ]
    df = spark.createDataFrame(rows, "u long, ts string, et string").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "et"
    )
    out = {
        r["user"]: r
        for r in funnel(df, "ts", "u", "et", ["view", "click", "purchase"], 3600).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["level"] == 3 and out[1]["step3_us"] is not None
    assert out[2]["level"] == 1 and out[2]["step2_us"] is None
    assert out[3]["level"] == 2  # pre-anchor click ignored, post-anchor counts
    assert out[5]["level"] == 1  # documented greedy-anchor semantics
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least 2"):
        funnel(df, "ts", "u", "et", ["view"], 3600)


def test_transition_matrix_counts_and_micro_probs(spark):
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import transition_matrix

    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:01:00", "b"),
        (1, "2024-01-01 00:02:00", "a"),
        (1, "2024-01-01 00:03:00", "c"),
        (2, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 00:01:00", "b"),
        (3, "2024-01-01 00:00:00", "z"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "u long, ts string, s string").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "s"
    )
    out = {(r["from_state"], r["to_state"]): r for r in transition_matrix(df, "ts", "u", "s").collect()}
    assert out[("a", "b")]["n"] == 2 and out[("b", "a")]["n"] == 1
    assert out[("a", "c")]["n"] == 1 and ("z", None) not in out
    # from 'a': 2/3 to b, 1/3 to c — floored micro units
    assert out[("a", "b")]["p_micro"] == 666666
    assert out[("a", "c")]["p_micro"] == 333333
    # user 2's trailing 'b' has no successor, so b->a is b's only transition
    assert out[("b", "a")]["p_micro"] == 1000000


def test_retention_cohorts(spark):
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import retention_cohorts

    day = 86400
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"), (1, "2024-01-04 10:00:00"),
        (2, "2024-01-01 23:00:00"),
        (3, "2024-01-02 00:00:00"), (3, "2024-01-04 01:00:00"),
    ]
    df = spark.createDataFrame(rows, "u long, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (str(r["cohort_start"]), r["period_index"]): r["n_users"]
        for r in retention_cohorts(df, "ts", "u", day).collect()
    }
    assert out[("2024-01-01 00:00:00", 0)] == 2  # users 1, 2
    assert out[("2024-01-01 00:00:00", 1)] == 1  # user 1 back next day
    assert out[("2024-01-01 00:00:00", 3)] == 1  # user 1 on day 4
    assert out[("2024-01-02 00:00:00", 0)] == 1  # user 3's own cohort
    assert out[("2024-01-02 00:00:00", 2)] == 1  # user 3 on day 4
    assert ("2024-01-01 00:00:00", 2) not in out  # nobody from c1 on day 3


def test_interval_coverage_island_merge(spark):
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import interval_coverage

    rows = [
        ("u", 0, 10), ("u", 5, 20), ("u", 20, 25),  # one island [0,25] (touching merges)
        ("u", 30, 40),                               # second island
        ("u", 50, 45),                               # inverted: dropped
        ("v", 100, 200),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {r["k"]: r for r in interval_coverage(df, ["k"], "s", "e").collect()}
    assert out["u"]["covered"] == 35 and out["u"]["n_islands"] == 2
    assert out["u"]["n_intervals"] == 4
    assert out["v"]["covered"] == 100 and out["v"]["n_islands"] == 1


def test_interval_coverage_timestamp_columns_use_micros(spark):
    """Timestamp start/end columns must not silently truncate to
    seconds — sub-second intervals survive."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import interval_coverage

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00.100", "2024-01-01 00:00:00.350"),
         ("u", "2024-01-01 00:00:00.300", "2024-01-01 00:00:00.500")],
        "k string, s string, e string",
    ).select("k", F.col("s").cast("timestamp").alias("s"), F.col("e").cast("timestamp").alias("e"))
    (r,) = interval_coverage(df, ["k"], "s", "e").collect()
    assert r["covered"] == 400_000 and r["n_islands"] == 1  # micros, merged


def test_funnel_stream_matches_batch(spark, tmp_path):
    """Feed funnel events in two event-time-ordered micro-batches; the
    stream's emitted rows (completion + watermark freeze) must equal
    the batch funnel over the union."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import funnel, funnel_stream

    def ev(u, minute, et, eid):
        base = datetime.datetime(2024, 1, 1, 10, 0, 0)
        return (eid, base + datetime.timedelta(minutes=minute), u, et)

    batch1 = [
        ev(1, 0, "view", 1), ev(1, 5, "click", 2),          # completes in b2
        ev(2, 0, "view", 3),                                 # stalls at level 1
        ev(3, 2, "click", 4),                                # never anchors: level 0
    ]
    batch2 = [
        ev(1, 10, "purchase", 5),                            # completes user 1
        ev(2, 500, "click", 6),                              # outside 1h window
        # far-future event pushes the watermark past every freeze point
        ev(9, 60 * 50, "view", 7),
    ]
    schema = "event_id: long, ts: timestamp, user_id: long, event_type: string"
    src = str(tmp_path / "funnel_src")
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    q = (
        funnel_stream(stream, "ts", "user_id", "event_type",
                      ["view", "click", "purchase"], 3600, watermark="0 seconds")
        .writeStream.format("memory").queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more far-future append lets event-time timeouts fire
        spark.createDataFrame(
            [ev(9, 60 * 60 * 5, "view", 8)], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            r["user"]: (r["level"], (r["step1_us"], r["step2_us"], r["step3_us"]))
            for r in spark.sql("SELECT * FROM funnel_out").collect()
            if r["user"] in (1, 2, 3)
        }
    finally:
        q.stop()
    full = spark.createDataFrame(batch1 + batch2[:2], schema)
    want = {
        r["user"]: (r["level"], (r["step1_us"], r["step2_us"], r["step3_us"]))
        for r in funnel(full, "ts", "user_id", "event_type",
                        ["view", "click", "purchase"], 3600).collect()
    }
    assert got[1][0] == 3 and got[1][1] == want[1][1]
    assert got[2][0] == 1 and got[2][1][0] == want[2][1][0] and got[2][1][1] is None
    assert got[3][0] == 0


def test_funnel_stream_single_bucket_state(spark, tmp_path):
    """funnel_stream keys its state by a user-hash BUCKET (one pandas
    exchange per bucket per micro-batch, not one per user); with
    buckets=1 every user shares one state dict and the per-user
    emission rows must still match the batch funnel exactly —
    completion emits immediately, freezes emit on the watermark sweep,
    and a swept user's reappearance starts a fresh epoch."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import funnel, funnel_stream

    def ev(u, minute, et, eid):
        base = datetime.datetime(2024, 3, 1, 8, 0, 0)
        return (eid, base + datetime.timedelta(minutes=minute), u, et)

    batch1 = [
        ev(1, 0, "view", 1), ev(1, 1, "click", 2), ev(1, 2, "purchase", 3),  # completes in b1
        ev(2, 0, "view", 4), ev(2, 3, "click", 5),                            # stalls at level 2
        ev(3, 1, "click", 6),                                                 # never anchors
    ]
    batch2 = [ev(9, 60 * 50, "view", 7)]   # watermark push: freezes for 2 and 3 fire
    batch3 = [ev(2, 60 * 55, "view", 8)]   # user 2 reappears AFTER its sweep: new epoch
    batch4 = [ev(9, 60 * 60 * 9, "view", 9)]  # final push: epoch-2 freeze fires
    schema = "event_id: long, ts: timestamp, user_id: long, event_type: string"
    src = str(tmp_path / "funnel1b_src")
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src)
    q = (
        funnel_stream(stream, "ts", "user_id", "event_type",
                      ["view", "click", "purchase"], 3600, watermark="0 seconds", buckets=1)
        .writeStream.format("memory").queryName("funnel1b_out")
        .option("checkpointLocation", str(tmp_path / "f1bckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for b in (batch2, batch3, batch4):
            spark.createDataFrame(b, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel1b_out").collect()
    finally:
        q.stop()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append((r["level"], r["step1_us"]))
    want = {
        r["user"]: (r["level"], r["step1_us"])
        for r in funnel(spark.createDataFrame(batch1, schema), "ts", "user_id",
                        "event_type", ["view", "click", "purchase"], 3600).collect()
    }
    assert by_user[1] == [want[1]] and want[1][0] == 3     # immediate completion
    assert by_user[2][0] == want[2] and want[2][0] == 2    # frozen at level 2
    assert by_user[3] == [want[3]] and want[3][0] == 0     # never anchored
    # epoch 2: user 2's reappearance after the sweep re-evaluates from scratch
    assert len(by_user[2]) == 2 and by_user[2][1][0] == 1


def test_heavy_hitters_stream_guarantees(spark, tmp_path):
    """Two micro-batches fold into per-group MG state; every emitted
    snapshot carries the batch operator's guarantees against the exact
    counts of the data seen so far."""
    from pyspark.sql import functions as F

    from iceberg_python_spark.streaming import heavy_hitters_stream

    def mk(rows):
        return spark.createDataFrame(rows, "g: string, v: string")

    b1 = [("a", "hot")] * 20 + [("a", f"x{i}") for i in range(10)] + [("b", "bh")] * 5
    b2 = [("a", "hot")] * 15 + [("a", f"y{i}") for i in range(10)] + [("b", "bh")] * 3
    src = str(tmp_path / "hh_src")
    mk(b1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(mk([]).schema).parquet(src)
    q = (
        heavy_hitters_stream(stream, "v", ["g"], m=4)
        .writeStream.format("memory").queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        mk(b2).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hh_out").collect()
    finally:
        q.stop()
    # latest snapshot per group = rows with the max n for that group
    from collections import Counter, defaultdict

    latest_n = defaultdict(int)
    for r in rows:
        latest_n[r["g"]] = max(latest_n[r["g"]], r["n"])
    snap = defaultdict(dict)
    ded = {}
    for r in rows:
        if r["n"] == latest_n[r["g"]]:
            ded[r["g"]] = r["deducted"]
            if r["item"] is not None:
                snap[r["g"]][r["item"]] = r["est"]
    true = defaultdict(Counter)
    for g, v in b1 + b2:
        true[g][v] += 1
    for g in true:
        n = sum(true[g].values())
        assert latest_n[g] == n
        assert ded[g] * (4 + 1) <= n
        for item, est in snap[g].items():
            assert est <= true[g][item] <= est + ded[g]
        for item, cnt in true[g].items():
            if cnt > ded[g]:
                assert item in snap[g], (g, item)
    assert "hot" in snap["a"] and snap["a"]["hot"] >= 35 - ded["a"]

"""Streaming windowed aggregation + custom stateful operator, driven
end-to-end with the memory sink (availableNow processes all pending
rows synchronously)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.schema.registry import get_registry
from spark_streaming_postgres_lab2_spark.sources.csv_stream import csv_stream
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.operators.enrich import transform_and_enrich
from spark_streaming_postgres_lab2_spark.operators.validate import validate
from spark_streaming_postgres_lab2_spark.streaming.stateful import user_profile_stream
from spark_streaming_postgres_lab2_spark.streaming.windows import (
    session_window_rollup,
    windowed_event_counts,
)
from conftest import round_half_up

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    input_dir = tmp_path_factory.mktemp("win_in")
    gen = EventGenerator(seed=5, anomaly_rate=0.0, now=NOW)
    gen.write_csv(gen.generate_batch(200), str(input_dir), "a.csv")
    raw = csv_stream(spark, str(input_dir), get_registry().get_schema(), 10)
    return transform_and_enrich(validate(raw)).filter(F.col("is_valid"))


def run_to_memory(stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_windowed_counts_complete_mode(spark, event_stream):
    name = run_to_memory(
        windowed_event_counts(event_stream), "win_counts", "complete"
    )
    out = spark.sql(f"SELECT * FROM {name}")
    rows = out.collect()
    assert sum(r["event_count"] for r in rows) == 200
    for r in rows:
        assert r["window_start"] < r["window_end"]
        assert r["approx_unique_users"] >= 1


def test_session_window_rollup(spark, event_stream):
    name = run_to_memory(
        session_window_rollup(event_stream), "sess_win", "complete"
    )
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sum(r["event_count"] for r in rows) == 200
    # all events are generated inside one 30-min gap -> one session per user
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))


def test_stateful_user_profiles(spark, event_stream):
    name = run_to_memory(user_profile_stream(event_stream), "profiles", "update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sum(r["total_events"] for r in rows) == 200
    for r in rows:
        assert 1 <= r["distinct_event_types"] <= 6
        assert r["total_spent"] >= 0.0


def _mk_event(uid: int, ts: datetime, etype: str = "view") -> dict:
    import uuid

    return {
        "event_id": str(uuid.uuid4()),
        "user_id": uid,
        "session_id": f"s{uid}",
        "event_type": etype,
        "product_id": 1,
        "category": "electronics",
        "price": 0.0,
        "quantity": 0,
        "user_segment": "new",
        "search_query": "",
        "event_time": ts.strftime("%Y-%m-%dT%H:%M:%S"),
        "source_system": "web",
    }


def test_session_window_append_mode_with_watermark(spark, tmp_path):
    """VERDICT r2 item 5: drive session_window through a LIVE streaming
    query in APPEND mode.  Append emits a session only after the
    watermark (max event time - 10 min) passes session_end + nothing
    can extend it -- so sessions from batch 1 appear once later batches
    advance the watermark, and the newest session stays unemitted."""
    import os
    import time as _time
    from datetime import timedelta

    t0 = datetime(2024, 3, 15, 12, 0, 0)  # naive; session tz pinned UTC
    in_dir = tmp_path / "in"
    gen = EventGenerator(seed=1, anomaly_rate=0.0, now=NOW)
    batches = [
        # batch 1: user 1 has a 3-event session, user 2 a 1-event session
        (
            "a.csv",
            [
                _mk_event(1, t0),
                _mk_event(1, t0 + timedelta(minutes=2)),
                _mk_event(1, t0 + timedelta(minutes=4)),
                _mk_event(2, t0 + timedelta(minutes=1)),
            ],
        ),
        # batch 2: advances watermark to t0+2h-10min > both session ends
        ("b.csv", [_mk_event(3, t0 + timedelta(hours=2))]),
        # batch 3: runs WITH that watermark -> emits batch-1 sessions;
        # its own session (t0+4h) can never be emitted in this run
        ("c.csv", [_mk_event(4, t0 + timedelta(hours=4))]),
    ]
    for i, (fname, events) in enumerate(batches):
        path = gen.write_csv(events, str(in_dir), fname)
        os.utime(path, (1700000000 + i * 100, 1700000000 + i * 100))
        _time.sleep(0.05)

    raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
    enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
    q = (
        session_window_rollup(enriched)
        .writeStream.format("memory")
        .queryName("sess_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM sess_append").collect()}

    assert 1 in rows and 2 in rows, f"batch-1 sessions not emitted: {rows}"
    assert 4 not in rows, "session newer than the watermark must not be emitted"
    u1 = rows[1]
    assert u1["event_count"] == 3
    assert u1["session_start"] == t0
    # session_window end = last event + gap (30 min)
    assert u1["session_end"] == t0 + timedelta(minutes=4 + 30)
    assert rows[2]["event_count"] == 1


def test_streaming_zscore_anomaly_state_across_batches(spark, tmp_path):
    """The streaming anomaly twin flags a spike using TRAILING STATE
    built in an earlier micro-batch: batch 1 establishes 24 constant
    minutes, batch 2 delivers the spike minute + a normal minute.
    Flags/z match the batch operator's semantics (integer predicate,
    zero-variance -> NULL z, post-spike exact z)."""
    import os
    from datetime import timedelta

    from spark_streaming_postgres_lab2_spark.schema.registry import get_registry
    from spark_streaming_postgres_lab2_spark.sources.csv_stream import csv_stream
    from spark_streaming_postgres_lab2_spark.operators.validate import validate
    from spark_streaming_postgres_lab2_spark.operators.enrich import (
        transform_and_enrich,
    )
    from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        zscore_anomaly_stream,
    )

    t0 = NOW.replace(tzinfo=None)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)

    def mk(minute, i):
        ts = t0 + timedelta(minutes=minute)
        e = _mk_event(uid=i, ts=ts)
        e["event_id"] = f"m{minute}_{i}"
        return e

    gen = EventGenerator(seed=1, anomaly_rate=0.0, now=NOW)
    batch1 = [mk(m, i) for m in range(24) for i in range(5)]
    batch2 = [mk(24, i) for i in range(20)] + [mk(25, i) for i in range(5)]
    gen.write_csv(batch1, str(in_dir), "a_batch1.csv")
    gen.write_csv(batch2, str(in_dir), "b_batch2.csv")
    # pin batch order (mtime ties at ms granularity)
    os.utime(in_dir / "a_batch1.csv", (1, 1))
    os.utime(in_dir / "b_batch2.csv", (2, 2))

    raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
    enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
    out = zscore_anomaly_stream(enriched, bucket_seconds=60)
    name = run_to_memory(out, "zsanom", "update")
    rows = {r["bucket_id"]: r for r in spark.sql(
        f"SELECT * FROM {name} WHERE event_type = 'view'").collect()}

    base = min(rows)
    warm = rows[base + 23]
    assert warm.is_anomaly is None          # still in warmup
    spike = rows[base + 24]
    assert (spike.cnt, spike.is_anomaly, spike.z) == (20, 1, None)  # zero-var
    after = rows[base + 25]
    assert (after.cnt, after.is_anomaly) == (5, 0)
    assert after.z == round_half_up(-15 / 5175 ** 0.5, 4)  # same exact z as batch op


def test_trending_stream_decays_across_batches(spark, tmp_path):
    """Decayed trending: a type that was hot in batch 1 but silent in
    batch 2 keeps only its decayed residue... and since silent keys get
    no batch-2 invocation, its batch-1 score simply stands while the
    newly hot type overtakes it."""
    import os
    from datetime import timedelta

    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        TREND_DECAY,
        trending_stream,
    )

    t0 = NOW.replace(tzinfo=None)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)

    def mk(etype, i):
        e = _mk_event(uid=i, ts=t0 + timedelta(minutes=i), etype=etype)
        e["event_id"] = f"{etype}_{i}"
        return e

    gen = EventGenerator(seed=2, anomaly_rate=0.0, now=NOW)
    # batch 1: view hot (10), search warm (4); batch 2: search hot (10),
    # view present (2).  (search, not purchase/click: a zero-price
    # purchase fails the validation chain and click is not in the
    # reference event vocabulary)
    gen.write_csv([mk("view", i) for i in range(10)]
                  + [mk("search", 100 + i) for i in range(4)], str(in_dir), "a.csv")
    gen.write_csv([mk("search", 200 + i) for i in range(10)]
                  + [mk("view", 300 + i) for i in range(2)], str(in_dir), "b.csv")
    # FileStreamSource orders by mtime at ms granularity -- two quick
    # writes can tie; pin the intended batch order explicitly
    os.utime(in_dir / "a.csv", (1, 1))
    os.utime(in_dir / "b.csv", (2, 2))

    raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
    enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
    name = run_to_memory(
        trending_stream(enriched, idle_timeout_ms=None), "trending", "update"
    )
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    final = {}
    for r in rows:  # update mode: keep the latest emission per key
        if r.event_type not in final or r.batches > final[r.event_type].batches:
            final[r.event_type] = r

    v, p = final["view"], final["search"]
    assert (v.batches, p.batches) == (2, 2)
    assert v.score == 10 * TREND_DECAY + 2       # decayed + fresh
    assert p.score == 4 * TREND_DECAY + 10
    assert p.score > v.score                     # the newly hot type leads


def test_trending_state_survives_query_restart(spark, tmp_path):
    """applyInPandasWithState state must come back from the CHECKPOINT
    on a fresh query start: run batch 1, stop, add a file, start a NEW
    query on the same checkpoint -- the batch-2 emission must continue
    the decay recurrence (batches == 2), not restart from zero."""
    import os
    from datetime import timedelta

    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        TREND_DECAY,
        trending_stream,
    )

    t0 = NOW.replace(tzinfo=None)
    in_dir, ckpt, out_dir = tmp_path / "in", tmp_path / "ckpt", tmp_path / "out"
    os.makedirs(in_dir)

    def mk(i):
        e = _mk_event(uid=i, ts=t0 + timedelta(minutes=i), etype="view")
        e["event_id"] = f"r{i}"
        return e

    gen = EventGenerator(seed=3, anomaly_rate=0.0, now=NOW)
    gen.write_csv([mk(i) for i in range(8)], str(in_dir), "a.csv")

    def start():
        raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
        enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
        # update-mode stateful output cannot append to a file sink
        # directly -- route through foreachBatch like the production
        # BatchRouter does
        return (
            trending_stream(enriched, idle_timeout_ms=None)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(str(out_dir))
            )
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    q1.awaitTermination(120)
    gen.write_csv([mk(100 + i) for i in range(4)], str(in_dir), "b.csv")
    q2 = start()  # FRESH query object, same checkpoint
    q2.awaitTermination(120)

    rows = spark.read.parquet(str(out_dir)).collect()
    views = [r for r in rows if r.event_type == "view"]
    # EXACTLY two emissions: a replay-from-scratch regression would
    # leave three (q1's batch plus q2 re-reading both files), which
    # the dict below would silently collapse
    assert len(views) == 2
    by_batch = {r.batches: r for r in views}
    assert set(by_batch) == {1, 2}
    assert by_batch[1].score == 8.0
    # restart continued the recurrence from checkpointed state
    assert by_batch[2].score == 8.0 * TREND_DECAY + 4


def test_trending_idle_key_evicted_with_tombstone(spark, tmp_path):
    """With a short idle timeout, a key that goes silent is evicted:
    a zero-score tombstone row is emitted and its state is removed
    (re-appearance starts from scratch)."""
    import os
    from datetime import timedelta

    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        trending_stream,
    )

    t0 = NOW.replace(tzinfo=None)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)

    def mk(etype, i):
        e = _mk_event(uid=i, ts=t0 + timedelta(minutes=i), etype=etype)
        e["event_id"] = f"e{etype}_{i}"
        return e

    gen = EventGenerator(seed=4, anomaly_rate=0.0, now=NOW)
    # batch 1: view active; batch 2: only search active -> view idles
    # past the 1 ms timeout and must be evicted during the run
    gen.write_csv([mk("view", i) for i in range(6)], str(in_dir), "a.csv")
    gen.write_csv([mk("search", 100 + i) for i in range(3)], str(in_dir), "b.csv")
    os.utime(in_dir / "a.csv", (1, 1))
    os.utime(in_dir / "b.csv", (2, 2))

    raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
    enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
    name = run_to_memory(
        trending_stream(enriched, idle_timeout_ms=1), "trend_evict", "update"
    )
    rows = spark.sql(f"SELECT * FROM {name} WHERE event_type = 'view'").collect()
    assert any(r.score == 6.0 for r in rows)   # the active emission
    assert any(r.score == 0.0 for r in rows)   # the eviction tombstone


def test_trending_topk_sink_ranks_globally(spark, tmp_path):
    """The foreachBatch top-k sink folds update-mode emissions into a
    running table and ranks ACROSS keys -- the cross-key concern the
    per-key stateful operator cannot host.  Batch 1 makes view the
    leader; batch 2's search surge overtakes it while view's silent
    score stands (no decay without an invocation)."""
    import os
    from datetime import timedelta

    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        TREND_DECAY,
        trending_stream,
    )
    from spark_streaming_postgres_lab2_spark.streaming.topk import (
        TrendingTopKSink,
    )

    t0 = NOW.replace(tzinfo=None)
    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    os.makedirs(in_dir)

    def mk(etype, i):
        e = _mk_event(uid=i, ts=t0 + timedelta(minutes=i), etype=etype)
        e["event_id"] = f"k{etype}_{i}"
        return e

    gen = EventGenerator(seed=5, anomaly_rate=0.0, now=NOW)
    gen.write_csv([mk("view", i) for i in range(10)]
                  + [mk("search", 100 + i) for i in range(4)], str(in_dir), "a.csv")
    gen.write_csv([mk("search", 200 + i) for i in range(10)]
                  + [mk("view", 300 + i) for i in range(2)], str(in_dir), "b.csv")
    os.utime(in_dir / "a.csv", (1, 1))
    os.utime(in_dir / "b.csv", (2, 2))

    sink = TrendingTopKSink(k=2)
    raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
    enriched = transform_and_enrich(validate(raw)).filter(F.col("is_valid"))
    q = (
        trending_stream(enriched, idle_timeout_ms=None)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sink.batches_seen == 2
    expect_view = 10 * TREND_DECAY + 2
    expect_search = 4 * TREND_DECAY + 10
    assert sink.topk() == [("search", expect_search), ("view", expect_view)]
    assert sink.topk(1) == [("search", expect_search)]


def test_trending_topk_sink_tombstones_and_cap(spark):
    """Unit-level sink semantics via direct foreachBatch calls: a
    zero-score tombstone deletes the key; max_keys keeps exactly the
    best (score, then smallest-key-on-tie) entries; topk tie-break is
    deterministic (score DESC, key ASC) -- the same rule the
    trending_topk batch twin pins under the DuckDB oracle."""
    from spark_streaming_postgres_lab2_spark.streaming.topk import (
        TrendingTopKSink,
    )

    mk = lambda rows: spark.createDataFrame(rows, "event_type string, score double, batches long")
    sink = TrendingTopKSink(k=3, max_keys=3)
    sink(mk([("a", 5.0, 1), ("b", 3.0, 1), ("c", 3.0, 1)]), 0)
    assert sink.topk() == [("a", 5.0), ("b", 3.0), ("c", 3.0)]  # tie: key ASC

    # capacity: "d"'s 4.0 must evict the WORST tie-loser ("c", not "b")
    sink(mk([("d", 4.0, 1)]), 1)
    assert sink.topk() == [("a", 5.0), ("d", 4.0), ("b", 3.0)]
    assert set(sink.scores) == {"a", "d", "b"}

    # tombstone deletes; the freed slot admits a new key
    sink(mk([("a", 0.0, 2), ("e", 1.0, 1)]), 2)
    assert sink.topk() == [("d", 4.0), ("b", 3.0), ("e", 1.0)]
    assert sink.batches_seen == 3


def test_trending_topk_sink_evicted_floor_watermark(spark):
    """max_keys trades exactness for a QUANTIFIED bound: the sink
    tracks the highest score ever dropped (evicted_floor), so entries
    scoring strictly above it are guaranteed exact even though an
    evicted key whose score never re-emits is invisible forever."""
    from spark_streaming_postgres_lab2_spark.streaming.topk import (
        TrendingTopKSink,
    )

    mk = lambda rows: spark.createDataFrame(rows, "event_type string, score double, batches long")
    sink = TrendingTopKSink(k=2, max_keys=2)
    sink(mk([("a", 5.0, 1), ("b", 3.0, 1)]), 0)
    assert sink.exact_above() == 0.0  # no eviction yet: fully exact

    # "c" (4.0) evicts "b" (3.0): floor rises to the dropped score
    sink(mk([("c", 4.0, 1)]), 1)
    assert set(sink.scores) == {"a", "c"}
    assert sink.exact_above() == 3.0

    # floor is monotone: a later, lower-scored eviction can't lower it
    sink(mk([("d", 3.5, 1)]), 2)  # d (3.5) loses to a/c and is dropped
    assert set(sink.scores) == {"a", "c"}
    assert sink.exact_above() == 3.5

    # both survivors score above the floor -> their ranks are exact
    assert all(s > sink.exact_above() for _, s in sink.topk())


def test_trending_stream_batch_split_invariance(spark, tmp_path):
    """Randomized micro-batch-boundary invariance: for random event
    multisets split into random batch sequences, the stateful trending
    score must equal the pure fold over each key's ACTIVE batches
    (score <- score * TREND_DECAY + batch_count) -- the state-store
    machinery may never leak a decay into a batch the key was silent
    for, whatever the boundaries are.  Decay 0.5 on integer counts is
    dyadic, so equality is exact."""
    import os
    import random
    from datetime import timedelta

    from pyspark.sql import functions as SF

    from spark_streaming_postgres_lab2_spark.streaming.anomaly import (
        TREND_DECAY,
        trending_stream,
    )

    rng = random.Random(427)
    for trial in range(4):
        batches = [
            [rng.choice(["view", "search"]) for _ in range(rng.randint(1, 8))]
            for _ in range(rng.randint(1, 4))
        ]
        in_dir = tmp_path / f"in_{trial}"
        os.makedirs(in_dir)
        t0 = NOW.replace(tzinfo=None)
        gen = EventGenerator(seed=7, anomaly_rate=0.0, now=NOW)
        uid = 0
        for bi, batch in enumerate(batches):
            evs = []
            for etype in batch:
                uid += 1
                evs.append(_mk_event(uid, t0 + timedelta(minutes=uid), etype))
            gen.write_csv(evs, str(in_dir), f"b{bi}.csv")
            os.utime(in_dir / f"b{bi}.csv", (bi + 1, bi + 1))

        expected = {}
        for etype in {e for b in batches for e in b}:
            score, nb = 0.0, 0
            for b in batches:
                n = sum(1 for e in b if e == etype)
                if n:
                    score = score * TREND_DECAY + float(n)
                    nb += 1
            expected[etype] = (score, nb)

        raw = csv_stream(spark, str(in_dir), get_registry().get_schema(), 1)
        enriched = transform_and_enrich(validate(raw)).filter(SF.col("is_valid"))
        name = run_to_memory(
            trending_stream(enriched, idle_timeout_ms=None),
            f"trend_split_{trial}",
            "update",
        )
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        final = {}
        for r in rows:
            if r.event_type not in final or r.batches > final[r.event_type][1]:
                final[r.event_type] = (r.score, r.batches)
        assert final == expected, f"trial {trial}: {batches}"

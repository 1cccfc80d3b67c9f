"""Interval-overlap range join, segmented sweep-line concurrency, and
corpus boilerplate removal: semantics on hand-built frames plus plan
pins (the range join must lower to an EQUI-join on the time grain --
never a BroadcastNestedLoop theta join -- and the sweep-line's only
unpartitioned window must be the tiny day spine)."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_streaming_postgres_lab2_spark.plans import checks
from spark_streaming_postgres_lab2_spark.queries.advanced import (
    q_session_concurrency,
    q_session_overlap_pairs,
)
from spark_streaming_postgres_lab2_spark.queries.curation import (
    q_boilerplate_dedup,
)


def test_overlap_pairs_plan_is_equi_join(spark, sf_dir):
    plan = checks.physical_plan(q_session_overlap_pairs(spark, sf_dir))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_overlap_pairs_match_naive_theta_join(spark, sf_dir):
    """The grain-bucketed equi-join must find exactly the pairs the
    naive O(n^2) theta join finds (grains are a candidate generator,
    not an approximation)."""
    out = q_session_overlap_pairs(spark, sf_dir)
    rows = {(r.user_1, r.user_2): (r.n_overlaps, r.overlap_us) for r in out.collect()}
    # the PRODUCTION interval builder feeds the naive theta join: the
    # test verifies the grain candidate generation, not a re-typed
    # copy of the sessionization rule
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _session_intervals,
    )

    iv = _session_intervals(spark, sf_dir).collect()
    naive = {}
    for a in iv:
        for b in iv:
            if a.user_id < b.user_id and a.s <= b.e and b.s <= a.e:
                n, tot = naive.get((a.user_id, b.user_id), (0, 0))
                naive[(a.user_id, b.user_id)] = (
                    n + 1,
                    tot + min(a.e, b.e) - max(a.s, b.s),
                )
    top = sorted(naive.items(), key=lambda kv: (-kv[1][1], kv[0]))[:100]
    assert rows == dict(top)


def test_concurrency_segmented_sweep_matches_global(spark, sf_dir):
    """Per-day running sum + carry-in must equal the single global
    running sum (the segmentation is exact, not approximate)."""
    out = {r.day: r.max_concurrent for r in q_session_concurrency(spark, sf_dir).collect()}
    assert out, "no days produced"
    # global sweep in plain python over the PRODUCTION intervals
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _session_intervals,
    )

    iv = _session_intervals(spark, sf_dir)
    import datetime as dt

    points = []
    for r in iv.collect():
        points.append((r.s, 1))
        points.append((r.e, -1))
    # RANGE-frame semantics: all peers of (t, delta) enter the sum
    # together, so group points by (t, delta) sorted starts-first
    points.sort(key=lambda p: (p[0], -p[1]))
    expected = {}
    run = 0
    i = 0
    while i < len(points):
        j = i
        while j < len(points) and points[j][:2] == points[i][:2]:
            j += 1
        run += sum(p[1] for p in points[i:j])
        day = dt.datetime.fromtimestamp(
            points[i][0] / 1e6, dt.timezone.utc
        ).date()
        expected[day] = max(expected.get(day, -(10**9)), run)
        i = j
    assert out == expected


def test_boilerplate_dedup_semantics(spark, sf_dir):
    """Blocks repeated across >= 2 docs are removed; unique blocks are
    kept; n_blocks counts whole 8-token blocks only."""
    out = q_boilerplate_dedup(spark, sf_dir)
    rows = out.collect()
    assert rows, "no documents produced"
    assert all(r.n_boilerplate <= r.n_blocks for r in rows)
    # at least one doc keeps everything and (fixture has exact dups)
    # at least one doc loses at least one block
    assert any(r.n_boilerplate == 0 for r in rows)
    assert any(r.n_boilerplate > 0 for r in rows)
    # exact duplicate docs must lose ALL their blocks (every block is
    # shared with the twin) and carry identical kept hashes
    from spark_streaming_postgres_lab2_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    dup_texts = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    if dup_texts:
        dup_ids = {i for r in dup_texts for i in r.ids}
        by_id = {r.doc_id: r for r in rows}
        for r in dup_texts:
            present = [by_id[i] for i in r.ids if i in by_id]
            for p in present:
                assert p.n_boilerplate == p.n_blocks


def test_boilerplate_broadcast_probe(spark, sf_dir):
    # the boilerplate set joins back as a broadcast, never sort-merge
    df = q_boilerplate_dedup(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1

"""Plan-quality pins for the advanced query batch: the physical
strategy each query relies on at 100 TB must survive refactors."""

from __future__ import annotations

from spark_streaming_postgres_lab2_spark.plans import checks
from spark_streaming_postgres_lab2_spark.queries.advanced import (
    q_big_orders,
    q_doc_regex_extract,
    q_hourly_gapfill,
    q_latest_event_per_user,
    q_market_share,
    q_nation_profit,
    q_order_window_suite,
    q_rolling_7d_revenue,
)
from spark_streaming_postgres_lab2_spark.queries.corpus import (
    q_duplicate_ngrams,
    q_shard_manifest,
    q_source_overlap_matrix,
)


def test_nation_profit_broadcasts_all_dims(spark, sf_dir):
    df = q_nation_profit(spark, sf_dir)
    # part/supplier/nation broadcast; the only shuffle joins are on the
    # lineitem x orders orderkey
    assert checks.broadcast_join_count(df) >= 3
    # the p_name filter must reach the part scan, not run post-join
    assert checks.has_pushed_filters(df)
    assert checks.has_partial_aggregation(df)


def test_market_share_single_fact_pass(spark, sf_dir):
    df = q_market_share(spark, sf_dir)
    # conditional aggregation: one pass, map-side combine
    assert checks.has_partial_aggregation(df)
    assert checks.broadcast_join_count(df) >= 2


def test_big_orders_aggregates_before_join(spark, sf_dir):
    plan = checks.physical_plan(q_big_orders(spark, sf_dir))
    # the HAVING filter runs on the aggregate, shrinking the join input
    # (plan order: aggregate appears below the orders join)
    assert "Aggregate" in plan
    assert checks.has_partial_aggregation(q_big_orders(spark, sf_dir))


def test_latest_event_arg_max_partial_agg(spark, sf_dir):
    # struct-MAX must partial-aggregate map-side: one row per user per
    # partition enters the shuffle (the whole point vs a window)
    df = q_latest_event_per_user(spark, sf_dir)
    assert checks.has_partial_aggregation(df)
    # no window exec in this formulation
    assert "Window" not in checks.physical_plan(df)


def test_window_suite_single_shuffle(spark, sf_dir):
    # every window shares one partitioning (o_custkey): exactly one
    # exchange feeds all window functions
    df = q_order_window_suite(spark, sf_dir)
    assert checks.shuffle_count(df) == 1


def test_rolling_7d_windows_after_aggregate(spark, sf_dir):
    plan = checks.physical_plan(q_rolling_7d_revenue(spark, sf_dir))
    # the RANGE window runs over the per-day rollup, not the fact table
    assert "Window" in plan
    assert checks.has_partial_aggregation(q_rolling_7d_revenue(spark, sf_dir))


def test_gapfill_no_sort_merge(spark, sf_dir):
    # the spine is tiny: its join with the hourly rollup must broadcast
    assert checks.sort_merge_join_count(q_hourly_gapfill(spark, sf_dir)) == 0


def test_regex_scan_prunes_to_text(spark, sf_dir):
    cols = checks.read_schema_columns(q_doc_regex_extract(spark, sf_dir))
    assert "text" in cols
    assert "lang" not in cols and "source" not in cols


def test_duplicate_ngrams_join_free_pruned(spark, sf_dir):
    """The duplicated-substring census must stay a pure aggregate: no
    join of any kind, map-side partial agg, scan pruned to the two
    columns it uses (a full-row read of a 100 TB documents table would
    dominate the job)."""
    df = q_duplicate_ngrams(spark, sf_dir)
    assert checks.sort_merge_join_count(df) == 0
    assert checks.broadcast_join_count(df) == 0
    assert checks.has_partial_aggregation(df)
    assert set(checks.read_schema_columns(df)) == {"doc_id", "text"}


def test_source_overlap_matrix_never_joins(spark, sf_dir):
    """The contamination matrix's whole point is avoiding the gram
    self-join (quadratic in gram frequency): the plan must contain NO
    join -- the pair expansion is a row-local transform over the
    bounded per-gram source set."""
    df = q_source_overlap_matrix(spark, sf_dir)
    assert checks.sort_merge_join_count(df) == 0
    assert checks.broadcast_join_count(df) == 0
    assert set(checks.read_schema_columns(df)) == {"source", "text"}


def test_shard_manifest_reuses_bucket_exchange(spark, sf_dir):
    """The per-bucket packing window and the (bucket, shard_id) rollup
    must share ONE hash exchange (hash(bucket) already clusters the
    rollup keys); only the final presentation sort may add a second.
    A third shuffle would mean the window partitioning was not
    reused."""
    df = q_shard_manifest(spark, sf_dir)
    assert checks.shuffle_count(df) <= 2
    assert set(checks.read_schema_columns(df)) == {"doc_id", "n_chars"}


def test_substring_dedup_cut_plan_shape(spark, sf_dir):
    """The cut stage (r10 window reformulation) must stay join-free on
    the gram side -- one gram-window pass, never a
    BroadcastNestedLoop/cartesian, only the per-doc rollup join --
    with partial aggregation on the rollups and a scan pruned to the
    three columns it uses."""
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_substring_dedup_cut,
    )

    df = q_substring_dedup_cut(spark, sf_dir)
    assert "BroadcastNestedLoopJoin" not in checks.physical_plan(df)
    assert checks.has_partial_aggregation(df)
    assert set(checks.read_schema_columns(df)) == {"doc_id", "source", "text"}
    # r10 reformulation: the gram side is JOIN-FREE (one window pass);
    # the only join left is the per-doc rollup attach
    assert (
        checks.sort_merge_join_count(df) + checks.broadcast_join_count(df) <= 1
    )


def test_embedding_pq_audit_broadcasts_codebook(spark, sf_dir):
    """The PQ codebook is constant-sized (M*K*SUB = 1024 rows) at any
    corpus scale: it must BROADCAST -- a sort-merge join here would
    shuffle the whole long-form corpus against a 1024-row table."""
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_embedding_pq_audit,
    )

    df = q_embedding_pq_audit(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1
    assert checks.sort_merge_join_count(df) == 0
    # the corpus-side long form is behind a lazy localCheckpoint (one
    # scan for all consumers), so the visible read schema covers only
    # the seed branch -- which must stay pruned to the id
    assert set(checks.read_schema_columns(df)) <= {"vec_id", "embedding"}


def test_ann_ivfpq_adc_single_corpus_pass_no_joins(spark, sf_dir):
    """r16 restructure: the constant-sized sides (centroids, codebook,
    probe lists, ADC LUT) ride in the task closure as driver-collected
    literals, so the plan must contain NO joins at all -- the corpus
    crosses Arrow exactly once (one MapInPandas) and the only
    corpus-sized exchange left is the final per-query top-k window.
    (The pre-r16 relational replay asserted >= 5 broadcasts and five
    corpus-sized partial aggregates; this certifies the replacement
    shape.)"""
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_ann_ivfpq_adc_audit,
    )

    df = q_ann_ivfpq_adc_audit(spark, sf_dir)
    plan = checks.physical_plan(df)
    assert checks.sort_merge_join_count(df) == 0
    assert checks.broadcast_join_count(df) == 0
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one numbered MapInPandas operator in the formatted tree
    # (each operator also repeats once in the details section)
    import re

    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    # one exchange for the top-k window (+ AQE bookkeeping), not the
    # old replay's five corpus-sized aggregate shuffles
    assert checks.shuffle_count(df) <= 2

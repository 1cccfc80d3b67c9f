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

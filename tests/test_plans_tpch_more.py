"""Plan-shape pins for the round-3 TPC-H batch and corpus operators:
the plans Catalyst picks at sf scale must be the plans we'd want at
100 TB -- broadcast for fixed-size dims, no cross products from the
disjunctive residual, pushdown on the date slices, partial
aggregation everywhere."""

from __future__ import annotations

from spark_streaming_postgres_lab2_spark.plans import checks
from spark_streaming_postgres_lab2_spark.queries.corpus import (
    q_training_mix_sample,
)
from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
    q_disjunctive_revenue,
    q_idle_customers,
    q_nation_volume,
    q_order_count_distribution,
    q_promo_revenue,
    q_returned_revenue,
    q_small_quantity_revenue,
)


def test_nation_volume_broadcasts_both_nation_dims(spark, sf_dir):
    df = q_nation_volume(spark, sf_dir)
    # two explicit nation broadcasts; the date slice reaches the scan
    assert checks.broadcast_join_count(df) >= 2
    assert checks.has_pushed_filters(df)
    assert checks.has_partial_aggregation(df)


def test_returned_revenue_pushes_returnflag_to_scan(spark, sf_dir):
    df = q_returned_revenue(spark, sf_dir)
    assert checks.has_pushed_filters(df)  # l_returnflag = 'R' + date slice
    cols = checks.read_schema_columns(df)
    assert "l_quantity" not in cols  # unused fact columns pruned


def test_order_count_distribution_is_two_aggregates(spark, sf_dir):
    df = q_order_count_distribution(spark, sf_dir)
    assert checks.has_partial_aggregation(df)
    # left join keeps zero-order customers; no cartesian anywhere
    assert "CartesianProduct" not in checks.physical_plan(df)


def test_promo_revenue_single_pass(spark, sf_dir):
    df = q_promo_revenue(spark, sf_dir)
    plan = checks.physical_plan(df)
    # one scan of lineitem: the CASE folds into one aggregate, no
    # self-join / second scan of the fact table
    assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 2
    assert checks.has_pushed_filters(df)


def test_small_quantity_no_cartesian(spark, sf_dir):
    plan = checks.physical_plan(q_small_quantity_revenue(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_disjunctive_residual_stays_hash_join(spark, sf_dir):
    # the OR predicate must be a residual filter on an equi hash join,
    # not degrade the join itself to a nested-loop cross product
    plan = checks.physical_plan(q_disjunctive_revenue(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_idle_customers_anti_join(spark, sf_dir):
    plan = checks.physical_plan(q_idle_customers(spark, sf_dir))
    assert "LeftAnti" in plan
    # the scalar average joins as a 1-row broadcast, never a per-row
    # subquery or a shuffled cross join
    assert checks.broadcast_join_count(q_idle_customers(spark, sf_dir)) >= 1


def test_training_mix_sample_is_scan_plus_agg(spark, sf_dir):
    df = q_training_mix_sample(spark, sf_dir)
    assert checks.shuffle_count(df) <= 2  # partial agg + final agg
    assert checks.has_partial_aggregation(df)
    cols = checks.read_schema_columns(df)
    assert "text" not in cols  # sampling never reads the payload


def test_embedding_quantize_no_shuffle_before_rollup(spark, sf_dir):
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_embedding_quantize,
    )

    df = q_embedding_quantize(spark, sf_dir)
    # quantize + error are per-row HOFs: partial agg then one exchange
    assert checks.shuffle_count(df) <= 2
    assert checks.has_partial_aggregation(df)


def test_doc_chunks_explode_is_exactly_sized(spark, sf_dir):
    from spark_streaming_postgres_lab2_spark.queries.corpus import q_doc_chunks

    plan = checks.physical_plan(q_doc_chunks(spark, sf_dir))
    # no join, no aggregate -- scan + generate + project (+ output sort)
    assert "Join" not in plan
    cols = checks.read_schema_columns(q_doc_chunks(spark, sf_dir))
    assert "lang" not in cols  # untouched columns pruned at the scan


def test_sequence_packing_single_window_shuffle(spark, sf_dir):
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_sequence_packing,
    )

    df = q_sequence_packing(spark, sf_dir)
    # window partition on source + final agg on source reuse the same
    # hash partitioning; no second data-wide exchange beyond the sort
    assert checks.shuffle_count(df) <= 2
    cols = checks.read_schema_columns(df)
    assert "text" in cols and "lang" not in cols


def test_bucketed_fact_join_is_exchange_free(spark, sf_dir):
    """The bucketing pair's whole point: with both facts bucketed+sorted
    on the join key, the SMJ needs NO Exchange on either side (and no
    Sort); the unbucketed control shuffles both.  Broadcast disabled so
    the small fixture doesn't hide the shuffle behind a BHJ."""
    from spark_streaming_postgres_lab2_spark.sources.bucketing import ensure_bucketed
    from spark_streaming_postgres_lab2_spark.sources.tables import load_tables

    li = ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey", 16)
    o = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", 16)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            li["l_orderkey"], o["o_orderpriority"]
        )
        assert checks.shuffle_count(joined) == 0
        assert checks.sort_merge_join_count(joined) >= 1

        t = load_tables(spark, sf_dir, ["lineitem", "orders"])
        control = t["lineitem"].join(
            t["orders"],
            t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"],
        ).select(t["lineitem"]["l_orderkey"], t["orders"]["o_orderpriority"])
        assert checks.shuffle_count(control) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_and_control_agree(spark, sf_dir):
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_fact_join_bucketed,
        q_fact_join_unbucketed,
    )

    a = [tuple(r) for r in q_fact_join_bucketed(spark, sf_dir).collect()]
    b = [tuple(r) for r in q_fact_join_unbucketed(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_sole_failed_supplier_reuses_one_fact_partitioning(spark, sf_dir):
    """The r10 Q21 rewrite: the fact side pays exactly ONE exchange
    (repartition by l_orderkey), which the (order, supplier) aggregate
    and both per-order window counts then ride -- no second fact
    aggregate joined back, so no sort-merge join anywhere (the only
    join left is the broadcast supplier-name attach).  The final
    top-20 exchange is the only other one."""
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_sole_failed_supplier,
    )

    df = q_sole_failed_supplier(spark, sf_dir)
    assert checks.sort_merge_join_count(df) == 0
    assert checks.broadcast_join_count(df) == 1
    # fact repartition + s_name rollup + the orderBy: never a fourth
    assert checks.shuffle_count(df) <= 3
    assert set(checks.read_schema_columns(df)) >= {
        "l_orderkey", "l_suppkey", "l_returnflag",
    }

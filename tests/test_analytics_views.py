"""Direct tests for the reference's four analytics views over
engine-schema frames (postgres_setup.sql:101-151 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.operators.analytics import (
    category_performance,
    data_quality_summary,
    hourly_event_summary,
    user_sessions,
)
from conftest import round_half_up


def enriched_frame(spark):
    rows = [
        # user, session, segment, type, category, price, total, event_time
        (1, "s1", "new", "view", "books", 0.0, 0.0, "2024-03-15 10:05:00"),
        (1, "s1", "new", "purchase", "books", 10.0, 20.0, "2024-03-15 10:15:00"),
        (2, "s2", "premium", "purchase", "electronics", 100.0, 100.0, "2024-03-15 11:00:00"),
        (None, "g1", "anonymous", "view", "books", 0.0, 0.0, "2024-03-15 11:30:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id int, session_id string, user_segment string, event_type string, "
        "category string, price double, total_amount double, event_time_s string",
    )
    return df.withColumn("event_time", F.to_timestamp("event_time_s")).drop("event_time_s")


def test_hourly_summary(spark):
    out = hourly_event_summary(enriched_frame(spark)).collect()
    by_key = {(r["event_hour"].hour, r["event_type"]): r for r in out}
    assert by_key[(10, "purchase")]["total_revenue"] == 20.0
    assert by_key[(11, "view")]["unique_users"] == 0  # NULL user not counted
    assert by_key[(10, "view")]["event_count"] == 1


def test_user_sessions(spark):
    out = {r["session_id"]: r for r in user_sessions(enriched_frame(spark)).collect()}
    s1 = out["s1"]
    assert (s1["event_count"], s1["view_count"], s1["purchase_count"]) == (2, 1, 1)
    assert s1["total_spent"] == 20.0
    assert s1["session_start"] < s1["session_end"]


def test_category_performance_ordering(spark):
    rows = category_performance(enriched_frame(spark)).collect()
    assert rows[0]["category"] == "electronics"  # highest revenue first
    assert rows[0]["purchase_count"] == 1


def test_data_quality_summary_24h_filter(spark):
    metrics = spark.createDataFrame(
        [
            (1, 100, 95, 5, 0.95, 2, "2024-03-15 10:00:00"),
            (2, 100, 90, 10, 0.90, 1, "2024-03-15 10:30:00"),
            (3, 100, 99, 1, 0.99, 0, "2024-03-10 00:00:00"),  # older than 24h
        ],
        "batch_id long, total_rows long, valid_rows long, invalid_rows long, "
        "validity_rate double, late_arrival_count long, recorded_at_s string",
    ).withColumn("recorded_at", F.to_timestamp("recorded_at_s")).drop("recorded_at_s")
    now = F.to_timestamp(F.lit("2024-03-15 12:00:00"))
    out = data_quality_summary(metrics, now=now).collect()
    assert len(out) == 1  # one hour bucket survives the 24h filter
    row = out[0]
    assert row["total_rows"] == 200
    assert row["invalid_rows"] == 15
    assert abs(row["avg_validity_rate"] - 0.925) < 1e-9


def test_funnel_conversion_order_and_window_rules(spark):
    """Crafted users pin the funnel semantics: a pre-signup view does
    not count (strict order), a view 25 h after signup does not count
    (24 h window), and a purchase 26 h after the qualifying view does
    not count."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_funnel_conversion,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, etype, hours):
        return Row(user_id=uid, event_type=etype, ts=t0 + timedelta(hours=hours))

    rows = [
        ev(1, "signup", 0), ev(1, "view", 1), ev(1, "purchase", 2),
        ev(2, "view", -1), ev(2, "signup", 0),
        ev(3, "signup", 0), ev(3, "view", 25),
        ev(4, "signup", 0), ev(4, "view", 1), ev(4, "purchase", 26),
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        r = q_funnel_conversion(spark, "unused").collect()[0]
    finally:
        adv.load_tables = orig
    assert (r.users_any, r.signed_up) == (4, 4)
    assert r.viewed_within_window == 2       # users 1 and 4
    assert r.purchased_within_window == 1    # user 1 only
    assert r.signup_to_view_rate == 0.5
    assert r.view_to_purchase_rate == 0.5


def test_cohort_retention_matrix(spark):
    """Crafted users pin the cohort semantics: day-number cohorts from
    first-seen, weekly offsets floor-divided, per-cell distinct users
    over cohort size."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_cohort_retention,
    )

    t0 = datetime(2024, 1, 1, 5, 0, 0)

    def ev(uid, days):
        return Row(user_id=uid, event_type="view", ts=t0 + timedelta(days=days))

    rows = [
        ev(1, 0), ev(1, 8),          # cohort d0, offsets 0 and 1
        ev(2, 0),                    # cohort d0, offset 0 only
        ev(3, 3), ev(3, 3), ev(3, 17),  # cohort d3, offsets 0 and 2 (dup day collapses)
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            (r.cohort_day, r.offset_week): (r.cohort_size, r.retained_users, r.retention_rate)
            for r in q_cohort_retention(spark, "unused").collect()
        }
    finally:
        adv.load_tables = orig
    d0 = min(k[0] for k in got)
    d3 = d0 + 3
    assert got == {
        (d0, 0): (2, 2, 1.0),
        (d0, 1): (2, 1, 0.5),
        (d3, 0): (1, 1, 1.0),
        (d3, 2): (1, 1, 1.0),
    }


def test_event_transitions_counts_and_probs(spark):
    """Crafted streams pin the transition semantics: per-user ordered
    pairs only (no cross-user transition), equal-timestamp order broken
    by event_id, probabilities normalized per from-type."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_event_transitions,
    )

    t0 = datetime(2024, 1, 1)

    def ev(uid, etype, mins, eid):
        return Row(
            user_id=uid, event_type=etype, ts=t0 + timedelta(minutes=mins), event_id=eid
        )

    rows = [
        # user 1: view -> click -> view  (ties on ts broken by event_id)
        ev(1, "view", 0, "a"), ev(1, "click", 1, "b"), ev(1, "view", 1, "c"),
        # user 2: view -> purchase; the user boundary must NOT create
        # a purchase -> view transition
        ev(2, "view", 0, "d"), ev(2, "purchase", 5, "e"),
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            (r.from_type, r.to_type): (r.n_transitions, r.transition_prob)
            for r in q_event_transitions(spark, "unused").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "purchase"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_zscore_anomaly_planted_spikes(spark):
    """Crafted series pin the z-score semantics: warmup hours (<24
    trailing rows) are NULL-flagged; a spike over a CONSTANT baseline
    (zero variance) flags with NULL z; a spike over a varying baseline
    flags with the exact z; the hour after a spike is not flagged."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_zscore_anomaly_hours,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = []
    # type A: constant 5/hour for hours 0..23, spike 20 at hour 24,
    # back to 5 at hour 25
    for h in range(24):
        rows += [Row(event_type="A", ts=t0 + timedelta(hours=h))] * 5
    rows += [Row(event_type="A", ts=t0 + timedelta(hours=24))] * 20
    rows += [Row(event_type="A", ts=t0 + timedelta(hours=25))] * 5
    # type B: alternating 4/6 baseline, spike 30 at hour 24
    for h in range(24):
        rows += [Row(event_type="B", ts=t0 + timedelta(hours=h))] * (4 if h % 2 == 0 else 6)
    rows += [Row(event_type="B", ts=t0 + timedelta(hours=24))] * 30
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        res = q_zscore_anomaly_hours(spark, "unused").collect()
        base = min(r.hour_id for r in res)
        out = {(r.event_type, r.hour_id - base): r for r in res}
    finally:
        adv.load_tables = orig

    # warmup: every hour before 24 trailing rows exist is NULL-flagged
    for h in range(24):
        assert out[("A", h)].is_anomaly is None
    # constant baseline, zero variance: spike flags, z is NULL
    a24 = out[("A", 24)]
    assert a24.is_anomaly == 1 and a24.z is None
    # hour after the spike: back in range (spike inflates the window
    # variance), not flagged, exact z = -15/sqrt(5175)
    a25 = out[("A", 25)]
    assert a25.is_anomaly == 0
    assert a25.z == round_half_up(-15 / 5175 ** 0.5, 4)
    # varying baseline: exact integer predicate and z = 600/sqrt(576) = 25
    b24 = out[("B", 24)]
    assert b24.is_anomaly == 1 and b24.z == 25.0


def test_session_path_mining_boundary_and_counts(spark):
    """Trigrams never cross the 30-min session boundary, and identical
    paths aggregate across users."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_session_path_mining,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, uid, etype, minutes):
        return Row(event_id=i, user_id=uid, event_type=etype,
                   ts=t0 + timedelta(minutes=minutes))

    rows = [
        # user 1, session 1: A B C D -> A>B>C, B>C>D
        ev(1, 1, "A", 0), ev(2, 1, "B", 1), ev(3, 1, "C", 2), ev(4, 1, "D", 3),
        # 31-min gap -> session 2: E F G -> E>F>G only (no C>D>E, D>E>F)
        ev(5, 1, "E", 34), ev(6, 1, "F", 35), ev(7, 1, "G", 36),
        # user 2 repeats A B C -> A>B>C count 2
        ev(8, 2, "A", 0), ev(9, 2, "B", 1), ev(10, 2, "C", 2),
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.path: r.n_sequences for r in q_session_path_mining(spark, "x").collect()}
    finally:
        adv.load_tables = orig
    assert got == {"A>B>C": 2, "B>C>D": 1, "E>F>G": 1}


def test_scd2_collapses_unchanged_and_chains_intervals(spark):
    """SCD2 semantics: consecutive same-priority orders collapse into
    one version; valid_to of version k equals valid_from of k+1; only
    the last version is current."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_scd2_priority_dim,
    )

    t0 = datetime(2024, 1, 1)

    def o(key, cust, prio, days):
        return Row(o_orderkey=key, o_custkey=cust, o_orderpriority=prio,
                   o_orderdate=t0 + timedelta(days=days))

    rows = [
        o(1, 7, "HIGH", 0), o(2, 7, "HIGH", 10),   # collapse
        o(3, 7, "LOW", 20),
        o(4, 7, "HIGH", 30),                        # re-open as NEW version
        o(5, 8, "URGENT", 5),                       # single-version customer
    ]
    df = spark.createDataFrame(rows)
    orig = tm.load_tables
    try:
        tm.load_tables = lambda _s, _d, _t: {"orders": df}
        got = {(r.custkey, r.version): r for r in q_scd2_priority_dim(spark, "x").collect()}
    finally:
        tm.load_tables = orig

    us = lambda d: int((t0 + timedelta(days=d)).timestamp() * 1e6)  # noqa: E731
    assert len(got) == 4
    v1, v2, v3 = got[(7, 1)], got[(7, 2)], got[(7, 3)]
    assert (v1.priority, v1.n_orders, v1.is_current) == ("HIGH", 2, 0)
    assert (v2.priority, v2.n_orders) == ("LOW", 1)
    assert (v3.priority, v3.is_current, v3.valid_to) == ("HIGH", 1, None)
    # interval chaining
    assert v1.valid_to == v2.valid_from and v2.valid_to == v3.valid_from
    assert v1.valid_from == us(0) and v2.valid_from == us(20) and v3.valid_from == us(30)
    assert got[(8, 1)].is_current == 1


def test_table_profile_crafted(spark):
    """Profile stats on a hand-built frame: null counts, micro-distinct
    ts, integer min/max, and the mode tie resolving to the smallest
    value."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_table_profile_events,
    )

    t0 = datetime(2024, 1, 1)

    def ev(i, uid, et, val, props):
        return Row(event_id=i, ts=t0, user_id=uid, event_type=et,
                   value=val, props=props)

    df = spark.createDataFrame([
        ev(1, 10, "b", 1.5, None),
        ev(2, 10, "b", None, None),
        ev(3, None, "a", 2.5, '{"k":1}'),
        ev(4, 20, "a", 1.5, '{"k":1}'),
    ])
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.col_name: r for r in q_table_profile_events(spark, "x").collect()}
    finally:
        ext.load_tables = orig

    assert (got["event_id"].n_nulls, got["event_id"].n_distinct) == (0, 4)
    assert (got["event_id"].min_num, got["event_id"].max_num) == (1, 4)
    assert (got["user_id"].n_nulls, got["user_id"].n_distinct) == (1, 2)
    assert got["ts"].n_distinct == 1
    # mode tie between 'a' (2) and 'b' (2) -> smallest value wins
    et = got["event_type"]
    assert (et.mode_value, et.mode_count, et.min_str, et.max_str) == ("a", 2, "a", "b")
    assert (got["value"].n_nulls, got["value"].n_distinct) == (1, 2)
    assert (got["value"].min_num, got["value"].mode_value) == (None, None)
    assert (got["props"].n_nulls, got["props"].n_distinct) == (2, 1)
    assert got["props"].mode_count == 2


def test_iqr_outlier_crafted(spark):
    """Tukey fences with DISCRETE quartiles on a hand-computable set:
    n = 9 -> q1 = 3rd element (3.0), q3 = 7th (7.0), fences
    [-3, 13]; only 100.0 is outside."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_iqr_outlier_summary,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    df = spark.createDataFrame(
        [Row(event_type="X", value=v, ts=datetime(2024, 1, 1)) for v in vals]
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        r = q_iqr_outlier_summary(spark, "x").collect()[0]
    finally:
        adv.load_tables = orig
    assert (r.q1, r.q3) == (3.0, 7.0)  # ceil(9/4)=3rd, ceil(27/4)=7th element
    assert (r.n_hi, r.n_lo, r.n_values) == (1, 0, 9)
    assert r.hi_rate == round_half_up(1 / 9, 4)


def test_ab_test_crafted(spark):
    """Two-proportion z on hand counts: 8/10 vs 2/10 -> z = 2.6833,
    significant."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_ab_test_conversion,
    )

    rows = []
    for u in range(20):  # arm = u % 2
        converted = (u % 2 == 0 and u < 16) or (u % 2 == 1 and u < 4)
        rows.append(Row(user_id=u, event_type="purchase" if converted else "view",
                        ts=datetime(2024, 1, 1)))
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        r = q_ab_test_conversion(spark, "x").collect()[0]
    finally:
        adv.load_tables = orig
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (10, 8, 10, 2)
    assert (r.rate_a, r.rate_b) == (0.8, 0.2)
    z = (0.8 - 0.2) / (0.5 * 0.5 * 0.2) ** 0.5
    assert r.z == round_half_up(z, 4) and r.significant == 1


def test_forecast_baseline_crafted(spark):
    """Weekly-periodic series scores ZERO seasonal error while
    persistence pays the day-to-day deltas; a constant series scores
    zero on both."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _FC_EVAL,
        q_forecast_baseline,
    )

    t0 = datetime(2024, 1, 1, 6, 0, 0)
    rows = []
    for d in range(22):
        rows += [Row(event_type="const", ts=t0 + timedelta(days=d))] * 5
        rows += [Row(event_type="weekly", ts=t0 + timedelta(days=d))] * (1 + d % 7)
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.event_type: r for r in q_forecast_baseline(spark, "x").collect()}
    finally:
        adv.load_tables = orig
    assert got["const"].sum_abs_err_seasonal == 0
    assert got["const"].sum_abs_err_persist == 0
    assert got["const"].n_days == _FC_EVAL
    w = got["weekly"]
    assert w.sum_abs_err_seasonal == 0  # perfectly weekly-periodic
    # persistence: |delta| is 1 six days a week, 6 at each wrap; the
    # exact sum depends on which days fall in the scored window --
    # recompute it
    counts = [1 + d % 7 for d in range(22)]
    scored_days = range(22 - _FC_EVAL, 22)
    expect = sum(abs(counts[d] - counts[d - 1]) for d in scored_days)
    assert w.sum_abs_err_persist == expect
    assert w.mae_persist == round_half_up(expect / _FC_EVAL, 4)


def test_market_basket_crafted(spark):
    """Support/confidence/lift on hand baskets: {1,2} x2, {1,3},
    {2} -> pair (1,2) count 2, conf 1->2 = 2/3, lift = 2*4/(3*3)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_market_basket,
    )

    baskets = {10: [1, 2], 11: [1, 2], 12: [1, 3], 13: [2]}
    li = spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p) for o, ps in baskets.items() for p in ps]
    )
    orders = spark.createDataFrame([Row(o_orderkey=o) for o in baskets])
    orig = tm.load_tables
    try:
        tm.load_tables = lambda _s, _d, _t: {"lineitem": li, "orders": orders}
        got = {(r.part_a, r.part_b): r for r in q_market_basket(spark, "x").collect()}
    finally:
        tm.load_tables = orig
    r = got[(1, 2)]
    assert (r.pair_count, r.count_a, r.count_b) == (2, 3, 3)
    assert (r.conf_a_to_b, r.conf_b_to_a) == (round_half_up(2 / 3, 4), round_half_up(2 / 3, 4))
    assert r.lift == round_half_up(2 * 4 / (3 * 3), 4)
    r13 = got[(1, 3)]
    assert (r13.pair_count, r13.lift) == (1, round_half_up(1 * 4 / (3 * 1), 4))
    assert len(got) == 2  # {2}-only basket contributes no pair


def test_gdpr_cascade_crafted(spark):
    """Cascade scope: victim customer 0 owns 2 of 3 orders owning 3 of
    4 lineitems."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        _GDPR_MOD,
        q_gdpr_erasure_audit,
    )

    cust = spark.createDataFrame(
        [Row(c_custkey=0), Row(c_custkey=1), Row(c_custkey=2)]
    )  # only 0 % 97 == 0
    orders = spark.createDataFrame(
        [Row(o_orderkey=100, o_custkey=0), Row(o_orderkey=101, o_custkey=0),
         Row(o_orderkey=102, o_custkey=1)]
    )
    li = spark.createDataFrame(
        [Row(l_orderkey=100, l_partkey=7), Row(l_orderkey=100, l_partkey=8),
         Row(l_orderkey=101, l_partkey=7), Row(l_orderkey=102, l_partkey=9)]
    )
    assert _GDPR_MOD == 97
    orig = tm.load_tables
    try:
        tm.load_tables = lambda _s, _d, _t: {
            "customer": cust, "orders": orders, "lineitem": li
        }
        got = {r.table_name: r for r in q_gdpr_erasure_audit(spark, "x").collect()}
    finally:
        tm.load_tables = orig
    assert (got["customer"].rows_to_delete, got["customer"].total_rows) == (1, 3)
    assert (got["orders"].rows_to_delete, got["orders"].total_rows) == (2, 3)
    assert (got["lineitem"].rows_to_delete, got["lineitem"].total_rows) == (3, 4)
    assert got["lineitem"].share == 0.75


def test_winsorized_crafted(spark):
    """Discrete winsorization on a known set: 200 values 1..200 ->
    k_lo = ceil(0.01*200) = 2 so the lower bound is the 2nd-smallest
    element (2.0, clipping one value), k_hi = ceil(0.99*200) = 198 so
    the upper bound is 198.0 (clipping two).  Bounds are DATA VALUES,
    never interpolated -- the sf1 sweep showed interpolated bounds
    land within 1 ulp of duplicated data and flip strict compares."""
    from datetime import datetime

    import numpy as np
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_winsorized_value_stats,
    )

    vals = [float(i) for i in range(1, 201)]
    df = spark.createDataFrame(
        [Row(event_type="X", value=v, ts=datetime(2024, 1, 1)) for v in vals]
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        r = q_winsorized_value_stats(spark, "x").collect()[0]
    finally:
        adv.load_tables = orig
    assert (r.p01, r.p99) == (2.0, 198.0)
    assert (r.n_clip_lo, r.n_clip_hi) == (1, 2)
    clipped = np.clip(vals, 2.0, 198.0)
    fp = sum(int(np.floor(c * 10000 + 0.5)) for c in clipped)
    assert r.winsorized_mean == round_half_up((fp / 10000.0) / 200, 4)


def test_trending_scores_recurrence_matches_stream_semantics(spark):
    """Crafted hours pin the batch twin of trending_stream: the
    fixed-point fold score_fp <- score_fp div 2 + cnt*2^20 over the
    type's ACTIVE hours (gaps do NOT decay -- the streaming op only
    decays on batches the key appears in), and the reported score is
    exactly the float recurrence the stream runs (dyadic rationals are
    exact in float64)."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _TREND_FP_SCALE,
        q_trending_scores,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = []
    # type A: counts 3, 1, 2 in three consecutive hours
    for h, c in [(0, 3), (1, 1), (2, 2)]:
        rows += [Row(event_type="A", ts=t0 + timedelta(hours=h))] * c
    # type B: counts 4 and 6 with a 10-hour GAP between them -- the gap
    # must not decay (active-hours semantics)
    rows += [Row(event_type="B", ts=t0)] * 4
    rows += [Row(event_type="B", ts=t0 + timedelta(hours=11))] * 6
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        res = {r.event_type: r for r in q_trending_scores(spark, "unused").collect()}
    finally:
        adv.load_tables = orig

    def fold(counts):
        acc = 0
        for c in counts:
            acc = acc // 2 + c * _TREND_FP_SCALE
        return acc

    # the float recurrence the STREAM runs (score*0.5 + n per active
    # batch) -- equal to the fixed-point value at this depth
    def stream_score(counts):
        s = 0.0
        for c in counts:
            s = s * 0.5 + c
        return s

    assert res["A"].score_fp == fold([3, 1, 2])
    assert res["A"].n_hours == 3
    assert res["A"].score == stream_score([3, 1, 2])  # 3/4 + 1/2 + 2
    assert res["B"].score_fp == fold([4, 6])  # two ACTIVE hours only
    assert res["B"].score == stream_score([4, 6])  # 4*0.5 + 6


def test_trending_topk_ranks_and_ties(spark):
    """The batch twin of the sink-side top-k: ranks by score_fp DESC
    with key-ASC tie-break (the exact rule TrendingTopKSink.topk
    applies), truncates to k=5, and rank is dense-free row_number."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_trending_topk,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = []
    # six types; D and B tie at count 4 (one hour each); F is the
    # 6th-ranked type and must be truncated away by k=5
    for etype, cnt in [("C", 9), ("D", 4), ("B", 4), ("A", 2), ("E", 1), ("F", 0)]:
        rows += [Row(event_type=etype, ts=t0)] * cnt
    rows += [Row(event_type="F", ts=t0 + timedelta(hours=1))] * 1
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = q_trending_topk(spark, "unused").collect()
    finally:
        adv.load_tables = orig

    # every type has one active hour -> score == its count; D/B tie
    # broken by key ASC; E and F tie at 1 -> E kept, F truncated
    assert [(r.rank, r.event_type, r.score) for r in got] == [
        (1, "C", 9.0), (2, "B", 4.0), (3, "D", 4.0), (4, "A", 2.0), (5, "E", 1.0),
    ]


def test_ols_trend_hand_computed(spark):
    """Perfectly linear monthly revenue gives the exact slope through
    the integer normal equations; a single-month nation has den = 0
    and a NULL slope."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import q_ols_trend

    lineitem = spark.createDataFrame(
        [
            # nation X: 100, 200, 300 dollars in Jan/Feb/Mar
            Row(l_orderkey=1, l_extendedprice=100.0, l_discount=0.0),
            Row(l_orderkey=2, l_extendedprice=200.0, l_discount=0.0),
            Row(l_orderkey=3, l_extendedprice=300.0, l_discount=0.0),
            # nation Y: one month only
            Row(l_orderkey=4, l_extendedprice=500.0, l_discount=0.0),
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=1, o_orderdate=datetime(2024, 1, 15)),
            Row(o_orderkey=2, o_custkey=1, o_orderdate=datetime(2024, 2, 15)),
            Row(o_orderkey=3, o_custkey=1, o_orderdate=datetime(2024, 3, 15)),
            Row(o_orderkey=4, o_custkey=2, o_orderdate=datetime(2024, 1, 20)),
        ]
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=1, c_nationkey=10), Row(c_custkey=2, c_nationkey=20)]
    )
    nation = spark.createDataFrame(
        [Row(n_nationkey=10, n_name="X"), Row(n_nationkey=20, n_name="Y")]
    )
    tables = {
        "lineitem": lineitem,
        "orders": orders,
        "customer": customer,
        "nation": nation,
    }
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, names: {k: tables[k] for k in names}
        got = {r.nation: r for r in q_ols_trend(spark, "unused").collect()}
    finally:
        adv.load_tables = orig
    x = got["X"]
    # x=[0,1,2], y_fp=[1e6,2e6,3e6]: num=3*8e6-3*6e6=6e6, den=3*5-9=6
    assert (x.n_months, x.slope_num, x.slope_den) == (3, 6_000_000, 6)
    assert x.slope_per_month == 100.0  # dollars per month, exact
    y = got["Y"]
    assert (y.n_months, y.slope_den) == (1, 0)
    assert y.slope_per_month is None


def test_benford_digit_audit_hand_computed(spark):
    """First significant digits come from the integer fixed-point
    value (sub-dollar amounts included); counts and the shared
    expected literals line up."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _BENFORD_EXPECTED,
        q_benford_digit_audit,
    )

    orders = spark.createDataFrame(
        [
            Row(o_totalprice=1.23),    # fp 12300 -> digit 1
            Row(o_totalprice=10.0),    # fp 100000 -> digit 1
            Row(o_totalprice=0.05),    # fp 500 -> digit 5 (sub-dollar)
            Row(o_totalprice=999.99),  # fp 9999900 -> digit 9
            Row(o_totalprice=0.0),     # filtered out
        ]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"orders": orders}
        got = {r.digit: r for r in q_benford_digit_audit(spark, "unused").collect()}
    finally:
        ext.load_tables = orig
    assert {d: r.n for d, r in got.items()} == {1: 2, 5: 1, 9: 1}
    assert got[1].share == 0.5
    for d, r in got.items():
        assert r.benford_expected == _BENFORD_EXPECTED[d]


def test_skew_key_report_hand_computed(spark):
    """Counts, shares, and the mean-load ratio over a crafted skewed
    key set; NULL keys drop out; ordering is (cnt DESC, key)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_skew_key_report

    rows = [Row(user_id=1)] * 5 + [Row(user_id=2)] * 3 + [Row(user_id=3)]
    rows += [Row(user_id=None)] * 2
    events = spark.createDataFrame(rows, "user_id bigint")
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"events": events}
        got = q_skew_key_report(spark, "unused").collect()
    finally:
        ext.load_tables = orig
    assert [(r.user_id, r.cnt) for r in got] == [(1, 5), (2, 3), (3, 1)]
    assert got[0].n_keys == 3
    assert got[0].share == round_half_up(5 / 9, 6)
    assert got[0].skew_ratio == round_half_up(5 * 3 / 9, 4)  # 1.6667x the mean


def test_mad_anomaly_robust_to_baseline_spike(spark):
    """The median/MAD detector's reason to exist: a wild spike INSIDE
    the trailing baseline inflates mean/sigma (masking the next
    anomaly for the z-score test) but moves median/MAD by at most one
    rank -- the crafted series pins that the hour after a
    contaminated baseline still flags, that warmup is NULL, and that
    a zero-MAD constant window flags any deviation."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_mad_anomaly_hours,
        q_zscore_anomaly_hours,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = []
    # type A: 4/5/6 cycling baseline for 23 hours + a wild 100-spike
    # at hour 23 (inside the next hour's baseline), then 12 at hour 24:
    # 12 is within 3 sigma of the spike-inflated z baseline but far
    # beyond 3 MAD of the median baseline.  (An alternating 4/6
    # baseline would give MAD=0 -- half the window sits exactly on the
    # median -- so the cycle includes the median value only 8/24 times.)
    for h in range(23):
        rows += [Row(event_type="A", ts=t0 + timedelta(hours=h))] * (4 + h % 3)
    rows += [Row(event_type="A", ts=t0 + timedelta(hours=23))] * 100
    rows += [Row(event_type="A", ts=t0 + timedelta(hours=24))] * 12
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        mad = {r.hour_id: r for r in q_mad_anomaly_hours(spark, "unused").collect()}
        zs = {r.hour_id: r for r in q_zscore_anomaly_hours(spark, "unused").collect()}
    finally:
        adv.load_tables = orig
    hours = sorted(mad)
    first, target = hours[0], hours[24]
    assert mad[first].is_anomaly is None  # warmup
    r = mad[target]
    # baseline window = hours 0..23: 8x4, 8x5, 7x6 and one 100
    # -> sorted index 12 -> median 5; deviations 8x0, 15x1, 95
    # -> MAD 1; dev = |12-5| = 7 > 3*1 -> flagged
    assert (r.med, r.mad, r.cnt, r.is_anomaly) == (5, 1, 12, 1)
    # the mean/sigma test is masked by the spike it ate: mean ~9,
    # sigma ~19 -> z(12) < 1 -> NOT flagged.  That contrast is the
    # operator's justification.
    assert zs[target].is_anomaly == 0


def test_snapshot_diff_hand_computed(spark):
    """Crafted keys hit every class: 97 deletes, 7 changes (priority
    AND totalprice), 101 spawns an added twin while itself staying
    unchanged, 1 stays unchanged."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_snapshot_diff

    mk = lambda k: Row(  # noqa: E731
        o_orderkey=k, o_orderpriority="1-URGENT", o_totalprice=10.0,
        o_orderstatus="O",
    )
    orders = spark.createDataFrame([mk(1), mk(7), mk(97), mk(101)])
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"orders": orders}
        r = q_snapshot_diff(spark, "unused").collect()[0]
    finally:
        ext.load_tables = orig
    assert (r.n_old, r.n_new) == (4, 4)  # one deleted, one added
    assert (r.n_added, r.n_deleted) == (1, 1)
    assert (r.n_changed, r.n_unchanged) == (1, 2)
    assert (r.n_changed_priority, r.n_changed_totalprice) == (1, 1)


def test_cumulative_unique_users_hand_computed(spark):
    """Returners don't re-count, gap days carry the running total
    flat, and the curve is monotone."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_cumulative_unique_users,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(user_id=1, ts=t0),                          # day 0: new
        Row(user_id=2, ts=t0),                          # day 0: new
        Row(user_id=1, ts=t0 + timedelta(days=1)),      # day 1: returner
        # day 2: nothing (gap)
        Row(user_id=3, ts=t0 + timedelta(days=3)),      # day 3: new
        Row(user_id=2, ts=t0 + timedelta(days=3)),      # day 3: returner
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = q_cumulative_unique_users(spark, "unused").collect()
    finally:
        adv.load_tables = orig
    assert [(r.new_users, r.cumulative_users) for r in got] == [
        (2, 2), (0, 2), (0, 2), (1, 3)
    ]


def test_revenue_concentration_hand_computed(spark):
    """Discrete rank cuts: with 10 customers, top-1% == top customer
    (k = ceil(0.01*10) = 1); ties on revenue break by custkey so the
    cut is deterministic."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_revenue_concentration,
    )

    # customer k has revenue 100*k except 9 and 10 tie at 1000
    rows = []
    for k in range(1, 9):
        rows.append(Row(o_custkey=k, o_totalprice=100.0 * k))
    rows += [Row(o_custkey=9, o_totalprice=1000.0),
             Row(o_custkey=10, o_totalprice=1000.0)]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"orders": df}
        r = q_revenue_concentration(spark, "unused").collect()[0]
    finally:
        adv.load_tables = orig
    total = sum(100.0 * k for k in range(1, 9)) + 2000.0  # 5600
    assert r.n_customers == 10
    assert r.total_revenue == total
    # top-1% -> k=1 -> the lower-custkey 1000 tie (custkey 9)
    assert r.top_1pct_revenue == 1000.0
    assert r.top_1pct_share == round_half_up(1000.0 / total, 4)
    # top-20% -> k=2 -> both 1000s
    assert r.top_20pct_revenue == 2000.0


def test_value_histogram_hand_computed(spark):
    """20 bins over fp range [100, 299] -> width 10 fp each; boundary
    values land on the integer-arithmetic side of each edge and empty
    bins still appear with zero counts."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_value_histogram,
    )

    # fp values: 100 (bin 0), 109 (bin 0: 9*20//200), 110 (bin 1),
    # 299 (bin 19: 199*20//200), plus a NULL that must be ignored
    vals = [1.00, 1.09, 1.10, 2.99, None]
    df = spark.createDataFrame([Row(value=v) for v in vals])
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.bin_id: r for r in q_value_histogram(spark, "unused").collect()}
    finally:
        adv.load_tables = orig
    assert len(got) == 20
    assert (got[0].n_values, got[0].sum_value_fp) == (2, 209)
    assert (got[1].n_values, got[1].sum_value_fp) == (1, 110)
    assert (got[19].n_values, got[19].sum_value_fp) == (1, 299)
    assert got[0].bin_lo == 1.00 and got[0].bin_hi == 1.10
    assert got[19].bin_hi == 3.00  # mn + 20*width == mx+1 fp
    assert all(got[b].n_values == 0 for b in range(2, 19))


def test_gapfill_interpolate_hand_computed(spark):
    """Interior gaps take the exact integer-weighted line between the
    neighboring observed hours; observed hours pass through unchanged;
    the odd-width gap exercises the integer division."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_gapfill_interpolate,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        # hour 0 observed: 100.00; hours 1,2 missing; hour 3: 400.00
        Row(ts=t0, event_type="purchase", value=100.0),
        Row(ts=t0 + timedelta(hours=3), event_type="purchase", value=400.0),
        # hour 4 missing; hour 5: 105.00 (odd split vs hour 3)
        Row(ts=t0 + timedelta(hours=5), event_type="purchase", value=105.0),
        # non-purchase rows must not create observed hours
        Row(ts=t0 + timedelta(hours=1), event_type="view", value=999.0),
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = q_gapfill_interpolate(spark, "unused").collect()
    finally:
        adv.load_tables = orig
    by_h = {r.hour_id - got[0].hour_id: r for r in got}
    assert len(got) == 6
    assert (by_h[0].revenue_fp, by_h[0].is_interpolated) == (10000, 0)
    assert (by_h[1].revenue_fp, by_h[1].is_interpolated) == (20000, 1)
    assert (by_h[2].revenue_fp, by_h[2].is_interpolated) == (30000, 1)
    assert (by_h[3].revenue_fp, by_h[3].is_interpolated) == (40000, 0)
    # hour 4: (40000*1 + 10500*1) div 2 = 25250 -> 252.50
    assert (by_h[4].revenue_fp, by_h[4].revenue) == (25250, 252.5)
    assert by_h[5].revenue_fp == 10500


def test_psi_value_drift_buckets_and_smoothing(spark):
    """Crafted stream pins the PSI rules: equal-width buckets over the
    GLOBAL min/max with the max value clamped into the top bucket, the
    midpoint-timestamp split, and the 1e-4 proportion floor for a
    bucket empty on one side."""
    import math
    from datetime import datetime

    import spark_streaming_postgres_lab2_spark.queries.advanced as advanced
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _PSI_FLOOR,
        q_psi_value_drift,
    )
    from pyspark.sql import Row

    def ts(minute):
        return datetime(2024, 1, 1, 0, minute, 0)

    # first half: minutes 0-3 (<= midpoint 6.5), second half: 10-13
    vals_a, vals_b = [5.0, 15.0, 15.0, 95.0], [5.0, 5.0, 95.0, 95.0]
    rows = [
        Row(event_id=i, ts=ts(i), user_id=1, event_type="view", value=v, props="{}")
        for i, v in enumerate(vals_a)
    ] + [
        Row(event_id=10 + i, ts=ts(10 + i), user_id=1, event_type="view", value=v, props="{}")
        for i, v in enumerate(vals_b)
    ]
    df = spark.createDataFrame(rows)
    orig = advanced.load_tables
    try:
        advanced.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.bucket: r for r in q_psi_value_drift(spark, "unused").collect()}
    finally:
        advanced.load_tables = orig

    # vmin=5, vmax=95: value 5 -> bucket 0, 15 -> bucket 1, 95 -> clamped 9
    assert set(got) == {0, 1, 9}
    assert (got[0].n_first, got[0].n_second) == (1, 2)
    assert (got[1].n_first, got[1].n_second) == (2, 0)
    assert (got[9].n_first, got[9].n_second) == (1, 2)
    psi = lambda pa, pb: round_half_up((pb - pa) * math.log(pb / pa), 4)
    assert got[0].psi_contrib == psi(0.25, 0.5)
    assert got[1].psi_contrib == psi(0.5, _PSI_FLOOR)   # empty side floored
    assert got[9].psi_contrib == psi(0.25, 0.5)

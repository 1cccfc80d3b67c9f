"""Property-based tests (hypothesis): the Spark validation chain agrees
with a pure-Python spec mirror on arbitrary events (the reference's
tier-1 'executable spec' pattern, upgraded from hand-picked cases to
randomized ones), plus invariants for migration, backoff, and the
generator."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_streaming_postgres_lab2_spark.operators.validate import (
    MAX_PRICE,
    MIN_PRICE,
    USER_REQUIRED_TAGS,
    VALID_EVENT_TYPES,
    validate,
)
from spark_streaming_postgres_lab2_spark.schema.registry import SchemaRegistry
from spark_streaming_postgres_lab2_spark.utils.retry import retry_with_backoff

from conftest import EVENT_V2_DDL, round_half_up


def python_spec_tag(ev: dict) -> str | None:
    """Pure-Python mirror of the first-match-wins rule chain
    (operators/validate.ecommerce_rules) -- the executable spec."""
    if ev["event_id"] is None:
        return "null_event_id"
    if ev["product_id"] is None:
        return "null_product_id"
    if ev["event_type"] is None:
        return "null_event_type"
    if ev["event_type"] not in VALID_EVENT_TYPES:
        return "invalid_event_type"
    for etype, tag in USER_REQUIRED_TAGS:
        if ev["event_type"] == etype and ev["user_id"] is None:
            return tag
    if ev["price"] is not None and ev["price"] < MIN_PRICE:
        return "negative_price"
    if ev["price"] is not None and ev["price"] > MAX_PRICE:
        return "extreme_price"
    if ev["event_type"] == "purchase" and ev["price"] is not None and ev["price"] <= 0:
        return "purchase_zero_price"
    if (
        ev["event_type"] not in ("purchase", "add_to_cart")
        and ev["price"] is not None
        and ev["price"] > 0
    ):
        return "non_purchase_has_price"
    return None


event_strategy = st.fixed_dictionaries(
    {
        "event_id": st.one_of(st.none(), st.text(min_size=1, max_size=12)),
        "user_id": st.one_of(st.none(), st.integers(1, 1000)),
        "event_type": st.one_of(
            st.none(),
            st.sampled_from(VALID_EVENT_TYPES + ["INVALID_TYPE", "bogus"]),
        ),
        "product_id": st.one_of(st.none(), st.integers(1, 500)),
        "price": st.one_of(
            st.none(),
            st.floats(-100.0, 20000.0, allow_nan=False, allow_infinity=False),
        ),
    }
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(event_strategy, min_size=1, max_size=30))
def test_spark_chain_matches_python_spec(spark, events):
    rows = [
        (
            ev["event_id"], ev["user_id"], "s", ev["event_type"], ev["product_id"],
            "books", ev["price"], 1, "new", "", "2024-01-01T00:00:00", "web",
        )
        for ev in events
    ]
    df = spark.createDataFrame(rows, schema=EVENT_V2_DDL)
    got = [r["validation_errors"] for r in validate(df).collect()]
    expected = [python_spec_tag(ev) for ev in events]
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(0, 6),
    st.floats(0.01, 10.0, allow_nan=False),
    st.floats(1.0, 4.0, allow_nan=False),
    st.floats(0.5, 100.0, allow_nan=False),
)
def test_backoff_schedule_invariants(max_retries, initial, factor, cap):
    delays: list[float] = []

    @retry_with_backoff(
        max_retries=max_retries, initial_delay=initial, backoff_factor=factor,
        max_delay=cap, sleep=delays.append,
    )
    def always_fails():
        raise ValueError("x")

    try:
        always_fails()
    except ValueError:
        pass
    assert len(delays) == max_retries
    assert all(d <= cap + 1e-9 for d in delays)
    # monotone non-decreasing until the cap bites
    for a, b in zip(delays, delays[1:]):
        assert b >= a - 1e-9 or a >= cap - 1e-9


def test_migration_always_yields_target_schema(spark):
    # any subset-projection of v2 that still contains v1's required
    # fields migrates to exactly the v2 column order
    reg = SchemaRegistry()
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("e", 1, "s", "view", 2, "books", 0.0, 1, "new", "", "t", "web")],
        schema=EVENT_V2_DDL,
    )
    v1_cols = [f.name for f in reg.get_schema("v1").fields]
    df = base.select(*v1_cols)
    out = reg.auto_migrate(df)
    assert out.columns == [f.name for f in reg.get_schema("v2").fields]
    assert out.count() == 1


# --- curation-family property tests (VERDICT r4 item 7) ----------------------
#
# The three newest oracle operators get randomized adversarial
# coverage: each Spark implementation must agree with the pure-Python
# spec mirrors in tests/mirrors.py (shared with the opt-in deep-fuzz
# tier) on arbitrary documents -- unicode tokens, empty docs,
# all-boilerplate docs, PII-only docs, policy-term floods.

import hashlib

from mirrors import py_boilerplate, py_filter_reason, py_pii

from spark_streaming_postgres_lab2_spark.queries.curation import (
    _BLOCK_N,
    boilerplate_doc_stats,
    filter_chain_classify,
    pii_redact_cols,
)

# small vocab makes shared 8-grams (boilerplate) and low diversity
# reachable; the unicode tokens exercise md5-over-UTF8 and regex
# boundaries
_VOCAB = ["alpha", "beta", "slow", "dup", "x", "héllo", "日本", "a1"]
_token = st.sampled_from(_VOCAB)
_doc_text = st.lists(_token, min_size=0, max_size=110).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc_text, min_size=1, max_size=20))
def test_filter_chain_matches_python_spec(spark, texts):
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)], "doc_id int, source string, text string"
    )
    got = {
        r["doc_id"]: r["reason"]
        for r in filter_chain_classify(df).select("doc_id", "reason").collect()
    }
    assert got == {i: py_filter_reason(t) for i, t in enumerate(texts)}


_pii_snippet = st.sampled_from(
    [
        "bob@corp.com",
        "x1@a.net",
        "@.com",            # no local part -> not a match
        "UPPER@CASE.COM",   # case-sensitive patterns -> not a match
        "1.2.3.4",
        "999.999.999.999",  # still four dotted runs -> matches
        "1.2.3",            # three runs -> no match
        "555-0000",
        "555-123",          # too short -> no match
        "555-12345",        # first four digits match
        "a@b.comx",         # trailing char after TLD still matches prefix
        "é@x.com",          # non-ascii local part -> only if ascii run exists
        "1.2.3.4@x.com",    # cross-category overlap: email wins the rewrite,
                            # but n_ips still counts the raw-text IP match
    ]
)
_pii_text = st.lists(st.one_of(_token, _pii_snippet), min_size=0, max_size=30).map(
    " ".join
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_pii_text, min_size=1, max_size=15))
def test_pii_redaction_matches_python_re(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    cols = pii_redact_cols(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            cols["n_emails"].alias("e"),
            cols["n_ips"].alias("i"),
            cols["n_phones"].alias("p"),
            cols["clean"].alias("clean"),
        ).collect()
    }
    for i, t in enumerate(texts):
        exp_e, exp_i, exp_p, exp_clean = py_pii(t)
        r = rows[i]
        assert (r["e"], r["i"], r["p"]) == (exp_e, exp_i, exp_p), (i, t)
        assert r["clean"] == exp_clean, (i, t)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc_text, min_size=1, max_size=14))
def test_boilerplate_dedup_matches_python_spec(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in docs], "doc_id int, source string, text string"
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_boilerplate"], r["kept_hash"])
        for r in boilerplate_doc_stats(df).collect()
    }
    assert got == py_boilerplate(docs)


def test_boilerplate_all_boilerplate_doc(spark):
    """A document consisting ONLY of blocks shared with another doc
    keeps nothing: kept_hash is md5 of the empty string on both paths."""
    block = " ".join(["w"] * _BLOCK_N)
    df = spark.createDataFrame(
        [(1, "s", block), (2, "s", block)], "doc_id int, source string, text string"
    )
    rows = {r["doc_id"]: r for r in boilerplate_doc_stats(df).collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    for did in (1, 2):
        assert rows[did]["n_blocks"] == 1
        assert rows[did]["n_boilerplate"] == 1
        assert rows[did]["kept_hash"] == empty_md5


# --- URL canonicalizer vs pure-Python mirror (r5) ------------------------------

from mirrors import py_canonical_url

_seg = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9._-]{0,8}", fullmatch=True)
_param = st.one_of(
    st.from_regex(r"utm_[a-z]{1,8}=[A-Za-z0-9_-]{0,6}", fullmatch=True),
    st.from_regex(r"[a-su-z][a-z]{0,5}=[A-Za-z0-9_-]{0,6}", fullmatch=True),
)


@st.composite
def _url(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTPS", "HtTp"]))
    host = ".".join(draw(st.lists(_seg, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":443", ":8080"]))
    path = "".join("/" + draw(_seg) for _ in range(draw(st.integers(0, 3))))
    slash = draw(st.sampled_from(["", "/"]))
    params = draw(st.lists(_param, min_size=0, max_size=3))
    query = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["", "#frag", "#a/b?c"]))
    return f"{scheme}://{host}{port}{path}{slash}{query}{frag}"


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_url(), min_size=1, max_size=25))
def test_canonicalize_url_matches_python_mirror(spark, urls):
    from pyspark.sql import functions as F

    from spark_streaming_postgres_lab2_spark.queries.curation import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", canonicalize_url(F.col("url")).alias("canon")
    )
    got = [r["canon"] for r in df.collect()]  # createDataFrame preserves order
    assert got == [py_canonical_url(u) for u in urls]


# --- round-5 fourth-session operators ----------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=40,
    )
)
def test_pagerank_invariants(spark, edges):
    """On arbitrary small graphs: total rank never exceeds the initial
    mass (integer division only loses), every vertex earns at least
    the teleport term, and the result is invariant under edge-list
    permutation (the point of the fixed-point formulation)."""
    from spark_streaming_postgres_lab2_spark.functions.graph import (
        PAGERANK_SCALE,
        pagerank_fixed_point,
    )

    node_ids = sorted({v for e in edges for v in e})
    nodes = spark.createDataFrame([(v,) for v in node_ids], "id long")
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = spark.createDataFrame(list(reversed(edges)), "src long, dst long")
    r1 = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(nodes, e1, iters=3).collect()}
    r2 = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(nodes, e2, iters=3).collect()}
    assert r1 == r2
    assert sum(r1.values()) <= PAGERANK_SCALE
    n = len(node_ids)
    teleport = (15 * (PAGERANK_SCALE // n)) // 100
    assert all(v >= teleport for v in r1.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=12,
    )
)
def test_snm_soundness(spark, tmp_path_factory, texts):
    """Every pair SNM emits really has token-set Jaccard >= 4/5
    (soundness -- blocking may MISS pairs, but must never fabricate
    one), with the jac column matching a Python recomputation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_sorted_neighborhood_dedup,
    )

    d = tmp_path_factory.mktemp("snm")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    toks = {i: {w for w in t.split(" ") if w} for i, t in enumerate(texts)}
    for r in q_sorted_neighborhood_dedup(spark, str(d)).collect():
        a, b = toks[r.doc_id_1], toks[r.doc_id_2]
        inter, union = len(a & b), len(a | b)
        assert 5 * inter >= 4 * union
        assert r.jac == round_half_up(inter / union, 4)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_version_accounting(spark, orders):
    """SCD2 invariants on arbitrary order streams: per customer,
    version count == number of priority CHANGES + 1, n_orders sums to
    the customer's order count, exactly one current version, and
    intervals chain without gaps."""
    from datetime import datetime, timedelta

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_scd2_priority_dim,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (k, cust, prio, t0 + timedelta(days=k))
        for k, (cust, prio) in enumerate(orders)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate timestamp"
    )
    orig = tm.load_tables
    try:
        tm.load_tables = lambda _s, _d, _t: {"orders": df}
        out = q_scd2_priority_dim(spark, "x").collect()
    finally:
        tm.load_tables = orig

    by_cust: dict = {}
    for k, (cust, prio) in enumerate(orders):
        by_cust.setdefault(cust, []).append(prio)  # already in (date, key) order
    for cust, prios in by_cust.items():
        changes = 1 + sum(1 for a, b in zip(prios, prios[1:]) if a != b)
        vers = sorted((r for r in out if r.custkey == cust), key=lambda r: r.version)
        assert len(vers) == changes
        assert sum(r.n_orders for r in vers) == len(prios)
        assert [r.is_current for r in vers] == [0] * (len(vers) - 1) + [1]
        for a, b in zip(vers, vers[1:]):
            assert a.valid_to == b.valid_from
        assert vers[-1].valid_to is None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(0, 20),
        st.sets(st.integers(1, 8), min_size=1, max_size=5),
        min_size=1,
        max_size=15,
    )
)
def test_market_basket_matches_itertools_mirror(spark, baskets):
    """Pair counts, per-item counts, and lift match a pure-Python
    recomputation on arbitrary baskets."""
    from itertools import combinations

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_market_basket,
    )

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

    n = len(baskets)
    item = {}
    pair = {}
    for ps in baskets.values():
        for p in ps:
            item[p] = item.get(p, 0) + 1
        for a, b in combinations(sorted(ps), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    # the query emits the top-30 by count; with <= 15 baskets of <= 5
    # items the pair space is < 30, so the output is the FULL set
    assert set(got) == set(pair)
    for (a, b), cnt in pair.items():
        r = got[(a, b)]
        assert (r.pair_count, r.count_a, r.count_b) == (cnt, item[a], item[b])
        assert r.lift == round_half_up(cnt * n / (item[a] * item[b]), 4)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 300), st.integers(0, 6)), min_size=1,
             max_size=30, unique_by=lambda t: t[0])
)
def test_gdpr_audit_matches_python_mirror(spark, custs):
    """Cascade deletion scope reconciles with a Python recomputation
    on arbitrary customer/order/lineitem shapes."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        _GDPR_MOD,
        q_gdpr_erasure_audit,
    )

    cust_rows = [Row(c_custkey=k) for k, _ in custs]
    order_rows = []
    li_rows = []
    okey = 0
    for k, n_orders in custs:
        for _ in range(n_orders):
            order_rows.append(Row(o_orderkey=okey, o_custkey=k))
            li_rows += [Row(l_orderkey=okey, l_partkey=j) for j in range(okey % 3)]
            okey += 1
    cust = spark.createDataFrame(cust_rows)
    orders = (spark.createDataFrame(order_rows) if order_rows
              else spark.createDataFrame([], "o_orderkey long, o_custkey long"))
    li = (spark.createDataFrame(li_rows) if li_rows
          else spark.createDataFrame([], "l_orderkey long, l_partkey long"))
    orig = tm.load_tables
    try:
        tm.load_tables = lambda _s, _d, _t: {
            "customer": cust, "orders": orders, "lineitem": li
        }
        got = {r.table_name: r for r in q_gdpr_erasure_audit(spark, "x").collect()}
    finally:
        tm.load_tables = orig

    victims = {k for k, _ in custs if k % _GDPR_MOD == 0}
    doomed_orders = {r.o_orderkey for r in order_rows if r.o_custkey in victims}
    doomed_lines = sum(1 for r in li_rows if r.l_orderkey in doomed_orders)
    assert (got["customer"].rows_to_delete, got["customer"].total_rows) == (
        len(victims), len(cust_rows))
    assert (got["orders"].rows_to_delete, got["orders"].total_rows) == (
        len(doomed_orders), len(order_rows))
    assert (got["lineitem"].rows_to_delete, got["lineitem"].total_rows) == (
        doomed_lines, len(li_rows))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(st.integers(0, 4000), min_size=1, max_size=60))
def test_fuzzy_linkage_always_finds_parent(spark, keys):
    """Every sampled dirty record's TRUE PARENT is always reachable
    (same block, distance 1), so best_distance <= 1 and the emitted
    set covers exactly the sampled keys."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _LINK_SAMPLE_MOD,
        q_fuzzy_record_linkage,
    )

    df = spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"Customer#{k:09d}", c_nationkey=k % 5)
         for k in keys]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"customer": df}
        got = {r.dirty_key: r for r in q_fuzzy_record_linkage(spark, "x").collect()}
    finally:
        ext.load_tables = orig
    sampled = {k for k in keys if k % _LINK_SAMPLE_MOD == 0}
    assert set(got) == sampled
    for k, r in got.items():
        assert r.best_distance <= 1
        assert r.n_candidates >= 1


# --- statistics batch (r6, VERDICT r5 item 6) ---------------------------------
#
# The r5 hypothesis passes found real bugs in exactly this family
# (GDPR empty-cascade NULL, winsorized 1-ulp boundary flip at sf1);
# property-mirror the three statistics operators entering the r6
# driver window before rotation.  Adversarial shapes requested by the
# verdict: single-value types, all-null value columns, one-arm A/B
# splits.


def _events_frame(spark, rows, ddl):
    from pyspark.sql import Row

    return spark.createDataFrame([Row(**r) for r in rows], ddl)


_iqr_value = st.one_of(
    st.sampled_from([0.0, 1.0, 1.5, -2.25, 100.0]),  # force duplicates/ties
    st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
    st.none(),  # all-null value columns must drop out, not throw
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["A", "B"]), _iqr_value), min_size=1, max_size=40))
def test_iqr_outlier_summary_matches_mirror(spark, rows):
    """Tukey-fence counts match a pure-Python mirror of the discrete
    rank selection (k = ceil(p*n) via integer div) and the double
    fence arithmetic -- including single-value types (IQR = 0, zero
    outliers) and types whose values are all NULL (absent rows)."""
    import math

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_iqr_outlier_summary,
    )

    df = _events_frame(
        spark,
        [{"event_type": t, "value": v} for t, v in rows],
        "event_type string, value double",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.event_type: r for r in q_iqr_outlier_summary(spark, "unused").collect()}
    finally:
        adv.load_tables = orig

    by_type: dict = {}
    for t, v in rows:
        if v is not None:
            by_type.setdefault(t, []).append(v)
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        n = len(vals)
        s = sorted(vals)
        q1 = s[(1 * n + 3) // 4 - 1]
        q3 = s[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        hi, lo = q3 + 1.5 * iqr, q1 - 1.5 * iqr
        r = got[t]
        assert r.n_values == n
        assert r.n_hi == sum(v > hi for v in vals)
        assert r.n_lo == sum(v < lo for v in vals)
        if n == 1:
            assert (r.n_hi, r.n_lo) == (0, 0)  # fence == the value itself
        assert math.isfinite(r.hi_rate) and 0.0 <= r.hi_rate <= 1.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(1, 20),
            st.sampled_from(["purchase", "page_view", "signup"]),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from(["mixed", "all_even", "all_odd"]),
)
def test_ab_test_conversion_matches_mirror(spark, rows, arm_shape):
    """Per-arm counts are exact integers vs a pure-Python mirror; with
    a ONE-ARM split (every user_id even or odd) the empty arm reports
    n = 0, NULL rate/z, and significant = 0 -- no division error, no
    dropped summary row."""
    import math

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_ab_test_conversion,
    )

    if arm_shape == "all_even":
        rows = [(u * 2, e) for u, e in rows]
    elif arm_shape == "all_odd":
        rows = [(u * 2 + 1, e) for u, e in rows]
    df = _events_frame(
        spark,
        [{"user_id": u, "event_type": e} for u, e in rows],
        "user_id bigint, event_type string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        out = q_ab_test_conversion(spark, "unused").collect()
    finally:
        adv.load_tables = orig
    assert len(out) == 1
    r = out[0]

    conv: dict = {}
    for u, e in rows:
        conv[u] = conv.get(u, 0) or int(e == "purchase")
    n_a = sum(1 for u in conv if u % 2 == 0)
    n_b = sum(1 for u in conv if u % 2 == 1)
    conv_a = sum(c for u, c in conv.items() if u % 2 == 0)
    conv_b = sum(c for u, c in conv.items() if u % 2 == 1)
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n_a, conv_a, n_b, conv_b)
    if n_a == 0 or n_b == 0:
        # one-arm split: no rates/z for the empty side, flag stays 0
        assert r.z is None
        assert r.significant == 0
        assert (r.rate_a is None) == (n_a == 0)
        assert (r.rate_b is None) == (n_b == 0)
    else:
        p1, p2 = conv_a / n_a, conv_b / n_b
        ppool = (conv_a + conv_b) / (n_a + n_b)
        denom = math.sqrt(ppool * (1 - ppool) * (1 / n_a + 1 / n_b))
        if denom == 0.0:
            assert r.z is None  # all-converted or none-converted pool
            assert r.significant == 0
        else:
            z = (p1 - p2) / denom
            assert abs(r.z - z) < 1e-3  # rounded(4) vs exact
            assert r.significant == int(abs(r.z) >= 1.96)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 25)),
        st.integers(1, 5),
        min_size=1,
        max_size=30,
    )
)
def test_forecast_baseline_matches_mirror(spark, day_counts):
    """Seasonal-naive / persistence absolute-error sums match a
    pure-Python replay of the gap-filled spine + lag scoring --
    including sparse series with gaps (gap days count 0) and series
    shorter than the seasonal lag (type absent from the output)."""
    from datetime import datetime, timedelta

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _FC_EVAL,
        _FC_SEASON,
        q_forecast_baseline,
    )

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for (t, day), cnt in day_counts.items():
        rows += [{"event_type": t, "ts": t0 + timedelta(days=day)}] * cnt
    df = _events_frame(spark, rows, "event_type string, ts timestamp")
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.event_type: r for r in q_forecast_baseline(spark, "unused").collect()}
    finally:
        adv.load_tables = orig

    # mirror: global spine [min_day, max_day], per-type dense counts
    all_days = [d for (_t, d) in day_counts]
    mn, mx = min(all_days), max(all_days)
    types = {t for (t, _d) in day_counts}
    for t in types:
        dense = {d: 0 for d in range(mn, mx + 1)}
        for (tt, d), c in day_counts.items():
            if tt == t:
                dense[d] = c
        days = list(range(mn, mx + 1))
        scored = [
            (dense[d], dense[d - _FC_SEASON], dense[d - 1])
            for d in days
            if d - _FC_SEASON >= mn and d > mx - _FC_EVAL
        ]
        if not scored:
            assert t not in got
            continue
        r = got[t]
        assert r.n_days == len(scored)
        assert r.sum_abs_err_seasonal == sum(abs(c - s) for c, s, _ in scored)
        assert r.sum_abs_err_persist == sum(abs(c - p) for c, _, p in scored)


# --- round 6, second session: histogram / interpolation / BFS mirrors --------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_value_histogram_matches_python_mirror(spark, values):
    """Bin membership, counts, and fixed-point sums match a pure-Python
    replay of the integer bin arithmetic; every value lands in exactly
    one of the 20 bins (conservation) including single-value inputs."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_value_histogram,
    )

    import math

    fps = [int(math.floor(v * 100 + 0.5)) for v in values]
    mn, mx = min(fps), max(fps)
    exp_n = [0] * 20
    exp_s = [0] * 20
    for fp in fps:
        b = ((fp - mn) * 20) // (mx - mn + 1)
        exp_n[b] += 1
        exp_s[b] += fp
    df = spark.createDataFrame([Row(value=float(v)) for v in values])
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = q_value_histogram(spark, "unused").collect()
    finally:
        adv.load_tables = orig
    assert [r.n_values for r in got] == exp_n
    assert [r.sum_value_fp for r in got] == exp_s
    assert sum(exp_n) == len(values)  # conservation


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=20),   # hour offsets observed
        st.integers(min_value=0, max_value=10_000_00),  # revenue fp
        min_size=1,
        max_size=12,
    )
)
def test_gapfill_interpolate_matches_python_mirror(spark, observed):
    """Every spine hour appears exactly once; observed hours pass
    through; every gap hour equals the integer-weighted line between
    its neighboring observed hours."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_gapfill_interpolate,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        Row(ts=t0 + timedelta(hours=h), event_type="purchase",
            value=fp / 100.0)
        for h, fp in observed.items()
    ]
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = q_gapfill_interpolate(spark, "unused").collect()
    finally:
        adv.load_tables = orig
    hours = sorted(observed)
    lo, hi = hours[0], hours[-1]
    assert len(got) == hi - lo + 1
    base = got[0].hour_id
    for r in got:
        h = r.hour_id - base + lo
        if h in observed:
            assert (r.revenue_fp, r.is_interpolated) == (observed[h], 0)
        else:
            pt = max(x for x in hours if x < h)
            nt = min(x for x in hours if x > h)
            pv, nv = observed[pt], observed[nt]
            exp = (pv * (nt - h) + nv * (h - pt)) // (nt - pt)
            assert (r.revenue_fp, r.is_interpolated) == (exp, 1)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=40,
    ),
    st.sets(st.integers(0, 14), min_size=1, max_size=3),
)
def test_bfs_hops_matches_python_bfs(spark, edge_list, seed_set):
    """Distributed frontier BFS equals a textbook Python BFS on random
    directed multigraphs with self-loops and duplicate edges."""
    from collections import deque

    from spark_streaming_postgres_lab2_spark.functions.graph import bfs_hops

    n, depth = 15, 6
    adj: dict[int, set[int]] = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
    exp = {v: -1 for v in range(n)}
    dq = deque()
    for s in seed_set:
        exp[s] = 0
        dq.append(s)
    while dq:
        v = dq.popleft()
        if exp[v] >= depth:
            continue
        for w in adj.get(v, ()):
            if exp[w] == -1:
                exp[w] = exp[v] + 1
                dq.append(w)
    nodes = spark.range(n).select("id")
    edges = spark.createDataFrame(
        [(s, d) for s, d in edge_list], "src long, dst long"
    )
    seeds = nodes.filter(nodes["id"].isin(*seed_set))
    got = {r.id: r.hop for r in bfs_hops(nodes, edges, seeds, depth=depth).collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# round_half_up: the test-suite mirror of Spark's F.round on doubles
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=40,
    ),
    st.integers(0, 6),
)
def test_round_half_up_matches_spark_round(spark, values, ndigits):
    """One Spark job per example batch: the conftest mirror must agree
    with ``F.round`` on arbitrary finite doubles -- including the
    magnitudes (|x| >= ~1e24) that used to raise InvalidOperation in
    the Decimal-based mirror (ADVICE r8) and the >=1e58 band where
    quantize overflows even at prec=60 and rounding is the identity."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r.r for r in df.select(F.round("x", ndigits).alias("r")).collect()
    ]
    exp = [round_half_up(v, ndigits) for v in values]
    assert got == exp


def test_round_half_up_huge_magnitudes_are_identity():
    for v in (1e24, -1e24, 1e58, -1e58, 1e308, -1e308):
        for nd in (0, 2, 6):
            assert round_half_up(v, nd) == v


# --- shard_manifest vs pure-Python mirror (round 9) ---------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),   # doc_id
            st.integers(min_value=0, max_value=9000),    # n_chars
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_shard_manifest_matches_mirror_on_random_corpora(spark, docs_spec):
    """Property: for ARBITRARY (doc_id, n_chars) corpora -- including
    zero-length docs and docs bigger than the shard budget -- the
    engine's (bucket, shard_id) manifest equals a pure-Python replay
    of the spec (md5 bucket route, (md5, doc_id) pack order,
    floor(cum-before / budget))."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _N_SHARD_BUCKETS,
        _SHARD_CHARS,
        q_shard_manifest,
    )

    expected: dict[tuple, list] = defaultdict(lambda: [0, 0])
    per_bucket: dict[int, list] = defaultdict(list)
    for i, n in docs_spec:
        k = hashlib.md5(str(i).encode()).hexdigest()
        per_bucket[int(k[:15], 16) % _N_SHARD_BUCKETS].append((k, i, n))
    for b, members in per_bucket.items():
        cum = 0
        for k, i, n in sorted(members):
            sid = cum // _SHARD_CHARS
            expected[(b, sid)][0] += 1
            expected[(b, sid)][1] += n
            cum += n

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text="t", n_chars=n) for i, n in docs_spec]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = q_shard_manifest(spark, "unused").collect()
    finally:
        corpus.load_tables = orig

    got = {(r.bucket, r.shard_id): [r.n_docs, r.shard_chars] for r in rows}
    assert got == dict(expected)


# --- duplicate_ngrams vs pure-Python mirror (round 9) --------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "x"])
_dup_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_dup_text, min_size=1, max_size=12))
def test_duplicate_ngrams_matches_python_mirror(spark, texts):
    """Property: on arbitrary small corpora (a 5-word alphabet forces
    gram collisions; lengths straddle the 8-token short-doc boundary)
    the census equals a pure-Python replay of the spec -- same gram
    extraction, distinct-doc and occurrence counts, >= 2-doc filter,
    and (n_docs desc, n_occurrences desc, gram) top-K order."""
    from collections import Counter, defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _DUP_NGRAM_N,
        _DUP_TOP_K,
        q_duplicate_ngrams,
    )

    def grams(text: str) -> list[str]:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return []
        if len(toks) < _DUP_NGRAM_N:
            return [" ".join(toks)]
        return [
            " ".join(toks[i : i + _DUP_NGRAM_N])
            for i in range(len(toks) - _DUP_NGRAM_N + 1)
        ]

    occ: Counter = Counter()
    docs_of: dict[str, set] = defaultdict(set)
    for i, text in enumerate(texts):
        for g in grams(text):
            occ[g] += 1
            docs_of[g].add(i)
    expected = sorted(
        (
            (g, len(docs_of[g]), occ[g])
            for g in occ
            if len(docs_of[g]) >= 2
        ),
        key=lambda t: (-t[1], -t[2], t[0]),
    )[:_DUP_TOP_K]

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t) for i, t in enumerate(texts)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = [
            (r.gram, r.n_docs, r.n_occurrences)
            for r in q_duplicate_ngrams(spark, "unused").collect()
        ]
    finally:
        corpus.load_tables = orig
    assert got == expected


# --- bpe_apply_compression vs pure-Python mirror (round 9) ---------------------

_bpe_word = st.sampled_from(["banana", "anna", "aaaa", "bb", "cab", "z"])
_bpe_text = st.lists(_bpe_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_bpe_text, min_size=1, max_size=6))
def test_bpe_apply_matches_python_mirror(spark, texts):
    """Property: the full BPE encode (merge derivation from weighted
    pair counts, priority-ordered leftmost non-overlapping application
    with atomic placeholder symbols, per-source accounting) equals a
    pure-Python replay on arbitrary corpora over a repetition-heavy
    word alphabet."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BPE_PLACE,
        _BPE_R,
        q_bpe_apply_compression,
    )

    toks = [
        (f"s{i % 2}", w)
        for i, text in enumerate(texts)
        for w in text.split(" ")
        if w
    ]
    vocab = Counter(w for _, w in toks)
    pairs: Counter = Counter()
    for w, wc in vocab.items():
        if len(w) >= 2:
            for j in range(len(w) - 1):
                pairs[w[j : j + 2]] += wc
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_R]
    seg = {}
    for w in vocab:
        s = w
        for rk, (pair, _) in enumerate(ranked, 1):
            s = s.replace(pair, _BPE_PLACE[rk - 1])
        seg[w] = s
    expected = {}
    for src in sorted({s for s, _ in toks}):
        ws = [w for s, w in toks if s == src]
        before = sum(len(w) for w in ws)
        after = sum(len(seg[w]) for w in ws)
        expected[src] = (
            len(ws), before, after, round_half_up(after / before, 4)
        )

    df = spark.createDataFrame(
        [
            Row(doc_id=i, source=f"s{i % 2}", text=t)
            for i, t in enumerate(texts)
        ]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {
            r.source: (r.n_tokens, r.symbols_before, r.symbols_after,
                       r.compression_ratio)
            for r in q_bpe_apply_compression(spark, "unused").collect()
        }
    finally:
        curation.load_tables = orig
    assert got == expected


# --- substring_dedup_cut vs pure-Python mirror (round 9) -----------------------

_cut_text = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_cut_text, min_size=1, max_size=10))
def test_substring_dedup_cut_matches_python_mirror(spark, texts):
    """Property: the cut stage equals a pure-Python replay of the spec
    on arbitrary corpora over a 3-letter token alphabet (dense gram
    collisions, heavy window overlap, lengths straddling the 8-token
    short-doc boundary) -- same first-occurrence rule (min (doc_id,
    pos)), same interval-union accounting."""
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _DUP_NGRAM_N,
        q_substring_dedup_cut,
    )

    def occs(text):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return [], 0
        n = len(toks)
        if n < _DUP_NGRAM_N:
            return [(" ".join(toks), 1, n)], n
        w = _DUP_NGRAM_N
        return (
            [(" ".join(toks[i : i + w]), i + 1, i + w) for i in range(n - w + 1)],
            n,
        )

    per_doc = {i: occs(t) for i, t in enumerate(texts)}
    first: dict = {}
    docs_of: dict = defaultdict(set)
    for i in sorted(per_doc):
        for g, pos, _end in per_doc[i][0]:
            docs_of[g].add(i)
            if g not in first or (i, pos) < first[g]:
                first[g] = (i, pos)
    dup = {g for g in docs_of if len(docs_of[g]) >= 2}

    total = removed = 0
    for i in sorted(per_doc):
        entries, n = per_doc[i]
        total += n
        cuts = sorted(
            (pos, end)
            for g, pos, end in entries
            if g in dup and first[g] != (i, pos)
        )
        covered = 0
        prev_end = 0
        for pos, end in cuts:
            covered += max(0, end - max(prev_end, pos - 1))
            prev_end = max(prev_end, end)
        removed += covered

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t) for i, t in enumerate(texts)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = q_substring_dedup_cut(spark, "unused").collect()
    finally:
        corpus.load_tables = orig

    assert len(rows) == 1
    r = rows[0]
    assert (r.total_tokens, r.removed_tokens) == (total, removed)
    if total:
        assert r.retained_ratio == round_half_up(1 - removed / total, 4)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_cut_text, min_size=1, max_size=10))
def test_substring_dedup_cut_fast_equivalence_property(spark, texts):
    """Property (round 10): on arbitrary dense-collision corpora the
    capped flavor with a cap no corpus of this size can exceed is
    bit-identical to the exact operator, and a deliberately tiny cap
    never removes MORE than the exact operator (deterministic lower
    bound), with total_tokens/n_docs accounting unchanged."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_substring_dedup_cut,
        q_substring_dedup_cut_fast,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t) for i, t in enumerate(texts)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        exact = q_substring_dedup_cut(spark, "u").collect()[0]
        # 10 docs x <=14 tokens: no gram can occur more than 70 times
        uncapped = q_substring_dedup_cut_fast(spark, "u", max_occ=200).collect()[0]
        tiny = q_substring_dedup_cut_fast(spark, "u", max_occ=2).collect()[0]
    finally:
        corpus.load_tables = orig

    assert tuple(uncapped) == tuple(exact)
    assert tiny.removed_tokens <= exact.removed_tokens
    assert (tiny.n_docs, tiny.total_tokens) == (exact.n_docs, exact.total_tokens)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=3 * 256 * 1024),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_compaction_plan_matches_python_mirror(spark, sizes):
    """Property (round 10, hardening the round's headline fix): the
    bin-packing planner equals a pure-Python replay of the spec --
    cumulative bytes BEFORE each file, integer-divided by the target,
    partitioned per source in doc_id order -- on random inventories
    whose file sizes straddle the bin boundary (0..3x target)."""
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _COMPACT_TARGET,
        q_compaction_plan,
    )

    rows = [
        Row(doc_id=i, source=src, n_chars=n)
        for i, (src, n) in enumerate(sizes)
    ]
    expected: dict = defaultdict(lambda: [0, 0, None, None])
    cum: dict = defaultdict(int)
    for r in rows:  # doc_id order == generation order
        bin_id = cum[r.source] // _COMPACT_TARGET
        cum[r.source] += r.n_chars
        e = expected[(r.source, bin_id)]
        e[0] += 1
        e[1] += r.n_chars
        e[2] = r.doc_id if e[2] is None else min(e[2], r.doc_id)
        e[3] = r.doc_id if e[3] is None else max(e[3], r.doc_id)

    df = spark.createDataFrame(rows)
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {
            (r.source, r.bin_id): (r.n_files, r.total_bytes, r.first_doc, r.last_doc)
            for r in q_compaction_plan(spark, "u").collect()
        }
    finally:
        ext.load_tables = orig

    assert got == {k: tuple(v) for k, v in expected.items()}


def test_psi_degenerate_constant_value_agrees_cross_engine(spark):
    """Crafted pin: when every measurement is identical the bucket
    expression divides by zero -- Spark's NULL-skipping least() and
    DuckDB's NaN-is-greatest least() both land the rows in bucket 9,
    a lucky-but-load-bearing convergence this test freezes."""
    import duckdb
    import pandas as pd

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        ORACLE_PSI_DRIFT,
        q_psi_value_drift,
    )

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                 "2024-01-01 02:00:00"]
            ),
            "user_id": [1, 2, 3],
            "event_type": ["a"] * 3,
            "value": [5.0, 5.0, 5.0],
            "props": ["{}"] * 3,
        }
    )
    df = spark.createDataFrame(pdf)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        srows = [tuple(r) for r in q_psi_value_drift(spark, "u").collect()]
    finally:
        adv.load_tables = orig
    con = duckdb.connect()
    con.register("events", pdf)
    drows = [tuple(r) for r in con.sql(ORACLE_PSI_DRIFT).fetchall()]
    assert srows == drows == [(9, 2, 1, 0.0)]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),     # ts offset sec
            st.integers(min_value=-50, max_value=50),       # value * 0.5
        ),
        min_size=2,
        max_size=40,
    )
)
def test_psi_value_drift_matches_python_mirror(spark, events):
    """Property: the PSI drift gate equals a pure-Python replay of the
    spec (global-width buckets in the same IEEE evaluation order,
    BIGINT midpoint split, 1e-4 floor) on random streams.  Counts and
    buckets compare EXACTLY; the ln-based contribution compares to the
    displayed 4-decimal precision (the docstring's libm caveat)."""
    import math
    from collections import defaultdict

    import pandas as pd

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _PSI_BUCKETS,
        _PSI_FLOOR,
        q_psi_value_drift,
    )

    base_us = 1_704_067_200_000_000  # 2024-01-01 in epoch micros
    us = [base_us + sec * 1_000_000 for sec, _ in events]
    vals = [half * 0.5 for _, half in events]

    # pure-Python replay, same expression order as both engines
    us_min, us_max = min(us), max(us)
    v_min, v_max = min(vals), max(vals)
    mid = (us_min + us_max) // 2
    counts: dict = defaultdict(lambda: [0, 0])
    for u, v in zip(us, vals):
        if v_max == v_min:
            b = _PSI_BUCKETS - 1  # the pinned degenerate convergence
        else:
            b = min(
                int(math.floor((v - v_min) * _PSI_BUCKETS / (v_max - v_min))),
                _PSI_BUCKETS - 1,
            )
        counts[b][0 if u <= mid else 1] += 1
    tot_a = sum(a for a, _ in counts.values())
    tot_b = sum(b for _, b in counts.values())
    expected = {}
    for b, (na, nb) in counts.items():
        pa = max(na / tot_a if tot_a else 0.0, _PSI_FLOOR)
        pb = max(nb / tot_b if tot_b else 0.0, _PSI_FLOOR)
        expected[b] = (na, nb, (pb - pa) * math.log(pb / pa))

    pdf = pd.DataFrame(
        {
            "event_id": range(len(us)),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": [1] * len(us),
            "event_type": ["a"] * len(us),
            "value": vals,
            "props": ["{}"] * len(us),
        }
    )
    df = spark.createDataFrame(pdf)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.bucket: r for r in q_psi_value_drift(spark, "u").collect()}
    finally:
        adv.load_tables = orig

    assert {b: (r.n_first, r.n_second) for b, r in got.items()} == {
        b: (na, nb) for b, (na, nb, _) in expected.items()
    }
    for b, (_, _, psi) in expected.items():
        assert abs(got[b].psi_contrib - round_half_up(psi, 4)) <= 1e-4 + 1e-12


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]), _cut_text),
        min_size=1,
        max_size=12,
    )
)
def test_source_overlap_matrix_matches_python_mirror(spark, docs):
    """Property: the join-free bounded-set pair expansion equals a
    pure-Python replay (distinct grams shared per source pair) on
    random multi-source corpora over a dense 3-letter alphabet --
    the third opinion alongside the DuckDB self-join oracle, on
    inputs the fixture can't shape."""
    from collections import defaultdict
    from itertools import combinations

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _DUP_NGRAM_N,
        q_source_overlap_matrix,
    )

    def grams(text):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return set()
        if len(toks) < _DUP_NGRAM_N:
            return {" ".join(toks)}
        w = _DUP_NGRAM_N
        return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}

    srcs_of: dict = defaultdict(set)
    for src, text in docs:
        for g in grams(text):
            srcs_of[g].add(src)
    expected: dict = defaultdict(int)
    for g, srcs in srcs_of.items():
        for a, b in combinations(sorted(srcs), 2):
            expected[(a, b)] += 1

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(docs)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {
            (r.source_a, r.source_b): r.n_shared_ngrams
            for r in q_source_overlap_matrix(spark, "u").collect()
        }
    finally:
        corpus.load_tables = orig
    assert got == dict(expected)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=100_000_000),  # cents
        min_size=1,
        max_size=60,
    ).filter(lambda cs: any(c > 0 for c in cs))
)
def test_benford_digit_audit_matches_python_mirror(spark, cents):
    """Property: the Benford first-digit audit equals a pure-Python
    replay (fixed-point floor, first char of the BIGINT string,
    share/deviation arithmetic) on random amounts spanning five
    orders of magnitude, including non-positive amounts the filter
    must drop."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _BENFORD_EXPECTED,
        q_benford_digit_audit,
    )

    vals = [c / 100.0 for c in cents]
    counts = Counter(
        int(str(math.floor(v * 10000 + 0.5))[0]) for v in vals if v > 0
    )
    total = sum(counts.values())
    expected = {
        d: (
            n,
            round_half_up(n / total, 4),
            _BENFORD_EXPECTED[d],
            round_half_up(abs(n / total - _BENFORD_EXPECTED[d]), 4),
        )
        for d, n in counts.items()
    }

    df = spark.createDataFrame(
        [Row(o_orderkey=i, o_totalprice=v) for i, v in enumerate(vals)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"orders": df}
        got = {
            r.digit: (r.n, r.share, r.benford_expected, r.abs_deviation)
            for r in q_benford_digit_audit(spark, "u").collect()
        }
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=48),                 # hour offset
        st.lists(st.integers(min_value=0, max_value=1_000_000),  # cents
                 min_size=1, max_size=3),
        min_size=1,
        max_size=12,
    )
)
def test_gapfill_interpolate_matches_python_mirror(spark, by_hour):
    """Property: the linear gap interpolation equals a pure-Python
    replay of the spec (fixed-point observed sums, clock spine,
    integer-weighted mean with truncating div) on random sparse
    hourly series -- gap widths and endpoint values are arbitrary, so
    every integer-division branch is exercised."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_gapfill_interpolate,
    )

    base_us = 1_704_067_200_000_000  # 2024-01-01, an exact hour boundary
    obs = {h: sum(cs) for h, cs in by_hour.items()}  # cents == fp at *100
    mn, mx = min(obs), max(obs)
    hours = sorted(obs)
    expected = {}
    for t in range(mn, mx + 1):
        if t in obs:
            fp = obs[t]
            interp = 0
        else:
            pt = max(h for h in hours if h < t)
            nt = min(h for h in hours if h > t)
            pv, nv = obs[pt], obs[nt]
            fp = (pv * (nt - t) + nv * (t - pt)) // (nt - pt)
            interp = 1
        expected[t] = (fp, round_half_up(fp / 100.0, 2), interp)

    from datetime import datetime, timezone

    def ts_at(hour):
        us = base_us + hour * 3_600_000_000
        return datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(
            tzinfo=None  # session tz is pinned UTC; naive == UTC wall time
        )

    rows = []
    i = 0
    for h, cs in by_hour.items():
        for c in cs:
            rows.append(
                Row(event_id=i, ts=ts_at(h), user_id=1,
                    event_type="purchase", value=c / 100.0, props="{}")
            )
            i += 1
    # a non-purchase row inside the window must be ignored entirely
    rows.append(
        Row(event_id=i, ts=ts_at(mn), user_id=1, event_type="view",
            value=9.99, props="{}")
    )
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            r.hour_id - base_us // 3_600_000_000:
                (r.revenue_fp, r.revenue, r.is_interpolated)
            for r in q_gapfill_interpolate(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=40)),   # (type, hour)
        st.integers(min_value=1, max_value=3),               # events in hour
        min_size=1,
        max_size=20,
    )
)
def test_mad_anomaly_hours_matches_python_mirror(spark, occupancy):
    """Property: the median/MAD anomaly flags equal a pure-Python
    replay of the spec -- dense per-type spine over the global hour
    range, trailing-24 lower-median (rank (c+1) div 2), MAD as the
    lower median of |x - med|, warmup NULL, zero-MAD any-deviation
    rule -- on random sparse streams whose window contents are
    arbitrary.  A shared Spark/DuckDB misreading of the rank selection
    would pass the oracle hash but fail this mirror."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _ZS_WINDOW,
        q_mad_anomaly_hours,
    )

    base_us = 1_704_067_200_000_000
    base_h = base_us // 3_600_000_000
    cnts: dict = {}
    for (etype, h), n in occupancy.items():
        cnts[(etype, h)] = cnts.get((etype, h), 0) + n
    mn = min(h for _, h in cnts)
    mx = max(h for _, h in cnts)
    types = sorted({etype for etype, _ in cnts})

    def lower_median(xs):
        if not xs:
            return None
        return sorted(xs)[(len(xs) + 1) // 2 - 1]

    expected = {}
    for etype in types:
        series = [cnts.get((etype, h), 0) for h in range(mn, mx + 1)]
        for i, cnt in enumerate(series):
            win = series[max(0, i - _ZS_WINDOW):i]
            c = len(win)
            med = lower_median(win)
            mad = lower_median([abs(x - med) for x in win]) if win else None
            dev = abs(cnt - med) if med is not None else None
            if c < _ZS_WINDOW:
                flag = None
            elif dev == 0:
                flag = 0
            elif dev > 3 * mad:
                flag = 1
            else:
                flag = 0
            rz = (
                round_half_up(dev / (mad * 1.4826), 4)
                if c >= _ZS_WINDOW and mad and mad > 0
                else None
            )
            expected[(etype, mn + i)] = (cnt, med, mad, rz, flag)

    rows = []
    i = 0
    for (etype, h), n in cnts.items():
        us = base_us + h * 3_600_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        for _ in range(n):
            rows.append(Row(event_id=i, ts=ts, user_id=1, event_type=etype,
                            value=1.0, props="{}"))
            i += 1
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            (r.event_type, r.hour_id - base_h):
                (r.cnt, r.med, r.mad, r.robust_z, r.is_anomaly)
            for r in q_mad_anomaly_hours(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


# --- round 11 mirror batch: chunking / packing / quantization / TF-IDF ---------
#
# Same third-opinion class as the r10 batch: pure-Python spec replays
# on hypothesis-generated inputs, catching a SHARED Spark/DuckDB spec
# misreading that the oracle hash cannot (both engines would agree on
# the wrong answer).

_chunk_text = st.text(alphabet=["a", "b", " "], min_size=0, max_size=240)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_chunk_text, min_size=1, max_size=6))
def test_doc_chunks_matches_python_mirror(spark, texts):
    """Property: 64/16 context-window chunking equals a pure-Python
    replay on arbitrary texts -- including empty tokens (consecutive
    spaces survive F.split exactly like str.split(' ')), the
    n_tok <= overlap single-chunk floor, and stride boundaries."""
    import hashlib
    import math

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _CHUNK,
        _OVERLAP,
        _STRIDE,
        q_doc_chunks,
    )

    expected = []
    for i, text in enumerate(texts):
        toks = text.split(" ")  # java split(re, -1) keeps trailing empties too
        n_tok = len(toks)
        n_chunks = max(1, math.ceil((n_tok - _OVERLAP) / _STRIDE))
        for cid in range(n_chunks):
            chunk = toks[cid * _STRIDE : cid * _STRIDE + _CHUNK]
            expected.append(
                (i, cid, len(chunk),
                 hashlib.md5(" ".join(chunk).encode()).hexdigest())
            )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_doc_chunks(spark, "u").collect()]
    finally:
        corpus.load_tables = orig
    assert got == expected


_pack_tokens = st.integers(min_value=0, max_value=1400)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2"]), _pack_tokens),
                min_size=1, max_size=12))
def test_sequence_packing_matches_python_mirror(spark, docs_spec):
    """Property: greedy 512-token packing accounting equals a
    pure-Python replay -- pack_id = cumulative-tokens-BEFORE // 512 in
    stable doc_id order per source, including docs longer than the
    context (they still occupy the pack their cumsum lands in) and
    zero-token docs (a text of n spaces has n+1 empty tokens -- we
    generate real token runs so n_tok is exact)."""
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _CTX,
        q_sequence_packing,
    )

    rows = [
        Row(doc_id=i, source=src, text=" ".join(["t"] * n) if n else "x",
            lang="en", n_chars=n)
        for i, (src, n) in enumerate(docs_spec)
    ]
    # n=0 is remapped to the 1-token text "x": F.split never yields an
    # empty array, so the real operator's minimum is 1 token -- the
    # mirror must count what split counts
    n_toks = [max(1, n) for _, n in docs_spec]

    per_source = defaultdict(list)  # source -> [(doc_id, n_tok)]
    for i, (src, _) in enumerate(docs_spec):
        per_source[src].append((i, n_toks[i]))
    expected = {}
    for src, docs in per_source.items():
        docs.sort()
        cum, pack_ids, total = 0, [], 0
        for _, n in docs:
            pack_ids.append(cum // _CTX)
            cum += n
            total += n
        n_packs = max(pack_ids) + 1
        expected[src] = (
            len(docs), total, n_packs,
            round_half_up(total / (n_packs * _CTX), 4),
        )

    df = spark.createDataFrame(rows)
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {
            r.source: (r.n_docs, r.total_tokens, r.n_packs, r.fill_ratio)
            for r in q_sequence_packing(spark, "u").collect()
        }
    finally:
        corpus.load_tables = orig
    assert got == expected


# elements are multiples of 1/8 up to 125: exactly representable in
# float32, so the f32 storage cast costs nothing and the mirror's
# double arithmetic replays Spark's bit-for-bit (per-vector fold order
# is the array order on both sides)
_q_elem = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 8.0)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from([0, 1]),
                          st.lists(_q_elem, min_size=1, max_size=8)),
                min_size=1, max_size=10))
def test_embedding_quantize_matches_python_mirror(spark, vecs):
    """Property: symmetric int8 quantization (scale = max|x|/127,
    q = floor(x/scale + 0.5), zero-vector scale 1.0) and the
    reconstruction-error accounting equal a pure-Python replay.
    q_max/q_min/n_vectors compare exactly; avg_sq_error compares to
    the UNROUNDED mirror mean within 5e-7 (half the 6-decimal rounding
    grid): Spark's cross-row avg order is nondeterministic, so exact
    equality on the rounded value would be flaky at a grid tie, while
    a formula error moves the value by whole grid steps."""
    import math
    from collections import defaultdict

    import pytest

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_embedding_quantize,
    )

    per_label = defaultdict(lambda: {"n": 0, "errs": [], "qmax": [], "qmin": []})
    for label, vec in vecs:
        m = max(abs(x) for x in vec)
        s = m / 127.0 if m > 0 else 1.0
        q = [math.floor(x / s + 0.5) for x in vec]
        acc = 0.0
        for x, qi in zip(vec, q):
            acc = acc + (x - qi * s) ** 2
        g = per_label[label]
        g["n"] += 1
        g["errs"].append(acc)
        g["qmax"].append(max(q))
        g["qmin"].append(min(q))

    df = spark.createDataFrame(
        [(i, vec, label) for i, (label, vec) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"embeddings": df}
        got = {r.label: r for r in q_embedding_quantize(spark, "u").collect()}
    finally:
        corpus.load_tables = orig

    assert set(got) == set(per_label)
    for label, g in per_label.items():
        r = got[label]
        assert (r.n_vectors, r.q_max, r.q_min) == (
            g["n"], max(g["qmax"]), min(g["qmin"])
        )
        assert r.avg_sq_error == pytest.approx(
            sum(g["errs"]) / g["n"], abs=5e-7
        )


_tfidf_text = st.lists(
    st.sampled_from(["w1", "w2", "w3", "w4", ""]), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_tfidf_text, min_size=1, max_size=8))
def test_tfidf_top_terms_matches_python_mirror(spark, texts):
    """Property: per-doc top-3 TF-IDF equals a pure-Python replay --
    tf = in-doc count, idf = ln(N/df) with N counting ALL documents
    (token-less docs included), ranking on the ROUNDED score with
    term-ASC tie-break.  The tiny 4-word vocabulary forces dense df
    collisions and rank ties, the exact class where a shared
    misreading of the weighting or tie rule would hide."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _TFIDF_K,
        q_tfidf_top_terms,
    )

    tokenized = [[t for t in text.split(" ") if t != ""] for text in texts]
    n_docs = len(texts)
    tf = {i: Counter(toks) for i, toks in enumerate(tokenized)}
    df_ = Counter(term for c in tf.values() for term in c)
    expected = []
    for i in range(n_docs):
        scored = sorted(
            (
                (-round_half_up(cnt * math.log(n_docs / df_[term]), 4), term)
                for term, cnt in tf[i].items()
            ),
        )
        for rank, (neg_score, term) in enumerate(scored[:_TFIDF_K], start=1):
            expected.append((i, rank, term, tf[i][term], df_[term], -neg_score))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_tfidf_top_terms(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


# --- round 11 mirror batch, part 2: sweep-line / winsorized / OLS ---------------

_sc_offset = st.integers(min_value=0, max_value=3 * 86_400_000_000)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from([1, 2, 3]), _sc_offset),
                min_size=1, max_size=14))
def test_session_concurrency_matches_python_mirror(spark, events_spec):
    """Property: the SEGMENTED sweep (per-day windows + day-spine
    carry-in) equals a single global pure-Python sweep on random
    multi-day event sets -- sessionization gap rule, closed-interval
    point ordering (+1 before -1 at equal timestamps), midnight
    carry-in, all replayed independently.  Random timestamps straddle
    day boundaries, the segmented logic's exact risk area."""
    from datetime import date, timedelta

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.functions.sessions import (
        SESSION_GAP_US,
    )
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_session_concurrency,
    )

    base = 1_700_000_000_000_000  # fixed anchor, mid-day UTC
    rows = [(i, uid, base + off) for i, (uid, off) in enumerate(events_spec)]

    # pure-Python replay: sessionize -> intervals -> global sweep
    per_user = {}
    for eid, uid, t in rows:
        per_user.setdefault(uid, []).append((t, eid))
    points = []
    for evs in per_user.values():
        evs.sort()
        cur = [evs[0][0]]
        for (t, _), (pt, _) in zip(evs[1:], evs):
            if t - pt > SESSION_GAP_US:
                points.append((cur[0], 1))
                points.append((cur[-1], -1))
                cur = [t]
            else:
                cur.append(t)
        points.append((cur[0], 1))
        points.append((cur[-1], -1))
    points.sort(key=lambda p: (p[0], -p[1]))  # starts before ends at ties
    run, day_max = 0, {}
    for t, d in points:
        run += d
        day = date(1970, 1, 1) + timedelta(days=t // 86_400_000_000)
        day_max[day] = max(day_max.get(day, run), run)

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, t_us long"
    ).select("event_id", "user_id", SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.day: r.max_concurrent for r in q_session_concurrency(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == day_max


# values are multiples of 0.25: the 1e-4 fixed-point floor and every
# clamp compare are then exact double operations on both sides
_w_value = st.one_of(
    st.none(), st.integers(min_value=-400, max_value=400).map(lambda v: v / 4.0)
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["A", "B"]), _w_value),
                min_size=1, max_size=20))
def test_winsorized_value_stats_matches_python_mirror(spark, specs):
    """Property: discrete-rank winsorization equals a pure-Python
    replay -- k = ceil(p*n) integer rank selection of ACTUAL elements
    (never interpolation), strict-compare clip counts, fixed-point
    winsorized mean -- on random per-type value sets with nulls."""
    import math

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_winsorized_value_stats,
    )

    by_type = {}
    for et, v in specs:
        if v is not None:
            by_type.setdefault(et, []).append(v)
    expected = {}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        k_lo = (1 * n + 99) // 100   # ceil(0.01 n)
        k_hi = (99 * n + 99) // 100  # ceil(0.99 n)
        p01, p99 = vals[k_lo - 1], vals[k_hi - 1]
        fp = sum(math.floor(min(max(v, p01), p99) * 10000 + 0.5) for v in vals)
        expected[et] = (
            n,
            round_half_up(p01, 4),
            round_half_up(p99, 4),
            sum(1 for v in vals if v < p01),
            sum(1 for v in vals if v > p99),
            round_half_up((fp / 10000.0) / n, 4),
        )

    df = spark.createDataFrame(
        [(i, et, v) for i, (et, v) in enumerate(specs)],
        "event_id long, event_type string, value double",  # explicit:
        # an all-null value column defeats schema inference
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            r.event_type: (r.n_values, r.p01, r.p99, r.n_clip_lo,
                           r.n_clip_hi, r.winsorized_mean)
            for r in q_winsorized_value_stats(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


_ols_line = st.tuples(
    st.sampled_from([1, 2]),                              # order key
    st.integers(min_value=1, max_value=9999).map(lambda v: v / 100.0),  # price
    st.sampled_from([0.0, 0.05, 0.1]),                    # discount
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_ols_line, min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(0, 23), st.sampled_from([1, 2])),
                min_size=2, max_size=2))
def test_ols_trend_matches_python_mirror(spark, lines, order_months):
    """Property: the integer-exact OLS slope (num = n*Sxy - Sx*Sy,
    den = n*Sxx - Sx^2 over fixed-point monthly revenue) equals a
    pure-Python replay on random line items spread over random months
    -- including the single-month NULL-slope degenerate and the
    fixed-point floor applied per ROW before the monthly sum."""
    import math
    from collections import defaultdict
    from datetime import date

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import q_ols_trend

    # two orders, each pinned to a (month, customer); customers map to
    # two nations so slopes aggregate independently per nation
    odate = {
        ok: date(2024 + mo // 12, mo % 12 + 1, 15)
        for ok, (mo, _) in zip((1, 2), order_months)
    }
    ocust = {ok: cust for ok, (_, cust) in zip((1, 2), order_months)}
    cust_nation = {1: 10, 2: 20}
    nation_name = {10: "ALPHA", 20: "BETA"}

    monthly = defaultdict(int)  # (nation, month_idx) -> fixed-point revenue
    for ok, price, disc in lines:
        m = odate[ok].year * 12 + odate[ok].month
        nat = nation_name[cust_nation[ocust[ok]]]
        monthly[(nat, m)] += math.floor(price * (1 - disc) * 10000 + 0.5)
    expected = {}
    for nat in sorted({k[0] for k in monthly}):
        cells = sorted((m, y) for (n, m), y in monthly.items() if n == nat)
        m0 = cells[0][0]
        xs = [m - m0 for m, _ in cells]
        ys = [y for _, y in cells]
        n = len(cells)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        slope = round_half_up(num / den / 10000.0, 4) if den > 0 else None
        expected[nat] = (n, num, den, slope)

    lineitem = spark.createDataFrame(
        [Row(l_orderkey=ok, l_extendedprice=p, l_discount=d)
         for ok, p, d in lines]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=ok, o_custkey=ocust[ok], o_orderdate=odate[ok])
         for ok in (1, 2)]
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=c, c_nationkey=nk) for c, nk in cust_nation.items()]
    )
    nation = spark.createDataFrame(
        [Row(n_nationkey=nk, n_name=nm) for nk, nm in nation_name.items()]
    )
    tables = {"lineitem": lineitem, "orders": orders,
              "customer": customer, "nation": nation}
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: tables
        got = {
            r.nation: (r.n_months, r.slope_num, r.slope_den, r.slope_per_month)
            for r in q_ols_trend(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


# --- round 11 mirror batch, part 3: funnel / transition matrix -----------------

# a coarse timestamp grid makes equal-timestamp collisions common, so
# the (ts, event_id) tiebreak and the strictly-after funnel compare
# are actually exercised
_fun_t = st.integers(min_value=0, max_value=40).map(lambda v: v * 4_000_000_000)
_fun_ev = st.tuples(
    st.sampled_from([1, 2, 3, None]),
    st.sampled_from(["signup", "view", "purchase", "other"]),
    _fun_t,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_fun_ev, min_size=1, max_size=16))
def test_funnel_conversion_matches_python_mirror(spark, events_spec):
    """Property: the strict ORDERED, WINDOWED funnel (each step
    strictly after the previous step's earliest qualifying time AND
    within 24h of it) equals a pure-Python replay -- the rule class
    with the most plausible misreadings (presence-only, non-strict
    compare, window anchored at first event instead of previous step,
    later-step-before-earlier ordering) on random event streams where
    null users and window-straddling gaps are common."""
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _FUNNEL_WINDOW_S,
        q_funnel_conversion,
    )
    import spark_streaming_postgres_lab2_spark.queries.advanced as adv

    win = _FUNNEL_WINDOW_S * 1_000_000
    users = {u for u, _, _ in events_spec if u is not None}

    def step_min(etype, prev):
        out = {}
        for u, et, t in events_spec:
            if u is None or et != etype or u not in prev:
                continue
            if prev[u] is not None and prev[u][0] < t <= prev[u][0] + win:
                if u not in out or t < out[u]:
                    out[u] = t
        return {u: (t,) for u, t in out.items()}

    s1 = {}
    for u, et, t in events_spec:
        if u is not None and et == "signup" and (u not in s1 or t < s1[u][0]):
            s1[u] = (t,)
    s2 = step_min("view", s1)
    s3 = step_min("purchase", s2)

    def rate(a, b):
        return round_half_up(a / b, 4) if b else None

    expected = (
        len(users), len(s1), len(s2), len(s3),
        rate(len(s2), len(s1)), rate(len(s3), len(s2)),
    )

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(i, u, et, t) for i, (u, et, t) in enumerate(events_spec)],
        "event_id long, user_id long, event_type string, t_us long",
    ).select("event_id", "user_id", "event_type",
             SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = tuple(q_funnel_conversion(spark, "u").collect()[0])
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from([1, 2, None]),
                          st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=0, max_value=5)),
                min_size=1, max_size=14))
def test_event_transitions_matches_python_mirror(spark, events_spec):
    """Property: the per-user transition matrix equals a pure-Python
    replay -- consecutive pairs in (ts, event_id) order (the coarse
    0..5 timestamp grid forces heavy ties, so the event_id tiebreak
    carries the ordering), null users dropped, per-from probabilities
    on the rounded grid."""
    from collections import Counter, defaultdict

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_event_transitions,
    )

    per_user = defaultdict(list)
    for i, (u, et, t) in enumerate(events_spec):
        if u is not None:
            per_user[u].append((t, i, et))
    pairs = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    totals = Counter()
    for (a, _), n in pairs.items():
        totals[a] += n
    expected = {
        (a, b): (n, round_half_up(n / totals[a], 4))
        for (a, b), n in pairs.items()
    }

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(i, u, et, t * 1_000_000) for i, (u, et, t) in enumerate(events_spec)],
        "event_id long, user_id long, event_type string, t_us long",
    ).select("event_id", "user_id", "event_type",
             SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            (r.from_type, r.to_type): (r.n_transitions, r.transition_prob)
            for r in q_event_transitions(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


# --- round 11 mirror batch, part 4: cohort retention / as-of attribution -------

_coh_t = st.integers(min_value=0, max_value=20 * 86_400).map(
    lambda s: s * 1_000_000
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from([1, 2, 3, None]), _coh_t),
                min_size=1, max_size=16))
def test_cohort_retention_matches_python_mirror(spark, events_spec):
    """Property: the (cohort_day x offset_week) retention matrix
    equals a pure-Python replay -- first-seen-day cohorting, integer
    day/week arithmetic (epoch_us DIV 86.4e9, offset DIV 7), distinct
    user-day de-dup -- on random multi-week streams with null users."""
    from collections import defaultdict

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_cohort_retention,
    )

    day_us = 86_400_000_000
    user_days = defaultdict(set)
    for u, t in events_spec:
        if u is not None:
            user_days[u].add(t // day_us)
    cohort = {u: min(ds) for u, ds in user_days.items()}
    retained = defaultdict(set)  # (cohort_day, offset_week) -> users
    for u, ds in user_days.items():
        for d in ds:
            retained[(cohort[u], (d - cohort[u]) // 7)].add(u)
    sizes = defaultdict(int)
    for u, c in cohort.items():
        sizes[c] += 1
    expected = {
        (c, w): (sizes[c], len(us), round_half_up(len(us) / sizes[c], 4))
        for (c, w), us in retained.items()
    }

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(events_spec)],
        "event_id long, user_id long, t_us long",
    ).select("event_id", "user_id", SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            (r.cohort_day, r.offset_week):
                (r.cohort_size, r.retained_users, r.retention_rate)
            for r in q_cohort_retention(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


# 250 ms grid: attribution lags are then exact multiples of 0.25 s, so
# the cross-row average is an exactly-representable sum divided by a
# small int -- deterministic under any aggregation order
_att_t = st.integers(min_value=0, max_value=400).map(lambda v: v * 250_000)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from([1, 2]),
                          st.sampled_from(["view", "purchase", "other"]),
                          _att_t),
                min_size=1, max_size=14))
def test_purchase_attribution_matches_python_mirror(spark, events_spec):
    """Property: the as-of attribution (each purchase takes the user's
    most recent STRICTLY-PRIOR view in the total (ts, event_id) order
    -- a same-timestamp view with a smaller event_id counts) equals a
    pure-Python sweep, including unattributed purchases (NULL lag) and
    users with no purchases (absent rows)."""
    from collections import defaultdict

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import (
        q_purchase_attribution,
    )

    per_user = defaultdict(list)
    for i, (u, et, t) in enumerate(events_spec):
        per_user[u].append((t, i, et))
    expected = {}
    for u, evs in per_user.items():
        evs.sort()
        last_view, purchases, lags = None, 0, []
        for t, _, et in evs:
            if et == "purchase":
                purchases += 1
                if last_view is not None:
                    lags.append((t - last_view) / 1_000_000.0)
            if et == "view":
                last_view = t
        if purchases:
            avg = round_half_up(sum(lags) / len(lags), 2) if lags else None
            expected[u] = (purchases, len(lags), avg)

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(i, u, et, t) for i, (u, et, t) in enumerate(events_spec)],
        "event_id long, user_id long, event_type string, t_us long",
    ).select("event_id", "user_id", "event_type",
             SF.timestamp_micros("t_us").alias("ts"))
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {
            r.user_id: (r.purchases, r.attributed_purchases, r.avg_lag_seconds)
            for r in q_purchase_attribution(spark, "u").collect()
        }
    finally:
        core.load_tables = orig
    assert got == expected


_rep_text = st.text(alphabet=["a", "b", " "], min_size=0, max_size=40)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_rep_text, min_size=1, max_size=8))
def test_doc_repetition_matches_python_mirror(spark, texts):
    """Property: the Gopher repetition signals equal a pure-Python
    replay on arbitrary texts -- crucially the asymmetric tokenizers
    (token stats count EMPTY tokens from the raw single-space split;
    bigram shingles run over the FILTERED stream with the short-doc
    whole-text rule) and the inner join that drops documents with no
    bigram stream at all."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_doc_repetition

    expected = {}
    for i, text in enumerate(texts):
        raw = text.split(" ")  # unfiltered: empties count as tokens
        ftk = [t for t in raw if t]
        if not ftk:
            continue  # no bigram row -> doc dropped by the inner join
        if len(ftk) < 2:
            bigrams = [" ".join(ftk)]
        else:
            bigrams = [" ".join(ftk[j:j + 2]) for j in range(len(ftk) - 1)]
        tc, bc = Counter(raw), Counter(bigrams)
        n, d, top = len(raw), len(tc), max(tc.values())
        bn, btop = len(bigrams), max(bc.values())
        expected[i] = (
            n,
            round_half_up(d / n, 4),
            round_half_up(top / n, 4),
            round_half_up(btop / bn, 4),
        )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            r.doc_id: (r.n_tokens, r.distinct_ratio,
                       r.top_token_frac, r.top_bigram_frac)
            for r in q_doc_repetition(spark, "u").collect()
        }
    finally:
        ext.load_tables = orig
    assert got == expected


# cross-language stopword collisions ("de" is es+fr, "la"/"un" are
# es+fr) plus noise: argmax ties and the min-hits floor fire constantly
_lang_tok = st.sampled_from(
    ["the", "and", "der", "und", "el", "que", "le", "les",
     "de", "la", "un", "zzz", "q7"]
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_lang_tok, min_size=0, max_size=10).map(" ".join),
                min_size=1, max_size=8))
def test_doc_language_matches_python_mirror(spark, texts):
    """Property: the stopword-argmax language ID equals a pure-Python
    replay -- per-language hit counts over the raw token stream, the
    min-hits 'unknown' floor, and the deterministic first-language-
    reaching-the-max tie-break (STOPWORDS insertion order) -- on texts
    built from cross-language stopword collisions."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.functions.text import STOPWORDS
    from spark_streaming_postgres_lab2_spark.queries.ext import q_doc_language

    def guess(text: str) -> str:
        toks = text.split(" ")
        scores = {lang: sum(1 for t in toks if t in ws)
                  for lang, ws in STOPWORDS.items()}
        best = max(scores.values())
        if best < 2:
            return "unknown"
        for lang in STOPWORDS:  # first language reaching the max wins
            if scores[lang] == best:
                return lang
        return "unknown"

    labels = ["en", "de", "es", "fr"]
    expected = Counter(
        (labels[i % 4], guess(t)) for i, t in enumerate(texts)
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang=labels[i % 4], n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            (r.lang, r.lang_guess): r.n_docs
            for r in q_doc_language(spark, "u").collect()
        }
    finally:
        ext.load_tables = orig
    assert got == dict(expected)


# --- round 11 mirror batch, part 3: split / zipf / snapshot ---------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 100_000),
                          st.sampled_from(["en", "de", "fr"]),
                          st.integers(0, 5000)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_train_eval_split_matches_python_mirror(spark, docs_spec):
    """Property: the md5-prefix 80/10/10 split manifest equals a
    hashlib replay -- first 8 hex chars of md5(str(doc_id)) against
    the two string cutoffs, then (split, lang) doc/char rollups.  A
    third hash implementation (Python hashlib vs Spark codegen vs the
    DuckDB oracle) pins the routing rule itself."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _SPLIT_TRAIN_HI,
        _SPLIT_VAL_HI,
        q_train_eval_split,
    )

    expected: dict = defaultdict(lambda: [0, 0])
    for doc_id, lang, n_chars in docs_spec:
        prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        split = ("train" if prefix < _SPLIT_TRAIN_HI
                 else "val" if prefix < _SPLIT_VAL_HI else "test")
        e = expected[(split, lang)]
        e[0] += 1
        e[1] += n_chars

    docs = spark.createDataFrame(
        [Row(doc_id=d, source="s", text="t", lang=lang, n_chars=n)
         for d, lang, n in docs_spec]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            (r.split, r.lang): (r.n_docs, r.total_chars)
            for r in q_train_eval_split(spark, "u").collect()
        }
    finally:
        corpus.load_tables = orig
    assert got == {k: tuple(v) for k, v in expected.items()}


# 60-word vocabulary > _TOPK_TERMS = 50: the limit-50 boundary cut on
# (count DESC, term ASC) fires with dense count ties on every example
_zipf_tok = st.sampled_from([f"w{i:02d}" for i in range(60)])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_zipf_tok, min_size=0, max_size=30).map(" ".join),
                min_size=1, max_size=10))
def test_zipf_top_terms_matches_python_mirror(spark, texts):
    """Property: the Zipf top-50 (rank, share, cumulative share)
    equals a Counter replay -- top-K cut and rank both on
    (count DESC, term ASC), shares as HALF_UP-rounded doubles over the
    exact BIGINT cumulative sums."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _TOPK_TERMS,
        q_zipf_top_terms,
    )

    counts = Counter(t for text in texts for t in text.split(" ") if t != "")
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK_TERMS]
    expected, cum = [], 0
    for rank, (term, cnt) in enumerate(top, start=1):
        cum += cnt
        expected.append((rank, term, cnt,
                         round_half_up(cnt / total, 6),
                         round_half_up(cum / total, 6)))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_zipf_top_terms(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 800),
                          st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
                          st.floats(0.0, 1e6, allow_nan=False, allow_infinity=False),
                          st.sampled_from(["O", "F", "P"])),
                min_size=1, max_size=60, unique_by=lambda t: t[0]))
def test_snapshot_diff_matches_python_mirror(spark, orders_spec):
    """Property: the snapshot classifier equals a dict replay of the
    derived mutation (delete % 97, change % 7 with the exact +1.50
    double, add % 101 into the offset key space) and the null-safe
    per-column comparison.  Key 0 exercises the delete+add composition
    (deleted from the new snapshot yet cloned into the added space)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _SNAP_ADD_OFFSET,
        q_snapshot_diff,
    )

    old = {k: (pr, tp, stt) for k, pr, tp, stt in orders_spec}
    new = {}
    for k, (pr, tp, stt) in old.items():
        if k % 97 != 0:
            new[k] = (("9-CHANGED" if k % 7 == 0 else pr),
                      (tp + 1.5 if k % 7 == 0 else tp), stt)
    for k, row in old.items():
        if k % 101 == 0:
            new[k + _SNAP_ADD_OFFSET] = row
    common = old.keys() & new.keys()
    chg_pr = sum(1 for k in common if old[k][0] != new[k][0])
    chg_tp = sum(1 for k in common if old[k][1] != new[k][1])
    chg = sum(1 for k in common if old[k] != new[k])
    expected = (len(old), len(new),
                len(new.keys() - old.keys()), len(old.keys() - new.keys()),
                chg, len(common) - chg, chg_pr, chg_tp)

    orders = spark.createDataFrame(
        [Row(o_orderkey=k, o_orderpriority=pr, o_totalprice=tp, o_orderstatus=stt)
         for k, pr, tp, stt in orders_spec]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"orders": orders}
        got = tuple(q_snapshot_diff(spark, "u").collect()[0])
    finally:
        ext.load_tables = orig
    assert got == expected


_rfp_tok = st.sampled_from(["a", "bb", "ccc", "d4", "x"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_rfp_tok, min_size=0, max_size=9).map(" ".join),
                min_size=1, max_size=10))
def test_doc_rolling_fingerprint_matches_python_mirror(spark, texts):
    """Property: the portable rolling fingerprint equals a pure-Python
    replay -- 60-bit md5-prefix token hashes, 3-token windows combined
    with WRAPPING signed-64 multiply-add (Python: true-integer product
    mod 2^64, two's-complement fold), zero-padding past the end, min
    over max(1, n-2) windows, NULL for token-less docs.  A third
    implementation of the wrap emulation the DuckDB oracle does with
    HUGEINT residues."""
    import hashlib

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.functions.text import _RFP_C
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_doc_rolling_fingerprint,
    )

    mask = 1 << 64

    def fp(text: str) -> int | None:
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            return None
        th = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        wins = []
        for i in range(max(len(th) - 2, 1)):
            v = (th[i] * _RFP_C[0]
                 + (th[i + 1] if i + 1 < len(th) else 0) * _RFP_C[1]
                 + (th[i + 2] if i + 2 < len(th) else 0) * _RFP_C[2]) % mask
            wins.append(v - mask if v >= (1 << 63) else v)
        return min(wins)

    expected = [(i, fp(t)) for i, t in enumerate(texts)]

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_doc_rolling_fingerprint(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


# 2-word alphabet: 8-token blocks collide constantly, so keep-first
# fires beyond the synthetic self-append the operator guarantees
_idd_tok = st.sampled_from(["p", "q"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_idd_tok, min_size=0, max_size=40).map(" ".join),
                min_size=1, max_size=8))
def test_intra_doc_dedup_matches_python_mirror(spark, texts):
    """Property: the within-document block dedup equals a Python
    replay -- block-aligned truncation + first-8-token self-append,
    keep-FIRST per repeated md5 block hash, kept_hash over surviving
    block hashes in position order, sub-8-token docs excluded."""
    import hashlib

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BLOCK_N,
        q_intra_doc_dedup,
    )

    expected = {}
    for i, text in enumerate(texts):
        t0 = [t for t in text.split(" ") if t != ""]
        tk = t0[: len(t0) // _BLOCK_N * _BLOCK_N] + t0[:_BLOCK_N]
        nb = len(tk) // _BLOCK_N
        if nb == 0:
            continue
        bhs = [hashlib.md5(" ".join(tk[j * _BLOCK_N:(j + 1) * _BLOCK_N]).encode())
               .hexdigest() for j in range(nb)]
        seen, kept = set(), []
        for bh in bhs:
            if bh not in seen:
                seen.add(bh)
                kept.append(bh)
        expected[i] = (nb, nb - len(kept),
                       hashlib.md5("|".join(kept).encode()).hexdigest())

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.doc_id: (r.n_blocks, r.n_repeats, r.kept_hash)
               for r in q_intra_doc_dedup(spark, "u").collect()}
    finally:
        curation.load_tables = orig
    assert got == expected


_bm25_tok = st.sampled_from(
    ["hash", "join", "vector", "scan", "slow", "merge", "batch",
     "customer", "order", "filter", "column", "zz1", "zz2"]
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_bm25_tok, min_size=0, max_size=12).map(" ".join),
                min_size=1, max_size=10))
def test_bm25_search_matches_python_mirror(spark, texts):
    """Property: BM25 top-5 per query equals a pure-Python replay --
    Lucene idf ln(1+(N-df+0.5)/(df+0.5)) with N counting ALL documents
    (token-less included), length norm over avgdl of TOKENIZED docs
    only, HALF_UP-rounded summed score, rank ties on doc_id ASC.
    Texts drawn from the literal query vocabulary (plus fillers), with
    duplicate docs forcing exact score ties."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERIES,
        _BM25_TOPK,
        q_bm25_search,
    )

    tokenized = {i: [t for t in text.split(" ") if t != ""]
                 for i, text in enumerate(texts)}
    tf = {i: Counter(toks) for i, toks in tokenized.items() if toks}
    df_ = Counter(term for c in tf.values() for term in c)
    dl = {i: sum(c.values()) for i, c in tf.items()}
    n_docs = len(texts)
    avgdl = sum(dl.values()) / len(dl) if dl else None

    by_query: dict = {}
    for query_id, term in _BM25_QUERIES:
        by_query.setdefault(query_id, []).append(term)
    mirror: dict = {}  # query_id -> sorted [(-rounded_score, doc, nhit)]
    for query_id in sorted(by_query):
        scored = []
        for i, c in tf.items():
            hit = [t for t in by_query[query_id] if c[t] > 0]
            if not hit:
                continue
            score = sum(
                math.log(1 + (n_docs - df_[t] + 0.5) / (df_[t] + 0.5))
                * (c[t] * (1 + _BM25_K1))
                / (c[t] + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[i] / avgdl))
                for t in hit
            )
            scored.append((-round_half_up(score, 4), i, len(hit)))
        mirror[query_id] = sorted(scored)

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_bm25_search(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    # Scores match the mirror to within one rounding step: Spark's SUM
    # adds join-output rows in plan order while the mirror sums in
    # query-term order, so a score within 1 ulp of an x.xxxx5 boundary
    # can legitimately round one 1e-4 step apart (the production
    # docstring's own caveat; the oracle hash pins the exact value).
    # ADVICE r11: the RANKING built on those rounded scores inherits
    # the same ambiguity -- two docs whose rounded scores are within
    # one step may flip order (or swap across the top-k boundary)
    # between Spark and the mirror.  So ordering is asserted via
    # rounded-score EQUIVALENCE CLASSES (chain-merged at the same
    # 1e-4 tolerance): class order must be respected and every class
    # strictly above the last emitted one fully included; within a
    # class either order is accepted, while the doc_id ASC tiebreak is
    # still pinned on the Spark side for exactly-equal emitted scores.
    step = 1e-4 + 1e-9
    got_by_q: dict = {}
    for row in got:
        got_by_q.setdefault(row[0], []).append(row)
    assert set(got_by_q) <= set(mirror)
    for query_id, cands in mirror.items():
        g = got_by_q.get(query_id, [])
        assert len(g) == min(_BM25_TOPK, len(cands))
        assert [r for (_q, r, _d, _s, _n) in g] == list(range(1, len(g) + 1))
        # chain-merge candidates into rounded-score classes
        cls_of: dict = {}
        cls_docs: list = []
        mirror_by_doc: dict = {}
        for j, (neg, doc, nhit) in enumerate(cands):
            mirror_by_doc[doc] = (-neg, nhit)
            if j > 0 and abs(neg - cands[j - 1][0]) <= step:
                cls_docs[-1].add(doc)
            else:
                cls_docs.append({doc})
            cls_of[doc] = len(cls_docs) - 1
        got_docs = {d for (_q, _r, d, _s, _n) in g}
        prev_cls = -1
        prev_score = float("inf")
        prev_doc = -1
        for (_q, _r, doc, s_got, nhit) in g:
            assert doc in mirror_by_doc, f"doc {doc} not a mirror candidate"
            s_exp, nhit_exp = mirror_by_doc[doc]
            assert nhit == nhit_exp
            # one full rounding step: a legitimate boundary divergence
            # puts the two 4-dp values on ADJACENT multiples of 1e-4
            # (|diff| ~= 1e-4); a tighter 5e-5 bound would reject the
            # exact case the class machinery below exists to accept
            assert abs(s_got - s_exp) <= step
            # Spark-side emitted order: score non-increasing, doc_id
            # ASC on exact emitted-score ties
            assert s_got <= prev_score + 1e-12
            if s_got == prev_score:
                assert doc > prev_doc
                # mirror class order is NOT asserted on exact emitted
                # ties (r12 advice): two mirror candidates ~2e-4 apart
                # land in adjacent classes, yet both 4-dp roundings can
                # legitimately meet in the middle on the Spark side --
                # the doc-ASC tiebreak may then emit the higher class
                # first.  Track the MIN of the tied classes so the
                # completeness check below stays conservative.
                new_cls = min(prev_cls, cls_of[doc])
            else:
                # mirror class order respected
                assert cls_of[doc] >= prev_cls
                new_cls = cls_of[doc]
            prev_cls, prev_score, prev_doc = new_cls, s_got, doc
        if g:
            for ci in range(prev_cls):
                assert cls_docs[ci] <= got_docs, (
                    f"query {query_id}: class {ci} not fully emitted "
                    f"before class {prev_cls}"
                )


# 35 distinct terms > _PMI_VOCAB = 30: the df-rank vocabulary cut on
# (df DESC, term ASC) fires with dense df collisions on every example
_pmi_tok = st.sampled_from([f"t{i:02d}" for i in range(35)])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_pmi_tok, min_size=0, max_size=12).map(" ".join),
                min_size=1, max_size=10))
def test_term_pmi_matches_python_mirror(spark, texts):
    """Property: the PMI co-occurrence top-50 equals a Python replay --
    document-level presence counts, the top-30 vocabulary cut on
    (df DESC, term ASC) at its tie-dense boundary, in-vocab pair counts
    per doc, pmi = ln(n_both*N/(df_a*df_b)) HALF_UP-rounded, and the
    fully discrete (n_both DESC, term_a, term_b) emission order."""
    import math
    from collections import Counter
    from itertools import combinations

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _PMI_TOPK,
        _PMI_VOCAB,
        q_term_pmi_cooccurrence,
    )

    present = [sorted({t for t in text.split(" ") if t != ""}) for text in texts]
    df_ = Counter(t for terms in present for t in terms)
    vocab = {t for t, _ in
             sorted(df_.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_VOCAB]}
    n_docs = len(texts)
    n_both = Counter()
    for terms in present:
        for a, b in combinations([t for t in terms if t in vocab], 2):
            n_both[(a, b)] += 1
    rows = sorted(
        ((a, b, n, df_[a], df_[b],
          round_half_up(math.log(n * n_docs / (df_[a] * df_[b])), 4))
         for (a, b), n in n_both.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:_PMI_TOPK]

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_term_pmi_cooccurrence(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == rows


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.lists(st.floats(-2.0, 2.0, allow_nan=False, allow_infinity=False, width=32),
             min_size=6, max_size=6),
    min_size=1, max_size=10))
def test_kmeans_cluster_profile_matches_python_mirror(spark, vectors):
    """Property: the exact integer k-means replay equals a pure-Python
    Lloyd run -- floor(float32-widened * 2^14) quantization, BIGINT
    squared distances, (d2, cluster_id) struct-min assignment ties,
    trunc-toward-zero `div` centroid updates, empty-cluster carry, and
    zero-filled profile rows for clusters with no final members."""
    import math

    import numpy as np

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _KM_K,
        _KM_QSCALE,
        _KM_ROUNDS,
        q_kmeans_cluster_profile,
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    qv = {i: [math.floor(float(np.float32(x)) * _KM_QSCALE) for x in vec]
          for i, vec in enumerate(vectors)}
    seeds = sorted(qv)[:_KM_K]
    cent = {c: list(qv[v]) for c, v in enumerate(seeds)}
    assign: dict = {}
    for r in range(_KM_ROUNDS):
        assign = {}
        for v, vec in qv.items():
            assign[v] = min(
                (sum((a - b) ** 2 for a, b in zip(vec, cent[c])), c)
                for c in cent
            )
        if r < _KM_ROUNDS - 1:
            members: dict = {}
            for v, (_, c) in assign.items():
                members.setdefault(c, []).append(qv[v])
            for c, vecs in members.items():
                cent[c] = [tdiv(sum(col), len(vecs)) for col in zip(*vecs)]
    expected = []
    for c in sorted(cent):
        mem = [v for v, (_, cc) in assign.items() if cc == c]
        expected.append((c, len(mem), sum(mem),
                         sum(d for v, (d, cc) in assign.items() if cc == c),
                         sum(cent[c])))

    emb = spark.createDataFrame(
        [(i, vec, "l") for i, vec in enumerate(vectors)],
        "vec_id bigint, embedding array<float>, label string",
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"embeddings": emb}
        got = [tuple(r) for r in q_kmeans_cluster_profile(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


_qc_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2"]),
                          st.lists(_qc_tok, min_size=0, max_size=10).map(" ".join)),
                min_size=1, max_size=12))
def test_quality_classifier_matches_python_mirror(spark, docs_spec):
    """Property: the hashing-trick quality classifier equals a hashlib
    replay -- weight = md5-prefix-int % 2001 - 1000 per DISTINCT token,
    exact integer doc score, keep iff score > 0, per-source rollup with
    the sorted kept-id hash (md5 of '' when nothing survives), and
    token-less docs never scored."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _QC_MOD,
        q_quality_classifier_filter,
    )

    def weight(tok: str) -> int:
        return (int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _QC_MOD
                - (_QC_MOD - 1) // 2)

    scores: dict = {}
    for i, (src, text) in enumerate(docs_spec):
        toks = {t for t in text.split(" ") if t != ""}
        if toks:
            scores[i] = (src, sum(weight(t) for t in toks))
    expected = {}
    by_src: dict = defaultdict(list)
    for i, (src, sc) in scores.items():
        by_src[src].append((i, sc))
    for src, rows in by_src.items():
        kept = sorted(i for i, sc in rows if sc > 0)
        expected[src] = (
            len(rows), len(kept), len(rows) - len(kept),
            round_half_up(sum(sc for _, sc in rows) / len(rows), 2),
            hashlib.md5(",".join(str(i) for i in kept).encode()).hexdigest(),
        )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=src, text=t, lang="en", n_chars=len(t))
         for i, (src, t) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.source: tuple(r)[1:]
               for r in q_quality_classifier_filter(spark, "u").collect()}
    finally:
        curation.load_tables = orig
    assert got == expected


# 2-letter alphabet, words of length 1-5: the adjacent-pair space is 4
# strings, so the top-50 ordering ties constantly on (n_occ, pair)
_bpe_word = st.text(alphabet="xy", min_size=1, max_size=5)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_bpe_word, min_size=0, max_size=12).map(" ".join),
                min_size=1, max_size=8))
def test_bpe_merge_candidates_matches_python_mirror(spark, texts):
    """Property: one BPE training round equals a Counter replay --
    word-frequency table first, adjacent character pairs weighted by
    word count, single-char words excluded, top-50 on
    (n_occ DESC, pair ASC)."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_bpe_merge_candidates,
    )

    words = Counter(w for text in texts for w in text.split(" ") if w != "")
    pairs: Counter = Counter()
    for w, wc in words.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pairs[w[i:i + 2]] += wc
    expected = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:50]

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [(r.pair, r.n_occ)
               for r in q_bpe_merge_candidates(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


# tokens include bare angle brackets and tag-like fragments: the
# extractor's three regexes must agree with Python re on hostile text
_html_tok = st.sampled_from(["plain", "a<b", "x>y", "<em>", "<", ">", "w"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_html_tok, min_size=0, max_size=8).map(" ".join),
                min_size=1, max_size=8))
def test_html_text_extract_matches_python_re_mirror(spark, texts):
    """Property: the HTML extractor equals a Python ``re`` replay of
    the same three regexes (script-with-contents drop, tag strip,
    space collapse) plus the raw-html tag count -- a third regex
    engine over texts salted with bare angle brackets and tag-like
    fragments."""
    import hashlib
    import re

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_html_text_extract,
    )

    expected = []
    for i, text in enumerate(texts):
        html = (f"<html><head><script>var x={i};</script></head>"
                f"<body><h1>Title {i}</h1><p class=\"c{i % 7}\">{text}"
                f"</p><!-- footer --></body></html>")
        clean = re.sub(r"<script>[^<]*</script>", " ", html)
        clean = re.sub(r"<[^>]+>", " ", clean)
        clean = re.sub(r" +", " ", clean).strip(" ")
        expected.append((i, len(re.findall(r"<[^>]+>", html)),
                         hashlib.md5(clean.encode()).hexdigest()))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_html_text_extract(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


_trend_hour_off = st.integers(0, 29)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                          _trend_hour_off),
                min_size=1, max_size=30))
def test_trending_scores_matches_python_mirror(spark, events_spec):
    """Property: the decayed trending score equals an integer fold
    replay -- per-type ACTIVE-hour counts in hour order,
    score_fp <- score_fp div 2 + cnt * 2^20, NULL types dropped, and
    the reported score as the exact dyadic score_fp / 2^20."""
    from collections import Counter

    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _TREND_FP_SCALE,
        q_trending_scores,
    )

    base = 1_700_000_000_000_000
    rows = [(i, et, base + h * 3_600_000_000)
            for i, (et, h) in enumerate(events_spec)]

    hourly = Counter((et, t // 3_600_000_000) for _, et, t in rows
                     if et is not None)
    expected = {}
    for et in {et for _, et, _ in rows if et is not None}:
        hours = sorted(h for (e, h) in hourly if e == et)
        fp = 0
        for h in hours:
            fp = fp // 2 + hourly[(et, h)] * _TREND_FP_SCALE
        expected[et] = (len(hours), fp, fp / _TREND_FP_SCALE)

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, t_us long"
    ).select("event_id", "event_type", SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {r.event_type: (r.n_hours, r.score_fp, r.score)
               for r in q_trending_scores(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.one_of(st.none(), st.integers(1, 6)),
                          st.integers(0, 9)),
                min_size=1, max_size=30))
def test_cumulative_unique_users_matches_python_mirror(spark, events_spec):
    """Property: the audience-growth curve equals a first-seen replay
    -- min day per user, the gap-filled day spine between the GLOBAL
    event bounds (not just first-seen days), zero-new days flat in the
    cumulative, NULL users dropped."""
    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_cumulative_unique_users,
    )

    base = 1_700_000_000_000_000
    rows = [(i, uid, base + d * 86_400_000_000)
            for i, (uid, d) in enumerate(events_spec)]

    days = [t // 86_400_000_000 for _, uid, t in rows if uid is not None]
    expected = []
    if days:
        first_seen: dict = {}
        for _, uid, t in rows:
            if uid is not None:
                d = t // 86_400_000_000
                first_seen[uid] = min(first_seen.get(uid, d), d)
        cum = 0
        for d in range(min(days), max(days) + 1):
            new = sum(1 for v in first_seen.values() if v == d)
            cum += new
            expected.append((d, new, cum))

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, t_us long"
    ).select("event_id", "user_id", SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = [tuple(r) for r in q_cumulative_unique_users(spark, "u").collect()]
    finally:
        adv.load_tables = orig
    assert got == expected


# second offsets straddle the 1800s gap AND collide exactly (equal ts
# forces the event_id tiebreak inside the path window)
_path_sec = st.sampled_from([0, 1, 2, 3, 1800, 1801, 1802, 3700, 7200])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(1, 3),
                          st.one_of(st.none(), st.sampled_from(["u", "v", "w"])),
                          _path_sec),
                min_size=1, max_size=25))
def test_session_path_mining_matches_python_mirror(spark, events_spec):
    """Property: the top-20 3-step session paths equal a Python replay
    -- the 30-min strict-gap session rule, (ts, event_id) ordering
    with equal-timestamp ties, consecutive trigrams only within a
    session, NULL event types dropped before sessionization."""
    from collections import Counter

    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.functions.sessions import (
        SESSION_GAP_US,
    )
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _PATH_TOPK,
        q_session_path_mining,
    )

    base = 1_700_000_000_000_000
    rows = [(i, uid, et, base + s * 1_000_000)
            for i, (uid, et, s) in enumerate(events_spec)]

    per_user: dict = {}
    for eid, uid, et, t in rows:
        if et is not None:
            per_user.setdefault(uid, []).append((t, eid, et))
    paths: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        sessions, cur, prev_t = [], [], None
        for t, eid, et in evs:
            if prev_t is not None and t - prev_t > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_t = t
        sessions.append(cur)
        for s in sessions:
            for j in range(len(s) - 2):
                paths[">".join(s[j:j + 3])] += 1
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPK]

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, t_us long"
    ).select("event_id", "user_id", "event_type",
             SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = [(r.path, r.n_sequences)
               for r in q_session_path_mining(spark, "u").collect()]
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 27)),
                min_size=1, max_size=40))
def test_zscore_anomaly_hours_matches_python_mirror(spark, events_spec):
    """Property: the trailing-24h z-score flags equal a Python replay
    of the integer predicate (c*x - S)^2 >= 9*(c*Q - S^2) over the
    per-type gap-filled hour spine (GLOBAL bounds, zero-filled
    buckets), with NULL flags below a full window and the zero-variance
    any-deviation rule.  Anchor events pin the spine to 28 hours so the
    full-window branch always fires."""
    import math
    from collections import Counter

    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _ZS_SIGMA,
        _ZS_WINDOW,
        q_zscore_anomaly_hours,
    )

    base = 1_700_000_000_000_000
    spec = list(events_spec) + [("a", 0), ("a", 27)]  # pin the spine span
    rows = [(i, et, base + h * 3_600_000_000) for i, (et, h) in enumerate(spec)]

    base_hour = base // 3_600_000_000
    cnt = Counter((et, base_hour + h) for et, h in spec)
    types = sorted({et for et, _ in spec})
    mn, mx = base_hour, base_hour + 27
    expected = []
    for et in types:
        dense = [(h, cnt.get((et, h), 0)) for h in range(mn, mx + 1)]
        for idx, (h, x) in enumerate(dense):
            win = [c for _, c in dense[max(0, idx - _ZS_WINDOW):idx]]
            s, q, c = sum(win), sum(v * v for v in win), len(win)
            dev, varn = c * x - s, c * q - s * s
            z = (round_half_up(dev / math.sqrt(varn), 4)
                 if c >= _ZS_WINDOW and varn > 0 else None)
            if c < _ZS_WINDOW:
                flag = None
            elif dev == 0:
                flag = 0
            else:
                flag = 1 if dev * dev >= _ZS_SIGMA * _ZS_SIGMA * varn else 0
            expected.append((et, h, x, z, flag))

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, t_us long"
    ).select("event_id", "event_type", SF.timestamp_micros("t_us").alias("ts"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = [tuple(r) for r in q_zscore_anomaly_hours(spark, "u").collect()]
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(1, 12),
                          st.floats(0.01, 10_000.0,
                                    allow_nan=False, allow_infinity=False)),
                min_size=1, max_size=30))
def test_revenue_concentration_matches_python_mirror(spark, orders_spec):
    """Property: the Pareto tier report equals a Python replay --
    per-row floor(price*10000 + 0.5) fixed-point, per-customer BIGINT
    sums, (rev DESC, custkey ASC) ranking, discrete ceil tier cuts
    k = (p*n + 99) div 100, and display-rounded revenue/share ratios
    of the pinned integers."""
    import math
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_revenue_concentration,
    )

    per_cust: dict = defaultdict(int)
    for ck, price in orders_spec:
        per_cust[ck] += math.floor(price * 10000 + 0.5)
    ranked = sorted(per_cust.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    total_fp = sum(fp for _, fp in ranked)
    expected = [n, round_half_up(total_fp / 10000.0, 2)]
    for pct in (1, 5, 20):
        k = (pct * n + 99) // 100
        tier_fp = sum(fp for _, fp in ranked[:k])
        expected.append(round_half_up(tier_fp / 10000.0, 2))
        expected.append(round_half_up(tier_fp / total_fp, 4))

    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=ck, o_totalprice=p)
         for i, (ck, p) in enumerate(orders_spec)]
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"orders": orders}
        got = list(q_revenue_concentration(spark, "u").collect()[0])
    finally:
        adv.load_tables = orig
    assert got == expected


_decon_tok = st.sampled_from(["m", "n"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["src01", "src18", "src19"]),
                          st.lists(_decon_tok, min_size=0, max_size=20).map(" ".join)),
                min_size=1, max_size=10))
def test_exact_ngram_decontaminate_matches_python_mirror(spark, docs_spec):
    """Property: the verbatim 8-gram contamination pairs equal a
    Python replay -- the shingle rule (empty docs none, sub-8-token
    docs ONE whole-text gram, else sliding 8-grams), per-doc gram
    distinct, and the (train, eval) shared-gram counts.  A 2-word
    alphabet makes gram collisions dense enough that the sub-8-token
    whole-text branch actually collides with full shingles."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _EVAL_SOURCES,
        _NGRAM_N,
        q_exact_ngram_decontaminate,
    )

    def grams(text: str) -> set:
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            return set()
        if len(toks) < _NGRAM_N:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + _NGRAM_N])
                for i in range(len(toks) - _NGRAM_N + 1)}

    train = {i: grams(t) for i, (s, t) in enumerate(docs_spec)
             if s not in _EVAL_SOURCES}
    ev = {i: grams(t) for i, (s, t) in enumerate(docs_spec)
          if s in _EVAL_SOURCES}
    expected = Counter()
    for ti, tg in train.items():
        for ei, eg in ev.items():
            shared = len(tg & eg)
            if shared:
                expected[(ti, ei)] = shared

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t, lang="en", n_chars=len(t))
         for i, (s, t) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {(r.train_doc_id, r.eval_doc_id): r.n_shared_ngrams
               for r in q_exact_ngram_decontaminate(spark, "u").collect()}
    finally:
        curation.load_tables = orig
    assert got == dict(expected)


# stopwords, punctuation-bearing tokens, and empty tokens (doubled
# spaces): the plain single-space split keeps empties, so n_tokens
# counts them -- the ratio denominators must agree on that
_dq_tok = st.sampled_from(["the", "and", "for", "xx", "a.b", "!!", ":", ""])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2"]),
                          st.lists(_dq_tok, min_size=0, max_size=12).map(" ".join)),
                min_size=1, max_size=10))
def test_doc_quality_matches_python_mirror(spark, docs_spec):
    """Property: the quality-feature rollup equals a Python replay --
    single-space split WITH empty tokens in the denominator, the
    10-word EN stopword list, the [.,!?;:] punctuation class, the
    rounded stop_ratio and its > 0.05 richness threshold."""
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.functions.text import (
        STOPWORDS,
    )
    from spark_streaming_postgres_lab2_spark.queries.ext import q_doc_quality

    en = set(STOPWORDS["en"])
    by_src: dict = defaultdict(list)
    for i, (src, text) in enumerate(docs_spec):
        toks = text.split(" ")
        stop_ratio = round_half_up(
            sum(1 for t in toks if t in en) / len(toks), 4
        )
        punct = sum(1 for ch in text if ch in ".,!?;:")
        by_src[src].append((len(toks), stop_ratio, punct))
    expected = {}
    for src, feats in by_src.items():
        n = len(feats)
        expected[src] = (
            n,
            round_half_up(sum(f[0] for f in feats) / n, 2),
            round_half_up(sum(f[1] for f in feats) / n, 4),
            sum(f[2] for f in feats),
            sum(1 for f in feats if f[1] > 0.05),
        )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=src, text=t, lang="en", n_chars=len(t))
         for i, (src, t) in enumerate(docs_spec)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.source: tuple(r)[1:] for r in q_doc_quality(spark, "u").collect()}
    finally:
        ext.load_tables = orig
    # avg_stop_ratio averages inexact 4-decimal doubles, so Spark's
    # partition summation order vs the mirror's can differ by 1 ulp at
    # a rounding boundary -- compare it to within one rounding step;
    # everything else (counts, the exact int-sum average, punct,
    # threshold counts) stays exact
    assert set(got) == set(expected)
    for src, (n, avg_t, avg_sr, punct, rich) in expected.items():
        g = got[src]
        assert (g[0], g[1], g[3], g[4]) == (n, avg_t, punct, rich), src
        assert abs(g[2] - avg_sr) <= 5e-5, src


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.integers(1, 30)),
                min_size=1, max_size=60))
def test_skew_key_report_matches_python_mirror(spark, user_ids):
    """Property: the skew audit equals a Counter replay -- per-key
    counts over non-NULL users, share and mean-load ratio as rounded
    ratios of the pinned integers, top-20 on (cnt DESC, user_id)."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_skew_key_report

    counts = Counter(u for u in user_ids if u is not None)
    total = sum(counts.values())
    n_keys = len(counts)
    expected = [
        (u, c, n_keys,
         round_half_up(c / total, 6),
         round_half_up(c * n_keys / total, 4))
        for u, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    ]

    events = spark.createDataFrame(
        [Row(event_id=i, user_id=u) for i, u in enumerate(user_ids)],
        "event_id long, user_id long",
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"events": events}
        got = [tuple(r) for r in q_skew_key_report(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(1, 120), st.integers(0, 10_800)),
                min_size=1, max_size=25))
def test_asof_quotes_matches_python_mirror(spark, events_spec):
    """Property: the cogroup + merge_asof quote enrichment equals a
    pure-Python backward-scan replay, INCLUDING the deterministic tick
    synthesis (hourly ticks at segment-dependent second offsets, the
    opening tick, the distinct dedup).  Random user ids spread events
    over many of the 50 segments; second offsets straddle the
    tick-per-hour grid so picks flip between opening/hourly ticks."""
    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_asof_quotes

    n_seg = 50
    base = 1_700_000_000_000_000
    rows = [(i, uid, base + s * 1_000_000)
            for i, (uid, s) in enumerate(events_spec)]

    hours = [t // 3_600_000_000 for _, _, t in rows]
    mn, mx = min(hours), max(hours)
    ticks: dict = {}
    for seg in range(n_seg):
        per_seg = {}
        for h in range(mn, mx + 1):
            t_us = h * 3_600_000_000 + ((seg * 97) % 3600) * 1_000_000
            per_seg[t_us] = (h * 31 + seg * 7) % 1000 + 100
        opening = mn * 3_600_000_000
        per_seg.setdefault(opening, (mn * 31 + seg * 7) % 1000 + 100)
        ticks[seg] = sorted(per_seg.items())
    expected = []
    for eid, uid, t in rows:
        seg = uid % n_seg
        tick_us, fp = max(
            (tu, f) for tu, f in ticks[seg] if tu <= t
        )
        expected.append((eid, seg, t, fp, (t - tick_us) // 1_000_000))

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, t_us long"
    ).select("event_id", "user_id", SF.timestamp_micros("t_us").alias("ts"))
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"events": df}
        got = [tuple(r) for r in q_asof_quotes(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.lists(st.floats(-2.0, 2.0, allow_nan=False, allow_infinity=False, width=32),
             min_size=16, max_size=16),
    min_size=1, max_size=20))
def test_embedding_pq_audit_matches_python_mirror(spark, vectors):
    """Property: the PQ assignment audit equals a Python replay --
    float32-widened 2^14 quantization, the 8-dim subspace split, the
    16-lowest-vec_id codebook, BIGINT subvector distances with
    (d2, code) struct-min ties (duplicate vectors force them), and the
    per-subspace count / codes-used / reconstruction-error rollup."""
    import math

    import numpy as np

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _KM_QSCALE,
        _PQ_K,
        _PQ_SUB,
        q_embedding_pq_audit,
    )

    qv = {i: [math.floor(float(np.float32(x)) * _KM_QSCALE) for x in vec]
          for i, vec in enumerate(vectors)}
    dim = 16
    n_sub = dim // _PQ_SUB
    seeds = sorted(qv)[:_PQ_K]
    book = {(m, code): qv[v][m * _PQ_SUB:(m + 1) * _PQ_SUB]
            for code, v in enumerate(seeds) for m in range(n_sub)}
    per_m: dict = {m: [0, set(), 0] for m in range(n_sub)}
    for v, vec in qv.items():
        for m in range(n_sub):
            sub = vec[m * _PQ_SUB:(m + 1) * _PQ_SUB]
            d2, code = min(
                (sum((a - b) ** 2 for a, b in zip(sub, book[(m, c)])), c)
                for c in range(len(seeds))
            )
            per_m[m][0] += 1
            per_m[m][1].add(code)
            per_m[m][2] += d2
    expected = [(m, n, len(codes), err)
                for m, (n, codes, err) in sorted(per_m.items())]

    emb = spark.createDataFrame(
        [(i, vec, "l") for i, vec in enumerate(vectors)],
        "vec_id bigint, embedding array<float>, label string",
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"embeddings": emb}
        got = [tuple(r) for r in q_embedding_pq_audit(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


_mh_tok = st.sampled_from(["r", "s", "t"])


def _portable_minhash_replay(texts) -> tuple[dict, set]:
    """Shared pure-Python replay of the portable MinHash front half --
    3-token shingle rule (sub-3-token docs one whole-text shingle),
    md5-prefix mod-P shingle hashes, the 12 MINSTD affine permutation
    minima, 4x3 band md5 keys, bucket candidate generation.  Returns
    (shingle_sets, candidate_pairs); the ONE definition both the
    near-dup and the cluster-dedup mirrors replay, so a hash-family
    change cannot silently leave one mirror testing a stale spec."""
    import hashlib

    from spark_streaming_postgres_lab2_spark.functions.similarity import (
        _MH_PRIME,
        _mh_ab,
    )

    shs: dict = {}
    for i, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            continue
        shs[i] = ({" ".join(toks)} if len(toks) < 3 else
                  {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)})
    buckets: dict = {}
    for i, ss in shs.items():
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MH_PRIME
              for s in ss]
        mins = [min((a * h + b) % _MH_PRIME for h in hs)
                for a, b in (_mh_ab(k) for k in range(12))]
        for b in range(4):
            key = hashlib.md5(
                "|".join(str(v) for v in mins[b * 3:(b + 1) * 3]).encode()
            ).hexdigest()
            buckets.setdefault((b, key), []).append(i)
    cand = {(a, b) for ids in buckets.values()
            for a in ids for b in ids if a < b}
    return shs, cand


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_mh_tok, min_size=0, max_size=8).map(" ".join),
                min_size=2, max_size=8))
def test_minhash_near_dup_matches_python_mirror(spark, texts):
    """Property: the ENTIRE portable MinHash-LSH pipeline equals a
    pure-Python replay (_portable_minhash_replay) plus the
    exact-Jaccard >= 0.4 verify.  A third implementation of the hash
    family every LSH oracle composes."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_minhash_near_dup

    shs, cand = _portable_minhash_replay(texts)
    expected = {}
    for a, b in cand:
        j = round_half_up(len(shs[a] & shs[b]) / len(shs[a] | shs[b]), 4)
        if j >= 0.4:
            expected[(a, b)] = j

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {(r.doc_id_1, r.doc_id_2): r.jaccard
               for r in q_minhash_near_dup(spark, "u").collect()}
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_mh_tok, min_size=0, max_size=8).map(" ".join),
                min_size=2, max_size=8))
def test_simhash_near_dup_matches_python_mirror(spark, texts):
    """Property: the portable SimHash near-dup pipeline equals a
    pure-Python replay -- md5-nibble bit votes over distinct tokens,
    the strict-majority fingerprint, 4x16-bit banding, and the
    Hamming <= 4 verify over both 32-bit halves."""
    import hashlib

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import q_simhash_near_dup

    fps = {}
    for i, text in enumerate(texts):
        toks = {t for t in text.split(" ") if t != ""}
        if not toks:
            continue
        votes = [0] * 64
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(64):
                if (int(h[j // 4], 16) >> (j % 4)) & 1:
                    votes[j] += 1
        lo = sum(1 << j for j in range(32) if votes[j] * 2 > len(toks))
        hi = sum(1 << (j - 32) for j in range(32, 64)
                 if votes[j] * 2 > len(toks))
        fps[i] = (lo, hi)
    buckets: dict = {}
    for i, (lo, hi) in fps.items():
        for b, v in enumerate([lo % 65536, lo // 65536,
                               hi % 65536, hi // 65536]):
            buckets.setdefault((b, v), []).append(i)
    expected = {}
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    ham = (bin(fps[a][0] ^ fps[b][0]).count("1")
                           + bin(fps[a][1] ^ fps[b][1]).count("1"))
                    if ham <= 4:
                        expected[(a, b)] = ham

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {(r.doc_id_1, r.doc_id_2): r.hamming
               for r in q_simhash_near_dup(spark, "u").collect()}
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2"]),
                          st.lists(_mh_tok, min_size=0, max_size=8).map(" ".join)),
                min_size=2, max_size=8))
def test_canonical_docs_matches_python_mirror(spark, docs_spec):
    """Property: the full cluster-dedup composition equals a Python
    replay -- portable MinHash pairs (threshold 0.5), min-id union-find
    components with shingle-less/singleton docs as their own cluster,
    per-cluster arg-max on (n_chars, lowest doc_id), per-source
    kept/dropped rollup."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import q_canonical_docs

    n_chars = {i: len(t) for i, (_, t) in enumerate(docs_spec)}
    shs, cand = _portable_minhash_replay([t for _, t in docs_spec])
    pairs = set()
    for a, b in cand:
        j = round_half_up(len(shs[a] & shs[b]) / len(shs[a] | shs[b]), 4)
        if j >= 0.5:
            pairs.add((a, b))

    parent = {i: i for i in range(len(docs_spec))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict = {}
    for i in range(len(docs_spec)):
        clusters.setdefault(find(i), []).append(i)
    kept = set()
    for members in clusters.values():
        kept.add(max(members, key=lambda i: (n_chars[i], -i)))
    expected = {}
    for i, (src, _) in enumerate(docs_spec):
        n, k, d = expected.get(src, (0, 0, 0))
        expected[src] = (n + 1, k + (i in kept), d + (i not in kept))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=src, text=t, lang="en", n_chars=len(t))
         for i, (src, t) in enumerate(docs_spec)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.source: (r.n_docs, r.kept_docs, r.dropped_docs)
               for r in q_canonical_docs(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.lists(st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False, width=32),
             min_size=64, max_size=64),
    min_size=2, max_size=8))
def test_embedding_lsh_portable_matches_python_mirror(spark, vectors):
    """Property: the integer-hyperplane LSH near-dup equals a Python
    replay -- float32-widened 2^14 quantization, int64 plane dots with
    the >= 0 sign rule over the 16x4 baked planes, bucket candidate
    generation, and the left-to-right float64 cosine verify with the
    round-4 threshold (zero-norm pairs dropped)."""
    import math

    import numpy as np

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.functions.similarity import (
        _QUANT_SCALE,
        _int_plane,
    )
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_embedding_lsh_near_dup_portable,
    )

    widened = [[float(np.float32(x)) for x in vec] for vec in vectors]
    qv = [[math.floor(x * _QUANT_SCALE) for x in vec] for vec in widened]
    buckets: dict = {}
    for i, v in enumerate(qv):
        for t in range(16):
            key = t * 16
            for j in range(4):
                plane = _int_plane(t * 4 + j, 64)
                if sum(a * b for a, b in zip(v, plane)) >= 0:
                    key += 1 << j
            buckets.setdefault(key, []).append(i)
    cand = {(a, b) for ids in buckets.values()
            for a in ids for b in ids if a < b}
    expected = {}
    for a, b in sorted(cand):
        accd = acc1 = acc2 = 0.0
        for x, y in zip(widened[a], widened[b]):
            accd += x * y
            acc1 += x * x
            acc2 += y * y
        den = math.sqrt(acc1) * math.sqrt(acc2)
        if den == 0.0:
            continue
        cos = round_half_up(accd / den, 4)
        if cos >= 0.4:
            expected[(a, b)] = cos

    emb = spark.createDataFrame(
        [(i, vec, "l") for i, vec in enumerate(vectors)],
        "vec_id bigint, embedding array<float>, label string",
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"embeddings": emb}
        got = {(r.vec_id_1, r.vec_id_2): r.cosine_sim
               for r in q_embedding_lsh_near_dup_portable(spark, "u").collect()}
    finally:
        ext.load_tables = orig
    assert got == expected


_mix_lang = st.sampled_from(["en", "de", "fr", "es", "zh", "xx"])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 100_000), _mix_lang),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_training_mix_sample_matches_python_mirror(spark, docs_spec):
    """Property: the language-weighted downsampling manifest equals a
    hashlib replay -- per-language md5-prefix cutoffs, rate >= 1 kept
    unconditionally, UNKNOWN languages dropped (the when-chain
    default)."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _MIX_RATES,
        _cutoff_hex,
        q_training_mix_sample,
    )

    expected: dict = defaultdict(lambda: [0, 0])
    for doc_id, lang in docs_spec:
        prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        rate = _MIX_RATES.get(lang)
        keep = rate is not None and (rate >= 1.0 or prefix < _cutoff_hex(rate))
        expected[lang][0] += 1
        expected[lang][1] += keep

    docs = spark.createDataFrame(
        [Row(doc_id=d, source="s", text="t", lang=lang, n_chars=1)
         for d, lang in docs_spec]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.lang: (r.n_total, r.n_sampled)
               for r in q_training_mix_sample(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == {k: tuple(v) for k, v in expected.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 100_000), _mix_lang),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_training_mix_upsample_matches_python_mirror(spark, docs_spec):
    """Property: the fractional upsampling manifest equals a hashlib
    replay -- floor(rate) copies plus one iff the md5 prefix falls
    under the fractional-part cutoff, unknown languages defaulting to
    exactly one copy, realized_rate as the rounded copy ratio."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _UPSAMPLE_RATES,
        _cutoff_hex,
        q_training_mix_upsample,
    )

    by_lang: dict = defaultdict(lambda: [0, 0])
    for doc_id, lang in docs_spec:
        prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        rate = _UPSAMPLE_RATES.get(lang)
        if rate is None:
            copies = 1
        else:
            whole, frac = int(rate), rate - int(rate)
            copies = whole + (1 if frac > 0 and prefix < _cutoff_hex(frac) else 0)
        by_lang[lang][0] += 1
        by_lang[lang][1] += copies
    expected = {lang: (n, c, round_half_up(c / n, 4))
                for lang, (n, c) in by_lang.items()}

    docs = spark.createDataFrame(
        [Row(doc_id=d, source="s", text="t", lang=lang, n_chars=1)
         for d, lang in docs_spec]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.lang: (r.n_docs, r.total_copies, r.realized_rate)
               for r in q_training_mix_upsample(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 20),
                          st.floats(0.01, 10_000.0,
                                    allow_nan=False, allow_infinity=False)),
                min_size=1, max_size=25))
def test_rolling_7d_revenue_matches_python_mirror(spark, orders_spec):
    """Property: the 7-day trailing revenue equals a Python replay of
    the RANGE(-6, 0) frame over the day INDEX -- sparse order days must
    genuinely shrink the window (the ROWS-vs-RANGE misread this mirror
    exists to catch), with fixed-point day cents divided once at the
    end."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as SF

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_rolling_7d_revenue,
    )

    epoch_1995 = 788_918_400_000_000  # 1995-01-01 UTC, micros
    day_cents: dict = defaultdict(int)
    for off, price in orders_spec:
        day_cents[off] += math.floor(price * 100 + 0.5)
    expected = {}
    for off, cents in day_cents.items():
        window = sum(c for o, c in day_cents.items() if off - 6 <= o <= off)
        expected[epoch_1995 + off * 86_400_000_000] = (cents / 100.0,
                                                       window / 100.0)

    orders = spark.createDataFrame(
        [(i, p, epoch_1995 + off * 86_400_000_000)
         for i, (off, p) in enumerate(orders_spec)],
        "o_orderkey long, o_totalprice double, t_us long",
    ).select("o_orderkey", "o_totalprice",
             SF.timestamp_micros("t_us").alias("o_orderdate"))
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"orders": orders}
        got = {r.day_us: (r.day_revenue, r.rolling_7d_revenue)
               for r in q_rolling_7d_revenue(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.one_of(st.none(), st.integers(1, 6)),
                          st.sampled_from(["purchase", "view", "click"])),
                min_size=1, max_size=30))
def test_user_set_ops_match_python_multiset_mirror(spark, events_spec):
    """Property: both set-algebra segmentations equal a multiset replay
    -- distinct INTERSECT/EXCEPT as set ops, INTERSECT ALL as
    sum-of-min multiplicities and EXCEPT ALL as sum of clamped count
    differences -- with repeated (user, type) events forcing the
    bag-vs-set divergence on every example."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_user_set_ops,
        q_user_set_ops_all,
    )

    purch = Counter(u for u, t in events_spec if u is not None and t == "purchase")
    views = Counter(u for u, t in events_spec if u is not None and t == "view")
    expected_distinct = {
        "purchase_and_view": len(purch.keys() & views.keys()),
        "view_only": len(views.keys() - purch.keys()),
        "purchase_only": len(purch.keys() - views.keys()),
    }
    expected_all = {
        "purchase_intersect_all_view":
            sum(min(purch[u], views[u]) for u in purch.keys() & views.keys()),
        "view_except_all_purchase":
            sum(max(0, views[u] - purch[u]) for u in views),
    }

    events = spark.createDataFrame(
        [Row(event_id=i, user_id=u, event_type=t)
         for i, (u, t) in enumerate(events_spec)],
        "event_id long, user_id long, event_type string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": events}
        got_distinct = {r.segment: r.n_users
                        for r in q_user_set_ops(spark, "u").collect()}
        got_all = {r.segment: r.n_rows
                   for r in q_user_set_ops_all(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got_distinct == expected_distinct
    assert got_all == expected_all


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.one_of(st.none(),
                                    st.integers(-400, 400).map(lambda v: v / 4.0))),
                min_size=1, max_size=25))
def test_value_percentiles_matches_python_mirror(spark, events_spec):
    """Property: the exact interpolated percentiles equal a Python
    replay of Spark's rule -- position = q*(n-1) over the sorted
    non-NULL values, (higher-pos)*lower_val + (pos-lower)*higher_val
    interpolation (the weighted form, NOT lower + frac*diff), NULL for
    all-NULL groups."""
    import math
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import (
        q_value_percentiles,
    )

    def pct(vals, q):
        if not vals:
            return None
        pos = q * (len(vals) - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            return round_half_up(vals[lo], 4)
        return round_half_up(
            (hi - pos) * vals[lo] + (pos - lo) * vals[hi], 4)

    by_type: dict = defaultdict(list)
    for et, v in events_spec:
        if v is not None:
            by_type[et].append(v)
    expected = {}
    for et in {et for et, _ in events_spec}:
        vals = sorted(by_type.get(et, []))
        expected[et] = (pct(vals, 0.5), pct(vals, 0.9), pct(vals, 0.99))

    events = spark.createDataFrame(
        [Row(event_id=i, event_type=et, value=v)
         for i, (et, v) in enumerate(events_spec)],
        "event_id long, event_type string, value double",
    )
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": events}
        got = {r.event_type: (r.p50, r.p90, r.p99)
               for r in q_value_percentiles(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_mh_tok, min_size=0, max_size=14).map(" ".join),
                min_size=2, max_size=8))
def test_ngram_jaccard_pairs_matches_python_mirror(spark, texts):
    """Property: the min-shingle-hash blocked Jaccard pairs equal a
    Python replay -- the every-4th-POSITION sampled 3-gram rule
    (positions 0, 4, 8, ... of the full gram array; sub-3-token docs
    one whole-text gram), lexicographic min over md5 HEX STRINGS as
    the blocking key, fingerprint-equality candidates, and the
    distinct-token Jaccard >= 0.2 verify."""
    import hashlib

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_ngram_jaccard_pairs,
    )

    def sampled(text: str) -> list:
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            return []
        if len(toks) < 3:
            return [" ".join(toks)]
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        return [g for i, g in enumerate(grams) if i % 4 == 0]

    fps, tok_sets = {}, {}
    for i, t in enumerate(texts):
        ss = sampled(t)
        if ss:
            fps[i] = min(hashlib.md5(s.encode()).hexdigest() for s in ss)
            tok_sets[i] = {tk for tk in t.split(" ") if tk != ""}
    expected = {}
    for a in fps:
        for b in fps:
            if a < b and fps[a] == fps[b]:
                j = round_half_up(
                    len(tok_sets[a] & tok_sets[b])
                    / len(tok_sets[a] | tok_sets[b]), 4)
                if j >= 0.2:
                    expected[(a, b)] = j

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {(r.doc_id_1, r.doc_id_2): r.jaccard
               for r in q_ngram_jaccard_pairs(spark, "u").collect()}
    finally:
        ext.load_tables = orig
    assert got == expected


# --- round-12 mirror batch (VERDICT r11 item 7): the last oracled ----
# families without a randomized replay -- market_basket,
# gdpr_erasure_audit, benford_digit_audit, freq_items_audit


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(1, 6), st.integers(1, 8)),
             min_size=1, max_size=40),
    st.integers(0, 4),
)
def test_market_basket_matches_python_mirror(spark, pairs, extra_orders):
    """Property: association-rule top-30 equals a pure-Python replay --
    DISTINCT (order, part) before counting, per-basket C(k,2) pair
    counts, conf/lift as HALF_UP-rounded ratios of exact integers, and
    the fully discrete (pair_count DESC, part_a, part_b) top-k.  Tiny
    key ranges force duplicate lineitem rows, shared pairs across
    baskets, and basket-less orders (the lift denominator counts ALL
    orders, not just ones with items)."""
    from collections import Counter
    from itertools import combinations

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tpch_more
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        _MB_TOPK,
        q_market_basket,
    )

    op = sorted(set(pairs))
    item = Counter(p for _o, p in op)
    basket: dict = {}
    for o, p in op:
        basket.setdefault(o, []).append(p)
    pair_cnt: Counter = Counter()
    for ps in basket.values():
        for a, b in combinations(sorted(ps), 2):
            pair_cnt[(a, b)] += 1
    n_orders = len(basket) + extra_orders
    expected = []
    for (a, b), pc in sorted(pair_cnt.items(),
                             key=lambda kv: (-kv[1], kv[0]))[:_MB_TOPK]:
        expected.append((
            a, b, pc, item[a], item[b],
            round_half_up(pc / item[a], 4),
            round_half_up(pc / item[b], 4),
            round_half_up(pc * n_orders / (item[a] * item[b]), 4),
        ))

    li = spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p) for o, p in pairs]
    )
    order_keys = sorted(basket) + [100 + i for i in range(extra_orders)]
    orders = spark.createDataFrame([Row(o_orderkey=o) for o in order_keys])
    orig = tpch_more.load_tables
    try:
        tpch_more.load_tables = lambda _s, _d, _t: {
            "lineitem": li, "orders": orders,
        }
        got = [tuple(r) for r in q_market_basket(spark, "u").collect()]
    finally:
        tpch_more.load_tables = orig
    assert got == expected


from spark_streaming_postgres_lab2_spark.queries.tpch_more import (  # noqa: E402
    _GDPR_MOD as _GDPR_M,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(0, 3 * _GDPR_M + 9), min_size=1, max_size=25),
    # derived from the modulus, not literals: if _GDPR_MOD ever
    # changes, the forced-victim arm must keep forcing real victims
    st.sets(st.sampled_from([0, _GDPR_M, 2 * _GDPR_M, 3 * _GDPR_M]), max_size=4),
    st.dictionaries(st.integers(0, 40), st.integers(0, 3 * _GDPR_M + 29),
                    max_size=25),
    st.lists(st.integers(0, 50), max_size=40),
)
def test_gdpr_erasure_audit_matches_python_mirror(
    spark, custkeys, forced_victims, orders, lineitems
):
    """Property: the erasure-scope cascade equals a Python replay --
    victims from the CUSTOMER table only (a dangling o_custkey that is
    a multiple of 97 is NOT doomed), lineitem totals counted through
    the INNER join to orders (dangling lineitems invisible), NULL
    share on an empty cascade member, alphabetical table order.
    ``forced_victims`` unions in real victims so the non-zero path is
    exercised every run, not at 4-in-301 odds."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tpch_more
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        _GDPR_MOD,
        q_gdpr_erasure_audit,
    )

    custkeys = set(custkeys) | set(forced_victims)
    victims = {c for c in custkeys if c % _GDPR_MOD == 0}
    c_total, c_doomed = len(custkeys), len(victims)
    o_total = len(orders)
    o_doomed = sum(1 for ck in orders.values() if ck in victims)
    l_total = sum(1 for lk in lineitems if lk in orders)
    l_doomed = sum(
        1 for lk in lineitems if lk in orders and orders[lk] in victims
    )

    def share(d: int, t: int):
        return round_half_up(d / t, 4) if t > 0 else None

    expected = [
        ("customer", c_doomed, c_total, share(c_doomed, c_total)),
        ("lineitem", l_doomed, l_total, share(l_doomed, l_total)),
        ("orders", o_doomed, o_total, share(o_doomed, o_total)),
    ]

    cust_df = spark.createDataFrame(
        [Row(c_custkey=c) for c in sorted(custkeys)], "c_custkey bigint"
    )
    orders_df = spark.createDataFrame(
        [Row(o_orderkey=o, o_custkey=c) for o, c in sorted(orders.items())],
        "o_orderkey bigint, o_custkey bigint",
    )
    li_df = spark.createDataFrame(
        [Row(l_orderkey=lk) for lk in lineitems], "l_orderkey bigint"
    )
    orig = tpch_more.load_tables
    try:
        tpch_more.load_tables = lambda _s, _d, _t: {
            "customer": cust_df, "orders": orders_df, "lineitem": li_df,
        }
        got = [tuple(r) for r in q_gdpr_erasure_audit(spark, "u").collect()]
    finally:
        tpch_more.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.one_of(
        st.integers(-10_000, 10**9).map(lambda c: c / 100),
        st.floats(min_value=-1e6, max_value=1e9,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=60,
))
def test_benford_digit_audit_mirror_float_and_digit0_corner(spark, prices):
    """Complement to the cents-domain mirror above (which would
    KeyError on digit 0): the float branch of this strategy produces
    sub-0.0001 positives whose fixed-point value is 0 -- digit 0 has
    no Benford expectation, so benford_expected and abs_deviation must
    both be NULL (map-miss semantics), never a crash or a fabricated
    0.  Also pins the full ORDERED row list (digit ASC) rather than a
    dict, so a dropped or duplicated digit group cannot cancel out."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as ext
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _BENFORD_EXPECTED,
        q_benford_digit_audit,
    )

    digits: Counter = Counter()
    for v in prices:
        if v > 0:
            digits[int(str(math.floor(v * 10000 + 0.5))[0])] += 1
    total = sum(digits.values())
    expected = []
    for d in sorted(digits):
        n = digits[d]
        exp = _BENFORD_EXPECTED.get(d)
        expected.append((
            d, n,
            round_half_up(n / total, 4),
            exp,
            round_half_up(abs(n / total - exp), 4) if exp is not None else None,
        ))

    orders = spark.createDataFrame(
        [Row(o_totalprice=float(p)) for p in prices], "o_totalprice double"
    )
    orig = ext.load_tables
    try:
        ext.load_tables = lambda _s, _d, _t: {"orders": orders}
        got = [tuple(r) for r in q_benford_digit_audit(spark, "u").collect()]
    finally:
        ext.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "zz1",
                              "zz2", "zz3", "zz4"]),
             min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=10,
))
def test_freq_items_audit_matches_python_mirror(spark, texts):
    """Property: the heavy-hitters audit equals a Python replay of the
    exact side -- single-space tokenization, the integer cross-multiply
    threshold cnt*100 > total, (count DESC, term) order -- AND the
    Misra-Gries containment guarantee holds: every true >1% term
    carries in_sketch=1 on every randomized corpus (the sketch may
    over-report, but the query only ever emits exact-threshold terms,
    so false positives cannot appear)."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_freq_items_audit,
    )

    toks = [t for text in texts for t in text.split(" ") if t != ""]
    cnt = Counter(toks)
    total = len(toks)
    expected = sorted(
        ((term, c, 1) for term, c in cnt.items() if c * 100 > total),
        key=lambda r: (-r[1], r[0]),
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang="en", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_freq_items_audit(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


# --- round 13 mirror batch: trending top-k / BFS / incremental dedup -----------
#
# VERDICT r12 item 4 tail: the last three crafted-test-only queries
# get the same third-opinion treatment -- pure-Python spec replays on
# hypothesis-generated inputs, catching a SHARED Spark/DuckDB spec
# misreading the oracle hash cannot.

# 7 types > _TREND_TOPK = 5: the top-k cut on (score_fp DESC,
# event_type ASC) fires with score ties on every dense example
_trend_type = st.sampled_from([f"e{i}" for i in range(7)])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.tuples(_trend_type, st.integers(min_value=0, max_value=30)),
        st.integers(min_value=1, max_value=3),
        min_size=1,
        max_size=24,
    )
)
def test_trending_topk_matches_python_mirror(spark, occupancy):
    """Property: the global trending top-k equals a pure-Python replay
    of the integer decay recurrence (score_fp <- score_fp div 2 +
    cnt * 2^20 over each type's ACTIVE hours in order) plus the
    (score_fp DESC, event_type ASC) rank cut at k=5 -- including the
    exact dyadic ``score`` doubles both engines derive from the pinned
    integer."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _TREND_FP_SCALE,
        _TREND_TOPK,
        q_trending_topk,
    )

    base_us = 1_704_067_200_000_000  # 2024-01-01 in epoch micros
    cnts: dict = {}
    for (etype, h), n in occupancy.items():
        cnts.setdefault(etype, {})[h] = n  # (etype, h) keys are unique
    folded = {}
    for etype, by_hour in cnts.items():
        acc = 0
        for h in sorted(by_hour):
            acc = acc // 2 + by_hour[h] * _TREND_FP_SCALE
        folded[etype] = acc
    ranked = sorted(folded.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (r + 1, etype, fp, fp / float(_TREND_FP_SCALE))
        for r, (etype, fp) in enumerate(ranked[:_TREND_TOPK])
    ]

    rows = []
    i = 0
    for (etype, h), n in occupancy.items():
        us = base_us + h * 3_600_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        for _ in range(n):
            rows.append(Row(event_id=i, ts=ts, user_id=1, event_type=etype,
                            value=1.0, props="{}"))
            i += 1
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = [
            (r.rank, r.event_type, r.score_fp, r.score)
            for r in q_trending_topk(spark, "u").collect()
        ]
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=18),                     # n nodes
    st.lists(st.tuples(st.integers(0, 97), st.integers(0, 97)),  # raw edges
             min_size=0, max_size=50),
    st.lists(st.integers(0, 97), min_size=1, max_size=5),        # raw seeds
    st.integers(min_value=1, max_value=5),                       # depth
)
def test_bfs_hops_matches_python_bfs_on_random_graphs(spark, n, raw_edges,
                                                      raw_seeds, depth):
    """Property (VERDICT r12 item 4): the iterative frontier operator
    ``bfs_hops`` -- the machinery under bfs_reachability -- assigns
    every node its true min-hop distance from the seed set on random
    DIRECTED multigraphs (self-loops and duplicate edges kept), with
    -1 for nodes unreached within the depth bound, vs a textbook
    Python BFS.  The crafted tests and the recursive-CTE oracle sample
    this thinly; random graphs exercise frontier/visited interleavings
    the fixture graph never hits."""
    from collections import deque

    from spark_streaming_postgres_lab2_spark.functions.graph import bfs_hops

    edges = [(a % n, b % n) for a, b in raw_edges]
    seeds = sorted({s % n for s in raw_seeds})

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    hop = {s: 0 for s in seeds}
    frontier = deque(seeds)
    while frontier:
        v = frontier.popleft()
        if hop[v] >= depth:
            continue
        for w in adj.get(v, ()):
            if w not in hop:
                hop[w] = hop[v] + 1
                frontier.append(w)
    expected = {i: hop.get(i, -1) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges_df = spark.createDataFrame(edges, "src bigint, dst bigint") \
        if edges else spark.createDataFrame([], "src bigint, dst bigint")
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "id bigint")
    got = {r.id: r.hop for r in bfs_hops(nodes, edges_df, seeds_df,
                                         depth=depth).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=8).map(" ".join),
                          st.sampled_from(["A", "B"])),
                min_size=1, max_size=12))
def test_incremental_dedup_matches_python_mirror(spark, docs_spec):
    """Property (VERDICT r12 item 4): the two-tier incremental dedup
    equals a pure-Python replay on randomized history/batch splits --
    the derived new batch (exact-copy / near-copy / fresh arms against
    the NEXT doc's text), the md5 exact tier, the asymmetric MinHash
    near tier (_portable_minhash_replay cross-pairs + exact-Jaccard
    verify at 0.4), the tier DISJOINTNESS (dropped_near counts only
    non-exact near-dups), and the kept-ids md5 per source."""
    import hashlib

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _INC_ID_OFFSET,
        q_incremental_dedup,
    )

    texts = [t for t, _ in docs_spec]
    sources = [s for _, s in docs_spec]
    n = len(texts)

    # derived new batch (mirror of _incremental_new_batch)
    new_batch = {}  # new_id -> (source, text)
    for i in range(n):
        if i % 10 not in (0, 5, 7):
            continue
        nxt = texts[i + 1] if i + 1 < n else None
        if i % 10 == 0 and nxt is not None:
            t = nxt
        elif i % 10 == 5 and nxt is not None:
            t = nxt + " extradoc"
        else:
            t = f"fresh arrival number {i} with unseen content"
        new_batch[i + _INC_ID_OFFSET] = (sources[i], t)

    hist_texts = set(texts)
    exact = {nid for nid, (_s, t) in new_batch.items() if t in hist_texts}

    # near tier: portable MinHash bands over the COMBINED corpus,
    # keeping only (history, new) cross-candidates, then the exact
    # 3-shingle Jaccard verify at >= 0.4 (4-dp round)
    combined = texts + [new_batch[nid][1] for nid in sorted(new_batch)]
    new_pos = {n + j: nid for j, nid in enumerate(sorted(new_batch))}
    shs, cand = _portable_minhash_replay(combined)
    near = set()
    for a, b in cand:
        lo, hi = (a, b) if a < b else (b, a)
        if lo < n and hi in new_pos:  # history x new only
            j = round_half_up(len(shs[lo] & shs[hi]) / len(shs[lo] | shs[hi]), 4)
            if j >= 0.4:
                near.add(new_pos[hi])

    expected = {}
    for src in sorted({s for s, _t in new_batch.values()}):
        ids = [nid for nid, (s, _t) in new_batch.items() if s == src]
        kept = sorted(i for i in ids
                      if i not in exact and i not in near)
        expected[src] = (
            len(ids),
            sum(1 for i in ids if i in exact),
            sum(1 for i in ids if i not in exact and i in near),
            len(kept),
            hashlib.md5(",".join(str(i) for i in kept).encode()).hexdigest(),
        )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=sources[i], text=texts[i], lang="en",
             n_chars=len(texts[i])) for i in range(n)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            r.source: (r.n_new, r.dropped_exact, r.dropped_near, r.kept,
                       r.kept_ids_hash)
            for r in q_incremental_dedup(spark, "u").collect()
        }
    finally:
        corpus.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=10).map(" ".join),
                          st.sampled_from(["A", "B"])),
                min_size=1, max_size=12))
def test_lm_surprisal_filter_matches_python_mirror(spark, docs_spec):
    """Property: the CCNet-style LM gate equals a pure-Python replay of
    the spec on random corpora -- add-one bigram counts, the corpus
    vocabulary V over ALL docs (including unscored short ones), the
    integer bit-surprisal floor(log2((c1+V) div (c12+1))) via
    bit_length, the one-IEEE-division doc mean vs corpus mean keep
    rule, and the per-source accounting incl. the kept-ids md5.  The
    3-symbol alphabet makes bigram-count collisions and mean-boundary
    ties dense."""
    import hashlib
    from collections import Counter, defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_lm_surprisal_filter,
    )

    toks = {i: [t for t in text.split(" ") if t] for i, (text, _s) in enumerate(docs_spec)}
    c12: Counter = Counter()
    c1: Counter = Counter()
    per_doc = {}
    for i, tk in toks.items():
        bgs = list(zip(tk, tk[1:]))
        if bgs:
            per_doc[i] = bgs
            c12.update(bgs)
            c1.update(w1 for w1, _ in bgs)
    vocab = len({t for tk in toks.values() for t in tk})
    scored = {}
    for i, bgs in per_doc.items():
        total = sum(
            (((c1[w1] + vocab) // (c12[(w1, w2)] + 1)).bit_length() - 1)
            for w1, w2 in bgs
        )
        scored[i] = (len(bgs), total)
    mean = (sum(t for _n, t in scored.values())
            / sum(n for n, _t in scored.values())) if scored else None
    by_src: dict = defaultdict(lambda: [0, 0, 0, 0, 0, []])
    for i, (text, src) in enumerate(docs_spec):
        e = by_src[src]
        e[0] += 1
        if i in scored:
            n, t = scored[i]
            e[1] += 1
            e[3] += t
            e[4] += n
            if t / n <= mean:
                e[2] += 1
                e[5].append(i)
    expected = {}
    for src, (nd, ns, nk, sb, sg, kept) in by_src.items():
        expected[src] = (
            nd, ns, nk, sb, sg,
            round_half_up(sb / sg, 4) if sg > 0 else None,
            hashlib.md5(",".join(str(i) for i in sorted(kept)).encode()).hexdigest(),
        )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t, lang="en", n_chars=len(t))
         for i, (t, s) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            r.source: (r.n_docs, r.n_scored, r.n_kept, r.sum_bits,
                       r.sum_bigrams, r.mean_bits, r.kept_ids_hash)
            for r in q_lm_surprisal_filter(spark, "u").collect()
        }
    finally:
        curation.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=10).map(" ".join),
                          st.sampled_from(["en", "de"])),
                min_size=1, max_size=12))
def test_dsir_importance_select_matches_python_mirror(spark, docs_spec):
    """Property: the DSIR selection equals a pure-Python replay on
    random corpora -- md5-prefix bigram buckets mod 256, the raw and
    target (lang='en') bucket counts, the integer bit log-ratio
    surrogate, per-doc occurrence-weighted sums, and the discrete
    (weight DESC, doc_id ASC) top-k cut.  The 3-symbol alphabet makes
    bucket collisions and weight ties dense; corpora with NO target
    docs exercise the all-zero c_t arm.  The generated corpus is
    REPLICATED to > _DSIR_TOPK docs so the limit-50 cut and its
    doc_id-ASC tiebreak bind on every example (identical replicas tie
    exactly -- r13 review: at <= 12 docs the cut never truncated)."""
    import hashlib
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_LANG,
        _DSIR_TOPK,
        q_dsir_importance_select,
    )

    def bucket(w1, w2):
        h = hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:15]
        return int(h, 16) % _DSIR_BUCKETS

    # replicate past the top-k so the cut truncates on every example
    reps = _DSIR_TOPK // len(docs_spec) + 2
    docs_spec = [d for _ in range(reps) for d in docs_spec]

    toks = {i: [t for t in text.split(" ") if t] for i, (text, _l) in enumerate(docs_spec)}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    doc_buckets = {}
    for i, tk in toks.items():
        bks = [bucket(a, b) for a, b in zip(tk, tk[1:])]
        if not bks:
            continue
        doc_buckets[i] = bks
        raw.update(bks)
        if docs_spec[i][1] == _DSIR_TARGET_LANG:
            tgt.update(bks)

    def bits(x):
        return x.bit_length() - 1

    expected_rows = []
    for i, bks in doc_buckets.items():
        weight = sum(bits(tgt[b] + 1) - bits(raw[b] + 1) for b in bks)
        expected_rows.append((i, "s", docs_spec[i][1], len(bks), weight))
    expected_rows.sort(key=lambda r: (-r[4], r[0]))
    expected = expected_rows[:_DSIR_TOPK]

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=t, lang=l, n_chars=len(t))
         for i, (t, l) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = [tuple(r) for r in q_dsir_importance_select(spark, "u").collect()]
    finally:
        curation.load_tables = orig
    assert got == expected


# --- round 13 mirror batch 2: session windows / window frames / percentile -----


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.tuples(st.integers(min_value=1, max_value=3),      # user
                  st.integers(min_value=0, max_value=12)),    # ts = k * 300 s
        st.integers(min_value=-10, max_value=10),             # value * 0.5
        min_size=1,
        max_size=20,
    )
)
def test_user_session_window_matches_python_mirror(spark, occupancy):
    """Property: the session_window(10 min) operator equals a
    gaps-and-islands Python replay on random sparse streams whose
    300-second grid makes EXACT-gap boundaries (ts step == 600 s)
    dense: an exactly-gap-sized step still MERGES (session_window
    extends the session while next.start <= last + gap; only a
    STRICTLY greater step opens a new one -- the boundary this mirror
    caught the oracle mis-stating as >=), same-timestamp events share
    one session, and end = last + gap.  This is the slot-50 canary's
    arithmetic under randomization instead of the fixture."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_user_session_window,
    )

    base_us = 1_704_067_200_000_000
    gap_us = 600 * 1_000_000
    by_user: dict = {}
    for (uid, k), half in occupancy.items():
        by_user.setdefault(uid, []).append((base_us + k * 300_000_000, half * 0.5))
    expected = set()
    for uid, evs in by_user.items():
        evs.sort()
        sess: list = []
        for us, val in evs:
            if not sess or us - sess[-1][-1][0] > gap_us:
                sess.append([(us, val)])
            else:
                sess[-1].append((us, val))
        for s in sess:
            expected.add((
                uid,
                s[0][0],
                s[-1][0] + gap_us,
                len(s),
                round_half_up(sum(v for _u, v in s), 2),
            ))

    rows = []
    i = 0
    for (uid, k), half in occupancy.items():
        us = base_us + k * 300_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(event_id=i, ts=ts, user_id=uid, event_type="view",
                        value=half * 0.5, props="{}"))
        i += 1
    df = spark.createDataFrame(rows)
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_user_session_window(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),    # custkey
                  st.integers(min_value=0, max_value=3),    # orderdate day
                  st.integers(min_value=0, max_value=10_000)),  # cents
        min_size=1,
        max_size=16,
    )
)
def test_order_first_last_nth_matches_python_mirror(spark, orders_spec):
    """Property: the first/last/nth_value unbounded-frame suite equals
    a Python replay -- (o_orderdate, o_orderkey) ordering with dense
    date ties (4 distinct dates), nth_value(2) NULL on single-order
    customers, one row per customer."""
    from datetime import date, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_order_first_last_nth,
    )

    base = date(2024, 1, 1)
    per_cust: dict = {}
    for key, (cust, day, cents) in enumerate(orders_spec):
        per_cust.setdefault(cust, []).append((day, key, cents / 100.0))
    expected = {}
    for cust, rows_ in per_cust.items():
        rows_.sort()
        prices = [p for _d, _k, p in rows_]
        expected[cust] = (
            prices[0],
            prices[-1],
            prices[1] if len(prices) > 1 else None,
            len(prices),
        )

    df = spark.createDataFrame([
        Row(o_orderkey=key, o_custkey=cust, o_orderdate=base + timedelta(days=day),
            o_totalprice=cents / 100.0, o_orderstatus="O", o_orderpriority="1-URGENT",
            o_clerk="c", o_shippriority=0, o_comment="x")
        for key, (cust, day, cents) in enumerate(orders_spec)
    ])
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"orders": df}
        got = {
            r.o_custkey: (r.first_price, r.last_price, r.second_price, r.n_orders)
            for r in q_order_first_last_nth(spark, "u").collect()
        }
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=8).map(" ".join),
                          st.sampled_from(["A", "B"])),
                min_size=1, max_size=16))
def test_quality_percentile_filter_matches_python_mirror(spark, docs_spec):
    """Property: the corpus-relative 25th-percentile gate equals a
    Python replay of the .5-interpolated percentile (h = 0.25*(n-1),
    linear between the two bracketing order statistics) over the
    unique-token counts -- INCLUDING the unfiltered-split rule (an
    empty text has one '' token, uniq = 1) and the >= cut boundary,
    which the 3-symbol alphabet's dense integer ties hit constantly."""
    import math
    from collections import defaultdict

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_quality_percentile_filter,
    )

    uniq = [len(set(t.split(" "))) for t, _s in docs_spec]
    v = sorted(uniq)
    h = 0.25 * (len(v) - 1)
    lo = math.floor(h)
    cut = v[lo] + (h - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])
    expected: dict = defaultdict(lambda: [0, 0, 0])
    for (t, src), u in zip(docs_spec, uniq):
        e = expected[src]
        e[0] += 1
        if u >= cut:
            e[1] += 1
        else:
            e[2] += 1

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t, lang="en", n_chars=len(t))
         for i, (t, s) in enumerate(docs_spec)]
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {
            r.source: (r.n_docs, r.kept_docs, r.dropped_docs)
            for r in q_quality_percentile_filter(spark, "u").collect()
        }
    finally:
        corpus.load_tables = orig
    assert got == {k: tuple(vv) for k, vv in expected.items()}


# --- round-14 mirror batch: oracled-but-unmirrored discrete arithmetic ------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),     # custkey
                  st.integers(min_value=0, max_value=5),     # day offset
                  st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"])),
        min_size=1,
        max_size=16,
    )
)
def test_scd2_priority_dim_matches_python_mirror(spark, orders_spec):
    """Property: the SCD Type-2 build equals a gaps-and-islands Python
    replay -- per-customer (orderdate, orderkey) ordering with DENSE
    same-day ties (the orderkey tiebreak must bind), same-priority
    islands collapsing into one version, valid_to = next island's
    valid_from (NULL + is_current on the last).  A shared Spark/DuckDB
    misreading of the change-flag or island accounting would pass the
    oracle hash but fail this replay."""
    from datetime import date, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tpm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_scd2_priority_dim,
    )

    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC midnight
    by_cust: dict = {}
    for ok, (ck, day, pri) in enumerate(orders_spec):
        by_cust.setdefault(ck, []).append((base_us + day * 86_400_000_000, ok, pri))
    expected = set()
    for ck, evs in by_cust.items():
        evs.sort()
        islands: list = []  # [priority, valid_from, n_orders]
        for us, _ok, pri in evs:
            if not islands or islands[-1][0] != pri:
                islands.append([pri, us, 1])
            else:
                islands[-1][2] += 1
        for i, (pri, vf, n) in enumerate(islands):
            vt = islands[i + 1][1] if i + 1 < len(islands) else None
            expected.add((ck, i + 1, pri, vf, vt, n, 1 if vt is None else 0))

    rows = [
        Row(o_custkey=ck, o_orderkey=ok, o_orderpriority=pri,
            o_orderdate=date(2024, 1, 1) + timedelta(days=day))
        for ok, (ck, day, pri) in enumerate(orders_spec)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey int, o_orderkey int, o_orderpriority string, "
              "o_orderdate date"
    )
    orig = tpm.load_tables
    try:
        tpm.load_tables = lambda _s, _d, _t: {"orders": df}
        got = {tuple(r) for r in q_scd2_priority_dim(spark, "u").collect()}
    finally:
        tpm.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5),     # user
                  st.integers(min_value=0, max_value=40)),   # 300s slot
        min_size=1,
        max_size=24,
    )
)
def test_session_overlap_pairs_matches_python_mirror(spark, occupancy):
    """Property: the grain-bucketed interval range join equals an
    all-pairs Python sweep -- 30-min-gap sessions on a 300 s grid (so
    EXACT-gap steps are dense: 1800 s = 6 slots must MERGE, only a
    strictly greater step splits), closed-interval overlap s1<=e2 AND
    s2<=e1 including point-touch (overlap_us 0), one count per session
    pair no matter how many grains it spans.  The grain itself is
    auto-tuned from the data; output must be grain-invariant."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_session_overlap_pairs,
    )

    base_us = 1_704_067_200_000_000
    gap_us = 1_800_000_000
    by_user: dict = {}
    for uid, k in occupancy:
        by_user.setdefault(uid, []).append(base_us + k * 300_000_000)
    iv: dict = {}
    for uid, times in by_user.items():
        times.sort()
        sess: list = []
        for us in times:
            if not sess or us - sess[-1][1] > gap_us:
                sess.append([us, us])
            else:
                sess[-1][1] = us
        iv[uid] = sess
    agg: dict = {}
    users = sorted(iv)
    for i, u1 in enumerate(users):
        for u2 in users[i + 1:]:
            for s1, e1 in iv[u1]:
                for s2, e2 in iv[u2]:
                    if s1 <= e2 and s2 <= e1:
                        n, tot = agg.get((u1, u2), (0, 0))
                        agg[(u1, u2)] = (n + 1, tot + min(e1, e2) - max(s1, s2))
    expected = {(u1, u2, n, tot) for (u1, u2), (n, tot) in agg.items()}

    rows = []
    for i, (uid, k) in enumerate(occupancy):
        us = base_us + k * 300_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(user_id=uid, ts=ts, event_id=i))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_session_overlap_pairs(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    # <= 10 user pairs possible: the LIMIT 100 never binds, so the
    # full result set must equal the sweep exactly
    assert got == expected


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein (third implementation vs Spark and DuckDB)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=120),
                  st.booleans(),                             # scale to a x20 key
                  st.integers(min_value=0, max_value=2)),    # nationkey
        min_size=1,
        max_size=20,
    )
)
def test_fuzzy_record_linkage_matches_python_mirror(spark, cust_spec):
    """Property: the edit-distance linkage equals a Python replay --
    deterministic one-char drop at position custkey%8+10, blocking on
    (nationkey, custkey div 1000), levenshtein <= 2 candidates, best
    match by (distance, custkey) struct-min, n_candidates and
    match_correct accounting.  Keys straddle the 1000-block boundary
    and share nations so cross-record candidates are dense."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _LINK_BLOCK,
        _LINK_DROP_BASE,
        _LINK_MAX_DIST,
        _LINK_SAMPLE_MOD,
        q_fuzzy_record_linkage,
    )

    clean: dict = {}
    for v, scaled, nk in cust_spec:
        key = v * _LINK_SAMPLE_MOD if scaled else v
        clean.setdefault(key, (f"Customer#{key:09d}", nk))
    expected = set()
    for key, (name, nk) in clean.items():
        if key % _LINK_SAMPLE_MOD != 0:
            continue
        pos = key % 8 + _LINK_DROP_BASE
        dirty = name[: pos - 1] + name[pos:]
        cands = [
            (_lev(dirty, cname), ck)
            for ck, (cname, cnk) in clean.items()
            if cnk == nk and ck // _LINK_BLOCK == key // _LINK_BLOCK
            and _lev(dirty, cname) <= _LINK_MAX_DIST
        ]
        best = min(cands)
        expected.add((key, best[1], best[0], len(cands),
                      1 if best[1] == key else 0))

    rows = [Row(c_custkey=k, c_name=nm, c_nationkey=nk)
            for k, (nm, nk) in clean.items()]
    df = spark.createDataFrame(
        rows, "c_custkey int, c_name string, c_nationkey int"
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"customer": df}
        got = {tuple(r) for r in q_fuzzy_record_linkage(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=40),    # doc_id
                  st.lists(st.sampled_from(["aa", "ab", "ba", "b"]),
                           min_size=0, max_size=6)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_sorted_neighborhood_dedup_matches_python_mirror(spark, docs_spec):
    """Property: two-pass sorted-neighborhood dedup equals a Python
    replay -- per-pass window PARTITIONED by the key's first character
    (boundary-missed neighbors are part of the spec, not a bug),
    lead-1 and lead-2 successors on (key, doc_id) order, pair-set
    union over the forward and reversed-text keys, exact 4/5 Jaccard
    cross-multiply including the 0/0 empty-token pair (kept, jac
    NULL).  The tiny vocabulary makes key ties and the Jaccard
    boundary dense."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _SNM_DEN,
        _SNM_KEY_LEN,
        _SNM_NUM,
        _SNM_WINDOW,
        q_sorted_neighborhood_dedup,
    )

    docs = {doc_id: " ".join(toks) for doc_id, toks in docs_spec}
    tok_sets = {d: set(t.split(" ")) - {""} for d, t in docs.items()}

    def pass_pairs(keyed):
        by_part: dict = {}
        for doc_id, key in keyed:
            by_part.setdefault(key[:1], []).append((key, doc_id))
        out = set()
        for part in by_part.values():
            part.sort()
            for i in range(len(part)):
                for k in range(1, _SNM_WINDOW):
                    if i + k < len(part):
                        out.add((part[i][1], part[i + k][1]))
        return out

    fwd = pass_pairs([(d, t[:_SNM_KEY_LEN]) for d, t in docs.items()])
    rev = pass_pairs([(d, t[::-1][:_SNM_KEY_LEN]) for d, t in docs.items()])
    expected = set()
    for a, b in {(min(p), max(p)) for p in fwd | rev}:
        i = len(tok_sets[a] & tok_sets[b])
        u = len(tok_sets[a] | tok_sets[b])
        if _SNM_DEN * i >= _SNM_NUM * u:
            jac = None if u == 0 else round_half_up(i / u, 4)
            expected.add((a, b, jac))

    rows = [Row(doc_id=d, text=t) for d, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {tuple(r) for r in q_sorted_neighborhood_dedup(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.booleans(),                              # is error
                  st.integers(min_value=0, max_value=72),     # hour slot
                  st.integers(min_value=0, max_value=3),      # 15-min quarter
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1,
        max_size=20,
    )
)
def test_hourly_gapfill_matches_python_mirror(spark, events_spec):
    """Property: the gap-filled hourly error series equals a Python
    replay -- spine from the first to the last ERROR hour inclusive,
    empty hours as (0, 0.0), non-error events invisible, and the
    no-errors degenerate producing ZERO rows (a NULL-bounds sequence
    must not explode).  Values on a 0.25 grid keep double sums
    exact."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_hourly_gapfill,
    )

    base_us = 1_704_067_200_000_000
    errors: dict = {}
    for is_err, h, q, v in events_spec:
        if is_err:
            n, tot = errors.get(h, (0, 0.0))
            errors[h] = (n + 1, tot + v * 0.25)
    expected = set()
    if errors:
        for h in range(min(errors), max(errors) + 1):
            n, tot = errors.get(h, (0, 0.0))
            expected.add((base_us + h * 3_600_000_000, n,
                          round_half_up(tot, 2) if n else 0.0))

    rows = []
    for i, (is_err, h, q, v) in enumerate(events_spec):
        us = base_us + h * 3_600_000_000 + q * 900_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(ts=ts, event_type="error" if is_err else "view",
                        value=v * 0.25))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_hourly_gapfill(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=4),      # user
                  st.integers(min_value=0, max_value=10),     # hour slot
                  st.sampled_from(["view", "click"]),
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1,
        max_size=20,
    )
)
def test_latest_event_per_user_matches_python_mirror(spark, events_spec):
    """Property: the struct-max arg-max equals a Python replay of the
    window-rank spec -- the coarse hour grid makes same-timestamp ties
    dense, so the event_id tiebreak inside the struct ordering must
    bind exactly (max event_id wins at equal ts)."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_latest_event_per_user,
    )

    base_us = 1_704_067_200_000_000
    best: dict = {}
    for eid, (uid, h, etype, v) in enumerate(events_spec):
        us = base_us + h * 3_600_000_000
        cand = (us, eid, etype, v * 0.25)
        if uid not in best or cand[:2] > best[uid][:2]:
            best[uid] = cand
    expected = {
        (uid, us, eid, etype, round_half_up(v, 2))
        for uid, (us, eid, etype, v) in best.items()
    }

    rows = []
    for eid, (uid, h, etype, v) in enumerate(events_spec):
        us = base_us + h * 3_600_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(user_id=uid, ts=ts, event_id=eid, event_type=etype,
                        value=v * 0.25))
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string, "
              "value double"
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_latest_event_per_user(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


# --- round-14 mirror batch 2: grouping sets, pivots, JSON, date math --------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", None]),          # event_type
                  st.integers(min_value=0, max_value=2),      # year offset
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1,
        max_size=16,
    )
)
def test_cube_events_matches_python_mirror(spark, events_spec):
    """Property: CUBE(event_type, year) equals an explicit Python
    enumeration of its four grouping sets -- including the ambiguity
    CUBE is famous for: a genuine NULL event_type in the DATA produces
    rows display-identical to subtotal rows, so the result is a
    MULTISET (two (NULL, yr, ...) rows with different counts must both
    survive).  Counter compare, not set compare."""
    from collections import Counter
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_cube_events

    def agg(rows):
        n = len(rows)
        return n, round_half_up(sum(v for v in rows), 2)

    vals: dict = {}
    for et, y, v in events_spec:
        vals.setdefault((et, 2024 + y), []).append(v * 0.25)
    expected: Counter = Counter()
    # grouping set (event_type, year)
    for (et, yr), vs in vals.items():
        expected[(et, yr) + agg(vs)] += 1
    # (event_type)
    by_et: dict = {}
    for (et, yr), vs in vals.items():
        by_et.setdefault(et, []).extend(vs)
    for et, vs in by_et.items():
        expected[(et, None) + agg(vs)] += 1
    # (year)
    by_yr: dict = {}
    for (et, yr), vs in vals.items():
        by_yr.setdefault(yr, []).extend(vs)
    for yr, vs in by_yr.items():
        expected[(None, yr) + agg(vs)] += 1
    # ()
    allv = [v for vs in vals.values() for v in vs]
    expected[(None, None) + agg(allv)] += 1

    rows = [
        Row(event_type=et, ts=datetime(2024 + y, 3, 1), value=v * 0.25)
        for et, y, v in events_spec
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = Counter(tuple(r) for r in q_cube_events(spark, "u").collect())
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.integers(min_value=0, max_value=2),
                  st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=16,
    )
)
def test_grouping_sets_events_matches_python_mirror(spark, events_spec):
    """Property: explicit GROUPING SETS with grouping_id equals the
    Python enumeration -- gid encodes WHICH set a row came from (first
    argument is the high bit: (e,y)=0, (e)=1, (y)=2, ()=3), so unlike
    the CUBE twin a genuine NULL group value is unambiguous and plain
    set compare suffices."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_grouping_sets_events,
    )

    def agg(vs):
        return len(vs), round_half_up(sum(vs), 2)

    vals: dict = {}
    for et, y, v in events_spec:
        vals.setdefault((et, 2024 + y), []).append(v * 0.25)
    expected = set()
    for (et, yr), vs in vals.items():
        expected.add((et, yr, 0) + agg(vs))
    by_et: dict = {}
    by_yr: dict = {}
    for (et, yr), vs in vals.items():
        by_et.setdefault(et, []).extend(vs)
        by_yr.setdefault(yr, []).extend(vs)
    for et, vs in by_et.items():
        expected.add((et, None, 1) + agg(vs))
    for yr, vs in by_yr.items():
        expected.add((None, yr, 2) + agg(vs))
    allv = [v for vs in vals.values() for v in vs]
    expected.add((None, None, 3) + agg(allv))

    rows = [
        Row(event_type=et, ts=datetime(2024 + y, 3, 1), value=v * 0.25)
        for et, y, v in events_spec
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    orig = adv.register_views
    try:
        adv.register_views = (
            lambda s, _d, _t: df.createOrReplaceTempView("events")
        )
        got = {tuple(r) for r in q_grouping_sets_events(spark, "u").collect()}
    finally:
        adv.register_views = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),      # hour of day
                  st.sampled_from(["view", "click", "purchase", "signup",
                                   "error", "bogus"]),
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1,
        max_size=20,
    )
)
def test_event_pivot_matches_python_mirror(spark, events_spec):
    """Property: the hour x type pivot equals a Python replay -- a
    type OUTSIDE the pinned pivot column list ('bogus') contributes NO
    cell but still creates its hour's row (groupBy sees every row),
    and absent cells are NULL, matching SQL conditional-aggregation
    semantics."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_event_pivot

    types = ["view", "click", "purchase", "signup", "error"]
    sums: dict = {}
    hours = set()
    for h, et, v in events_spec:
        hours.add(h)
        if et in types:
            sums[(h, et)] = sums.get((h, et), 0.0) + v * 0.25
    expected = set()
    for h in hours:
        cells = tuple(
            round_half_up(sums[(h, et)], 2) if (h, et) in sums else None
            for et in types
        )
        expected.add((h,) + cells)

    rows = [
        Row(ts=datetime(2024, 1, 1, h), event_type=et, value=v * 0.25)
        for h, et, v in events_spec
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_event_pivot(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=1),      # order month
                  st.integers(min_value=0, max_value=27)),    # order day
        min_size=1, max_size=3,
    ),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),      # order index
                  st.integers(min_value=0, max_value=40)),    # ship offset days
        min_size=1, max_size=12,
    ),
)
def test_order_date_math_matches_python_mirror(spark, orders_spec, lines_spec):
    """Property: the date-arithmetic rollup equals a Python replay --
    month truncation, last_day month-end as a midnight timestamp, the
    datediff day count (ship offsets cross month boundaries), and the
    HALF_UP 2-dp average over an integer day sum."""
    from datetime import date, datetime, timedelta, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_order_date_math

    def us(d: date) -> int:
        return int(
            datetime(d.year, d.month, d.day, tzinfo=timezone.utc).timestamp() * 1e6
        )

    orders = [
        (ok, date(2024, 1 + m, 1 + d)) for ok, (m, d) in enumerate(orders_spec)
    ]
    by_month: dict = {}
    lines = []
    for oi, off in lines_spec:
        ok, odate = orders[oi % len(orders)]
        lines.append((ok, odate + timedelta(days=off)))
        by_month.setdefault(date(odate.year, odate.month, 1), []).append(off)
    expected = set()
    for mstart, offs in by_month.items():
        nxt = date(mstart.year + (mstart.month == 12),
                   mstart.month % 12 + 1, 1)
        mend = nxt - timedelta(days=1)
        expected.add((
            us(mstart), us(mend), len(offs),
            round_half_up(sum(offs) / len(offs), 2), max(offs),
        ))

    odf = spark.createDataFrame(
        [Row(o_orderkey=ok, o_orderdate=d) for ok, d in orders],
        "o_orderkey int, o_orderdate date",
    )
    ldf = spark.createDataFrame(
        [Row(l_orderkey=ok, l_shipdate=s) for ok, s in lines],
        "l_orderkey int, l_shipdate date",
    )
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"orders": odf, "lineitem": ldf}
        got = {tuple(r) for r in q_order_date_math(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.sampled_from([7, 50, 51, 100, None, "missing",
                                   "malformed", "nullprops"]),
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1,
        max_size=16,
    )
)
def test_props_json_matches_python_mirror(spark, events_spec):
    """Property: typed from_json extraction equals a Python replay --
    a missing key, an explicit JSON null, malformed JSON, and a NULL
    props column all yield k NULL (skipped by sum/weighted/count; an
    all-NULL group sums to NULL), and the k > 50 strict boundary binds
    at exactly 50 vs 51."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import q_props_json

    def props_of(k):
        if k == "missing":
            return "{}"
        if k == "malformed":
            return "oops not json"
        if k == "nullprops":
            return None
        if k is None:
            return '{"k": null}'
        return '{"k": %d}' % k

    def k_of(k):
        return k if isinstance(k, int) else None

    groups: dict = {}
    for et, k, v in events_spec:
        groups.setdefault(et, []).append((k_of(k), v * 0.25))
    expected = set()
    for et, rows_ in groups.items():
        ks = [k for k, _v in rows_ if k is not None]
        wsum = sum(k * v for k, v in rows_ if k is not None)
        expected.add((
            et,
            sum(ks) if ks else None,
            round_half_up(wsum, 2) if ks else None,
            sum(1 for k in ks if k > 50),
        ))

    rows = [Row(event_type=et, props=props_of(k), value=v * 0.25)
            for et, k, v in events_spec]
    df = spark.createDataFrame(rows, "event_type string, props string, value double")
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_props_json(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.booleans(),                              # event_id present
                  st.sampled_from(["view", "purchase", "bogus", None]),
                  st.booleans(),                              # user present
                  st.integers(min_value=0, max_value=48),     # hour slot
                  st.sampled_from([-4, 0, 20, 40_000, 40_001, 80_000])),  # value*0.25
        # 40_000*0.25 = 10000.0 exactly: NOT extreme (strict >);
        # 40_001*0.25 = 10000.25: extreme -- both boundary sides sampled
        min_size=1,
        max_size=20,
    )
)
def test_quality_hourly_matches_python_mirror(spark, events_spec):
    """Property: the trailing-24h validity rollup equals a Python
    replay of the first-match-wins rule chain (null_event_id >
    null_event_type > invalid_event_type > missing_user_for_purchase >
    negative_value > extreme_value) plus the anchor filter
    ts >= max(ts) - 24h INCLUSIVE -- the hour grid makes the
    exactly-24h boundary dense, and the value grid sits on both rule
    boundaries (< 0 strict, > 10000 strict)."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_quality_hourly

    base_us = 1_704_067_200_000_000
    valid_types = {"view", "click", "purchase", "signup", "error"}

    def tag(eid, et, uid, val):
        if eid is None:
            return "null_event_id"
        if et is None:
            return "null_event_type"
        if et not in valid_types:
            return "invalid_event_type"
        if et == "purchase" and uid is None:
            return "missing_user_for_purchase"
        if val < 0.0:
            return "negative_value"
        if val > 10_000.0:
            return "extreme_value"
        return None

    evs = []
    for i, (has_id, et, has_user, h, vq) in enumerate(events_spec):
        evs.append((
            str(i) if has_id else None, et, i if has_user else None,
            base_us + h * 3_600_000_000, vq * 0.25,
        ))
    max_us = max(e[3] for e in evs)
    cutoff = max_us - 24 * 3_600_000_000
    by_hour: dict = {}
    for eid, et, uid, us, val in evs:
        if us >= cutoff:
            by_hour.setdefault(us, []).append(tag(eid, et, uid, val) is None)
    vals_by_hour: dict = {}
    for eid, et, uid, us, val in evs:
        if us >= cutoff:
            vals_by_hour.setdefault(us, []).append(val)
    expected = set()
    for us, flags in by_hour.items():
        vs = vals_by_hour[us]
        expected.add((
            us, len(flags), sum(flags), len(flags) - sum(flags),
            round_half_up(sum(vs) / len(vs), 2),
        ))

    rows = []
    for eid, et, uid, us, val in evs:
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(event_id=eid, ts=ts, user_id=uid, event_type=et, value=val))
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id int, event_type string, "
              "value double"
    )
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_quality_hourly(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.tuples(
        st.lists(st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False,
                           width=32),
                 min_size=64, max_size=64),
        st.integers(min_value=0, max_value=9),               # label
    ),
    min_size=2, max_size=8))
def test_semantic_decontaminate_matches_python_mirror(spark, vec_spec):
    """Property: the asymmetric embedding decontamination probe equals
    a Python replay -- the SAME int64 plane-dot bucketing as the
    near-dup mirror but joined train x eval instead of self-joined
    (labels 8-9 are eval), cosine verify with the round-4 threshold
    and zero-norm drop, then per-train (n_eval_hits, max_cosine,
    min eval id).  Degenerate splits (no eval vectors, or all eval)
    must yield zero rows."""
    import math

    import numpy as np

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.functions.similarity import (
        _QUANT_SCALE,
        _int_plane,
    )
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _SEM_DECON_EVAL_LABELS,
        q_semantic_decontaminate,
    )

    vectors = [v for v, _l in vec_spec]
    labels = [l for _v, l in vec_spec]
    widened = [[float(np.float32(x)) for x in vec] for vec in vectors]
    qv = [[math.floor(x * _QUANT_SCALE) for x in vec] for vec in widened]
    buckets_of: list = []
    for v in qv:
        keys = set()
        for t in range(16):
            key = t * 16
            for j in range(4):
                plane = _int_plane(t * 4 + j, 64)
                if sum(a * b for a, b in zip(v, plane)) >= 0:
                    key += 1 << j
            keys.add(key)
        buckets_of.append(keys)
    is_eval = [l in _SEM_DECON_EVAL_LABELS for l in labels]
    hits: dict = {}
    for i in range(len(vectors)):
        if is_eval[i]:
            continue
        for j in range(len(vectors)):
            if not is_eval[j] or not (buckets_of[i] & buckets_of[j]):
                continue
            accd = acc1 = acc2 = 0.0
            for x, y in zip(widened[i], widened[j]):
                accd += x * y
                acc1 += x * x
                acc2 += y * y
            den = math.sqrt(acc1) * math.sqrt(acc2)
            if den == 0.0:
                continue
            cos = round_half_up(accd / den, 4)
            if cos >= 0.4:
                hits.setdefault(i, []).append((j, cos))
    expected = {
        (i, len(hs), max(c for _j, c in hs), min(j for j, _c in hs))
        for i, hs in hits.items()
    }

    emb = spark.createDataFrame(
        [(i, vec, l) for i, (vec, l) in enumerate(vec_spec)],
        "vec_id bigint, embedding array<float>, label int",
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"embeddings": emb}
        got = {tuple(r) for r in q_semantic_decontaminate(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected


# --- round-14 mirror batch 3: scalar surfaces (strings, arrays, maps, HOFs) --


_hof_tok = st.sampled_from(["x", "abcd", "a" * 8, "a" * 9, "a" * 12, "a" * 13, ""])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]),
                  st.lists(_hof_tok, min_size=0, max_size=6)),
        min_size=1, max_size=12,
    )
)
def test_doc_hof_stats_matches_python_mirror(spark, docs_spec):
    """Property: the array-HOF token-shape rollup equals a Python
    replay -- the single-space tokenizer KEEPS empty tokens (double
    spaces and empty texts shape the mean's denominator), the >12 /
    >8 length boundaries are sampled on both sides, and the per-doc
    mean feeds a HALF_UP 4-dp average."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import q_doc_hof_stats

    per_source: dict = {}
    for src, toks in docs_spec:
        text = " ".join(toks)
        tk = text.split(" ")  # keeps empties, [''] for empty text
        mean = sum(len(t) for t in tk) / len(tk)
        has_long = any(len(t) > 12 for t in tk)
        n8 = sum(1 for t in tk if len(t) > 8)
        per_source.setdefault(src, []).append((mean, has_long, n8))
    expected = set()
    for src, feats in per_source.items():
        n = len(feats)
        expected.add((
            src, n,
            round_half_up(sum(m for m, _h, _k in feats) / n, 4),
            sum(1 for _m, h, _k in feats if h),
            round_half_up(sum(k for _m, _h, k in feats) / n, 4),
        ))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=src, text=" ".join(toks))
         for i, (src, toks) in enumerate(docs_spec)],
        "doc_id int, source string, text string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_doc_hof_stats(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["B#1", "B#2"]),                  # brand
                  st.sampled_from(["STANDARD ANODIZED", "STANDARD BURNISHED",
                                   "SMALL PLATED", "tiny"]),        # type
                  st.sampled_from(["red apple", "bored horse",
                                   "blue shred", "plain name"]),    # name
                  st.integers(min_value=1, max_value=1500)),        # size
        min_size=1, max_size=16,
    )
)
def test_part_string_funcs_matches_python_mirror(spark, parts_spec):
    """Property: the string-function rollup equals a Python replay --
    upper(substr) prefix dedup at the exact 8-char boundary (the two
    STANDARD types share it), Spark's lpad TRUNCATING a 4-digit size
    to its 3-char prefix, %red% matching inside words (shred, bored is
    a non-match... 'bored' does not contain 'red'? it does: bo-RED --
    the mirror decides, not intuition), and codepoint max over the
    rebuilt brand key."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_part_string_funcs,
    )

    def lpad3(n: int) -> str:
        s = str(n)
        return s[:3] if len(s) >= 3 else "0" * (3 - len(s)) + s

    groups: dict = {}
    for brand, ptype, name, size in parts_spec:
        groups.setdefault(brand, []).append((ptype, name, size))
    expected = set()
    for brand, rows_ in groups.items():
        expected.add((
            brand,
            len(rows_),
            len({t[:8].upper() for t, _n, _s in rows_}),
            max(len(n) for _t, n, _s in rows_),
            min(lpad3(s) for _t, _n, s in rows_),
            sum(1 for _t, n, _s in rows_ if "red" in n),
            max(f"{brand}#{n.replace(' ', '_')}" for _t, n, _s in rows_),
        ))

    df = spark.createDataFrame(
        [Row(p_brand=b, p_type=t, p_name=n, p_size=s)
         for b, t, n, s in parts_spec],
        "p_brand string, p_type string, p_name string, p_size int",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"part": df}
        got = {tuple(r) for r in q_part_string_funcs(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),
                  st.sampled_from(["view", "click", "purchase", "signup",
                                   "error", "bogus"])),
        min_size=1, max_size=20,
    )
)
def test_user_map_funcs_matches_python_mirror(spark, events_spec):
    """Property: the map-function surface equals a Python replay --
    map_filter keeps only positive counts, the joined key list is
    sorted, aggregate folds from 0, and the documented edge: a user
    whose events are ALL outside the map vocabulary ('bogus') has an
    EMPTY active map, so array_max yields NULL (the oracle-facing
    greatest() would say 0 -- the fixture never samples this; the
    mirror pins the Spark semantics)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _MAP_EVENT_TYPES,
        q_user_map_funcs,
    )

    counts: dict = {}
    for uid, et in events_spec:
        counts.setdefault(uid, {}).setdefault(et, 0)
        counts[uid][et] += 1
    expected = set()
    for uid, c in counts.items():
        active = {et: n for et, n in c.items()
                  if et in _MAP_EVENT_TYPES and n > 0}
        expected.add((
            uid,
            ",".join(sorted(active)),
            len(active),
            sum(active.values()),
            max((n * n for n in active.values()), default=None),
        ))

    df = spark.createDataFrame(
        [Row(user_id=uid, event_type=et) for uid, et in events_spec],
        "user_id int, event_type string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_user_map_funcs(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=200),   # hour slots
             min_size=1, max_size=16)
)
def test_late_arrivals_matches_python_mirror(spark, slots):
    """Property: the late-arrival flag equals a Python replay of the
    STRICT ts < max(ts) - 7d rule -- the hour grid makes the
    exactly-168h boundary dense (an event exactly 7 days before the
    anchor is NOT late)."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_late_arrivals

    base_us = 1_704_067_200_000_000
    times = [base_us + h * 3_600_000_000 for h in slots]
    cutoff = max(times) - 7 * 24 * 3_600_000_000
    n_late = sum(1 for t in times if t < cutoff)
    expected = {(False, len(times) - n_late)}
    if n_late:
        expected.add((True, n_late))

    rows = []
    for i, t in enumerate(times):
        ts = datetime.fromtimestamp(t / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(ts=ts))
    df = spark.createDataFrame(rows, "ts timestamp")
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_late_arrivals(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=2),
                  st.integers(min_value=0, max_value=4),    # coarse ts grid
                  st.sampled_from(["v", "c", "p"])),
        min_size=1, max_size=24,
    )
)
def test_user_event_paths_matches_python_mirror(spark, events_spec):
    """Property: the collect->sort->slice->join path builder equals a
    Python replay -- the coarse grid makes same-timestamp ties dense
    so the struct sort's event_id tiebreak binds, and >10 events per
    user bind the first-10 slice."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_user_event_paths

    base_us = 1_704_067_200_000_000
    by_user: dict = {}
    for eid, (uid, k, et) in enumerate(events_spec):
        by_user.setdefault(uid, []).append((base_us + k * 60_000_000, eid, et))
    expected = set()
    for uid, evs in by_user.items():
        evs.sort()
        path = "->".join(et for _t, _e, et in evs[:10])
        expected.add((uid, path, len(evs)))

    rows = []
    for eid, (uid, k, et) in enumerate(events_spec):
        us = base_us + k * 60_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(user_id=uid, ts=ts, event_id=eid, event_type=et))
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_user_event_paths(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["the", "a", "of", "zebra", "qux", ""]),
                 min_size=0, max_size=6),
        min_size=1, max_size=10,
    )
)
def test_doc_array_ops_matches_python_mirror(spark, docs_toks):
    """Property: the array set-operation surface equals a Python
    set replay -- distinct tokens vs the 8-word stopword vocabulary,
    with empty tokens (double spaces / empty text -> ['']) counted as
    content, never as stopwords."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _STOPWORDS,
        q_doc_array_ops,
    )

    stop = set(_STOPWORDS)
    expected = set()
    for i, toks in enumerate(docs_toks):
        tk = set(" ".join(toks).split(" "))
        expected.add((
            i, len(tk & stop), len(tk - stop), len(tk | stop),
        ))

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(docs_toks)],
        "doc_id int, text string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_doc_array_ops(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


# --- round-14 mirror batch 4: rank fences, spines, correlated mins ----------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.one_of(st.none(),
                            st.integers(min_value=-20, max_value=400))),
        min_size=1, max_size=24,
    )
)
def test_iqr_outlier_summary_matches_python_mirror(spark, events_spec):
    """Property: the Tukey-fence outlier rollup equals a Python replay
    -- DISCRETE rank quartiles (k = ceil(p*n), never interpolated),
    NULL values dropped before ranking, strict > / < fence compares on
    exact quarter-grid doubles, and the 4-dp display rounding."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_iqr_outlier_summary,
    )

    vals: dict = {}
    for et, v in events_spec:
        if v is not None:
            vals.setdefault(et, []).append(v * 0.25)
    expected = set()
    for et, vs in vals.items():
        vs.sort()
        n = len(vs)
        q1 = vs[-(-n // 4) - 1]          # ceil(n/4)
        q3 = vs[-(-(3 * n) // 4) - 1]    # ceil(3n/4)
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        n_hi = sum(1 for v in vs if v > hi)
        n_lo = sum(1 for v in vs if v < lo)
        expected.add((
            et, n, round_half_up(q1, 4), round_half_up(q3, 4),
            n_hi, n_lo, round_half_up(n_hi / n, 4),
        ))

    rows = [Row(event_type=et, value=None if v is None else v * 0.25)
            for et, v in events_spec]
    df = spark.createDataFrame(rows, "event_type string, value double")
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_iqr_outlier_summary(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=24)),   # day slot
        min_size=1, max_size=24,
    )
)
def test_forecast_baseline_matches_python_mirror(spark, events_spec):
    """Property: the seasonal-naive / persistence baseline scorer
    equals a Python replay -- dense per-type day spine over the GLOBAL
    day range (types observed anywhere get zero-filled rows
    everywhere), lag-7 / lag-1 over the spine, the trailing-14-day
    cut, and the integer absolute-error sums."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _FC_EVAL,
        _FC_SEASON,
        q_forecast_baseline,
    )

    base_day = 1_704_067_200_000_000 // 86_400_000_000
    cnts: dict = {}
    for et, d in events_spec:
        cnts[(et, d)] = cnts.get((et, d), 0) + 1
    days = [d for _et, d in cnts]
    mn, mx = min(days), max(days)
    types = sorted({et for et, _d in cnts})
    expected = set()
    for et in types:
        series = {d: cnts.get((et, d), 0) for d in range(mn, mx + 1)}
        scored = []
        for d in range(mn, mx + 1):
            if d - _FC_SEASON < mn or d <= mx - _FC_EVAL:
                continue
            scored.append((
                abs(series[d] - series[d - _FC_SEASON]),
                abs(series[d] - series[d - 1]),
            ))
        if scored:
            n = len(scored)
            ss = sum(s for s, _p in scored)
            sp = sum(p for _s, p in scored)
            expected.add((
                et, n, ss, sp,
                round_half_up(ss / n, 4), round_half_up(sp / n, 4),
            ))

    rows = []
    for i, (et, d) in enumerate(events_spec):
        us = (base_day + d) * 86_400_000_000
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(event_type=et, ts=ts))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_forecast_baseline(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # order index
                  st.integers(min_value=0, max_value=1),     # supplier key
                  st.integers(min_value=1, max_value=400)),  # cents grid
        min_size=1, max_size=16,
    ),
    st.lists(st.integers(min_value=0, max_value=2),          # order years
             min_size=1, max_size=4),
)
def test_market_share_matches_python_mirror(spark, lines_spec, order_years):
    """Property: the TPC-H Q8-shaped conditional share equals a Python
    replay -- floor(x*10000+0.5) fixed-point cents (identical IEEE
    double expression order), the NATION_7 conditional numerator, and
    the 6-dp HALF_UP share of two exact BIGINTs."""
    import math
    from datetime import date

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        _SHARE_NATION,
        q_market_share,
    )

    nations = {0: _SHARE_NATION, 1: "NATION_3"}
    per_year: dict = {}
    for oi, sk, cents_grid in lines_spec:
        year = 2020 + order_years[oi % len(order_years)]
        price, disc = cents_grid * 0.25, 0.05
        c = math.floor(price * (1 - disc) * 10000 + 0.5)
        nat, tot = per_year.get(year, (0, 0))
        if nations[sk] == _SHARE_NATION:
            nat += c
        per_year[year] = (nat, tot + c)
    expected = {
        (y, nat / 10000.0, tot / 10000.0, round_half_up(nat / tot, 6))
        for y, (nat, tot) in per_year.items()
    }

    orders = spark.createDataFrame(
        [Row(o_orderkey=oi, o_orderdate=date(2020 + order_years[oi % len(order_years)] , 3, 1))
         for oi in range(4)],
        "o_orderkey int, o_orderdate date",
    )
    lines = spark.createDataFrame(
        [Row(l_orderkey=oi, l_suppkey=sk,
             l_extendedprice=g * 0.25, l_discount=0.05)
         for oi, sk, g in lines_spec],
        "l_orderkey int, l_suppkey int, l_extendedprice double, l_discount double",
    )
    suppliers = spark.createDataFrame(
        [Row(s_suppkey=k, s_nationkey=k) for k in (0, 1)],
        "s_suppkey int, s_nationkey int",
    )
    nation_df = spark.createDataFrame(
        [Row(n_nationkey=k, n_name=v) for k, v in nations.items()],
        "n_nationkey int, n_name string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {
            "nation": nation_df, "supplier": suppliers,
            "orders": orders, "lineitem": lines,
        }
        got = {tuple(r) for r in q_market_share(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),     # part key
                  st.integers(min_value=0, max_value=2),     # supplier key
                  st.integers(min_value=1, max_value=16),    # price grid
                  st.sampled_from([1, 2, 4])),               # quantity (pow2)
        min_size=1, max_size=16,
    )
)
def test_min_cost_supplier_matches_python_mirror(spark, lines_spec):
    """Property: the TPC-H Q2-shaped correlated-min equals a Python
    replay -- unit price as exact double division (power-of-two
    quantities over a quarter grid), EVERY line tied at the per-part
    minimum counted (not one winner), and the distinct-supplier count
    over exactly those tied lines."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_min_cost_supplier,
    )

    brands = {0: "B#1", 1: "B#1", 2: "B#2"}
    up = [(pk, sk, (g * 0.25) / q) for pk, sk, g, q in lines_spec]
    mins: dict = {}
    for pk, _sk, u in up:
        mins[pk] = min(mins.get(pk, u), u)
    per_brand: dict = {}
    for pk, sk, u in up:
        if u == mins[pk]:
            cnt, sups = per_brand.get(brands[pk], (0, set()))
            per_brand[brands[pk]] = (cnt + 1, sups | {sk})
    expected = {(b, c, len(s)) for b, (c, s) in per_brand.items()}

    part = spark.createDataFrame(
        [Row(p_partkey=k, p_brand=v) for k, v in brands.items()],
        "p_partkey int, p_brand string",
    )
    lines = spark.createDataFrame(
        [Row(l_partkey=pk, l_suppkey=sk,
             l_extendedprice=g * 0.25, l_quantity=float(q))
         for pk, sk, g, q in lines_spec],
        "l_partkey int, l_suppkey int, l_extendedprice double, l_quantity double",
    )
    orig = adv.register_views
    try:
        def fake_views(s, _d, _t):
            part.createOrReplaceTempView("part")
            lines.createOrReplaceTempView("lineitem")
        adv.register_views = fake_views
        got = {tuple(r) for r in q_min_cost_supplier(spark, "u").collect()}
    finally:
        adv.register_views = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]),
                  st.sampled_from(["hello  world", " hello world ",
                                   "HELLO\tworld", "hello world", "other",
                                   ""])),
        min_size=1, max_size=12,
    )
)
def test_doc_fingerprints_matches_python_mirror(spark, docs_spec):
    """Property: the normalized-md5 exact-dup fingerprint equals a
    Python replay -- whitespace runs (spaces AND tabs) collapse to one
    space, trim, lowercase, md5 -- so the whitespace/case variants of
    one text share a fingerprint and distinct counts collapse."""
    import hashlib
    import re

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import q_doc_fingerprints

    def fp(text: str) -> str:
        return hashlib.md5(
            re.sub(r"\s+", " ", text).strip().lower().encode()
        ).hexdigest()

    per_source: dict = {}
    for src, text in docs_spec:
        per_source.setdefault(src, []).append(fp(text))
    expected = {
        (src, len(fps), len(set(fps))) for src, fps in per_source.items()
    }

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=src, text=t)
         for i, (src, t) in enumerate(docs_spec)],
        "doc_id int, source string, text string",
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_doc_fingerprints(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),      # hour of day
                  st.sampled_from(["view", "click", "purchase", "error"]),
                  st.integers(min_value=0, max_value=40)),    # value grid
        min_size=1, max_size=16,
    )
)
def test_event_unpivot_matches_python_mirror(spark, events_spec):
    """Property: the pivot -> stack round trip equals a Python replay
    -- every hour with ANY event (including types outside the pivot
    list, e.g. 'error') yields exactly three stacked rows, absent
    cells as NULL."""
    from datetime import datetime

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import q_event_unpivot

    types = ["view", "click", "purchase"]
    sums: dict = {}
    hours = set()
    for h, et, v in events_spec:
        hours.add(h)
        if et in types:
            sums[(h, et)] = sums.get((h, et), 0.0) + v * 0.25
    expected = set()
    for h in hours:
        for et in types:
            cell = round_half_up(sums[(h, et)], 2) if (h, et) in sums else None
            expected.add((h, et, cell))

    rows = [
        Row(ts=datetime(2024, 1, 1, h), event_type=et, value=v * 0.25)
        for h, et, v in events_spec
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    orig = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_event_unpivot(spark, "u").collect()}
    finally:
        core.load_tables = orig
    assert got == expected


# --- round-14 mirror batch 5: windows, laterals, rollups, profiling ---------


def _ntile(i: int, n: int, k: int = 4) -> int:
    """Standard SQL ntile: first n%k buckets get ceil(n/k) rows."""
    base, rem = n // k, n % k
    if i < rem * (base + 1):
        return i // (base + 1) + 1
    return rem + (i - rem * (base + 1)) // base + 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=2),     # custkey
                  st.integers(min_value=0, max_value=3),     # orderdate day
                  st.integers(min_value=0, max_value=4000)), # cents grid
        min_size=1, max_size=16,
    )
)
def test_order_window_suite_matches_python_mirror(spark, orders_spec):
    """Property: the full window suite equals a Python replay --
    row_number/ntile(4)/lag/lead/running-sum/percent_rank over ONE
    (o_orderdate, o_orderkey) ordering with dense date ties, ntile's
    uneven-bucket rule (first n%4 buckets take the extra row),
    BIGINT-cents running totals, and percent_rank = (rank-1)/(n-1)
    with the single-row 0.0 convention."""
    from datetime import date, timedelta

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_order_window_suite,
    )

    import math

    by_cust: dict = {}
    for ok, (ck, d, cg) in enumerate(orders_spec):
        price = cg * 0.25
        cents = math.floor(price * 100 + 0.5)
        by_cust.setdefault(ck, []).append((d, ok, cents))
    expected = set()
    for ck, evs in by_cust.items():
        evs.sort()
        n = len(evs)
        run = 0
        for i, (d, ok, cents) in enumerate(evs):
            run += cents
            expected.add((
                ok, ck, i + 1, _ntile(i, n),
                evs[i - 1][2] if i > 0 else None,
                evs[i + 1][2] if i + 1 < n else None,
                run,
                round_half_up(i / (n - 1), 6) if n > 1 else 0.0,
            ))

    rows = [
        Row(o_orderkey=ok, o_custkey=ck,
            o_orderdate=date(2024, 1, 1) + timedelta(days=d),
            o_totalprice=cg * 0.25)
        for ok, (ck, d, cg) in enumerate(orders_spec)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey int, o_custkey int, o_orderdate date, "
              "o_totalprice double"
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {"orders": df}
        got = {tuple(r) for r in q_order_window_suite(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),      # order index
                  st.sampled_from([50.0, 75.25, 100.0, 150.5])),  # quantity
        min_size=1, max_size=12,
    )
)
def test_big_orders_matches_python_mirror(spark, lines_spec):
    """Property: the TPC-H Q18-shaped HAVING filter equals a Python
    replay -- per-order quantity sums on an exact quarter grid
    straddling the STRICT > 300 threshold (sums of 2-4 lines land on
    both sides and exactly at 300.0 = two 150.5s minus... the grid
    guarantees exact equality cases like 100+100+100)."""
    from datetime import date

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import q_big_orders

    base_us = 1_704_067_200_000_000
    totals: dict = {}
    for oi, q in lines_spec:
        totals[oi] = totals.get(oi, 0.0) + q
    expected = set()
    for oi, tq in totals.items():
        if tq > 300.0:
            expected.add((
                f"Customer#{oi % 2}", oi, base_us + oi * 86_400_000_000,
                round_half_up((oi + 1) * 10.25, 2), round_half_up(tq, 2),
            ))

    lines = spark.createDataFrame(
        [Row(l_orderkey=oi, l_quantity=q) for oi, q in lines_spec],
        "l_orderkey int, l_quantity double",
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=oi, o_custkey=oi % 2,
             o_orderdate=date(2024, 1, 1 + oi),
             o_totalprice=(oi + 1) * 10.25)
         for oi in range(4)],
        "o_orderkey int, o_custkey int, o_orderdate date, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"Customer#{k}") for k in (0, 1)],
        "c_custkey int, c_name string",
    )
    orig = adv.load_tables
    try:
        adv.load_tables = lambda _s, _d, _t: {
            "customer": customer, "orders": orders, "lineitem": lines,
        }
        got = {tuple(r) for r in q_big_orders(spark, "u").collect()}
    finally:
        adv.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # custkey
                  st.integers(min_value=1, max_value=4000)), # cents grid
        min_size=1, max_size=16,
    )
)
def test_top_spenders_lateral_matches_python_mirror(spark, orders_spec):
    """Property: the LATERAL top-2-per-nation equals a Python replay --
    per-customer fixed-point spend, (spend DESC, custkey ASC) ordering
    with dense ties, LIMIT 2 inside the lateral, and nations whose
    lateral result is EMPTY (no customers with orders) emit no row."""
    import math

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.advanced as adv
    from spark_streaming_postgres_lab2_spark.queries.advanced import (
        q_top_spenders_lateral,
    )

    nations = {0: "N_A", 1: "N_B"}
    cust_nation = {0: 0, 1: 0, 2: 1, 3: 1}
    spend: dict = {}
    for ck, cg in orders_spec:
        spend[ck] = spend.get(ck, 0) + math.floor(cg * 0.25 * 100 + 0.5)
    expected = set()
    for nk, nname in nations.items():
        per = sorted(
            ((cents, ck) for ck, cents in spend.items()
             if cust_nation[ck] == nk),
            key=lambda t: (-t[0], t[1]),
        )[:2]
        for cents, ck in per:
            expected.add((nname, ck, cents / 100.0))

    nation = spark.createDataFrame(
        [Row(n_nationkey=k, n_name=v) for k, v in nations.items()],
        "n_nationkey int, n_name string",
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=k, c_nationkey=v) for k, v in cust_nation.items()],
        "c_custkey int, c_nationkey int",
    )
    orders = spark.createDataFrame(
        [Row(o_custkey=ck, o_totalprice=cg * 0.25)
         for ck, cg in orders_spec],
        "o_custkey int, o_totalprice double",
    )
    orig = adv.register_views
    try:
        def fake_views(s, _d, _t):
            nation.createOrReplaceTempView("nation")
            customer.createOrReplaceTempView("customer")
            orders.createOrReplaceTempView("orders")
        adv.register_views = fake_views
        got = {tuple(r) for r in q_top_spenders_lateral(spark, "u").collect()}
    finally:
        adv.register_views = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # customer
                  st.integers(min_value=1, max_value=4000)), # cents grid
        min_size=1, max_size=16,
    )
)
def test_rollup_revenue_matches_python_mirror(spark, lines_spec):
    """Property: ROLLUP(r_name, n_name) equals the explicit three-set
    Python enumeration -- (region, nation), (region), () -- with
    fixed-point money sums; subtotal rows carry NULLs in the rolled-up
    positions."""
    import math

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.core as core
    import spark_streaming_postgres_lab2_spark.sources.tables as tbl
    from spark_streaming_postgres_lab2_spark.queries.core import q_rollup_revenue

    cust_nation = {0: 0, 1: 1, 2: 2, 3: 2}
    nation_region = {0: 0, 1: 0, 2: 1}
    nnames = {0: "N_A", 1: "N_B", 2: "N_C"}
    rnames = {0: "R_X", 1: "R_Y"}

    cells: dict = {}
    for i, (ck, cg) in enumerate(lines_spec):
        price, disc = cg * 0.25, 0.05
        u = math.floor((price * (1 - disc)) * 10000 + 0.5)
        nk = cust_nation[ck]
        key = (rnames[nation_region[nk]], nnames[nk])
        rev, cnt = cells.get(key, (0, 0))
        cells[key] = (rev + u, cnt + 1)
    expected = set()
    by_region: dict = {}
    tot = (0, 0)
    for (r, nm), (rev, cnt) in cells.items():
        expected.add((r, nm, rev / 10000.0, cnt))
        br = by_region.get(r, (0, 0))
        by_region[r] = (br[0] + rev, br[1] + cnt)
        tot = (tot[0] + rev, tot[1] + cnt)
    for r, (rev, cnt) in by_region.items():
        expected.add((r, None, rev / 10000.0, cnt))
    expected.add((None, None, tot[0] / 10000.0, tot[1]))

    region = spark.createDataFrame(
        [Row(r_regionkey=k, r_name=v) for k, v in rnames.items()],
        "r_regionkey int, r_name string",
    )
    nation = spark.createDataFrame(
        [Row(n_nationkey=k, n_name=nnames[k], n_regionkey=nation_region[k])
         for k in nnames],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.createDataFrame(
        [Row(c_custkey=k, c_nationkey=v) for k, v in cust_nation.items()],
        "c_custkey int, c_nationkey int",
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=k) for k in cust_nation],
        "o_orderkey int, o_custkey int",
    )
    lines = spark.createDataFrame(
        [Row(l_orderkey=ck, l_extendedprice=cg * 0.25, l_discount=0.05)
         for ck, cg in lines_spec],
        "l_orderkey int, l_extendedprice double, l_discount double",
    )
    frames = {"region": region, "nation": nation, "customer": customer,
              "orders": orders, "lineitem": lines}
    orig = tbl.register_views
    try:
        def fake_views(s, _d, names=None):
            for nm, df in frames.items():
                df.createOrReplaceTempView(nm)
        tbl.register_views = fake_views
        got = {tuple(r) for r in q_rollup_revenue(spark, "u").collect()}
    finally:
        tbl.register_views = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
                  st.integers(min_value=0, max_value=3),      # hour slot
                  st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
                  st.one_of(st.none(), st.sampled_from(["view", "click"])),
                  st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
                  st.one_of(st.none(), st.sampled_from(['{"a":1}', "{}"]))),
        min_size=1, max_size=16,
    )
)
def test_table_profile_events_matches_python_mirror(spark, events_spec):
    """Property: the per-column profiling operator equals a Python
    replay -- null/distinct counts per column, integer min/max (ts as
    epoch micros), lexicographic string min/max, the most-frequent
    mode with smallest-value tiebreak, ALL-NULL string columns
    profiling to NULL mode, and doubles deliberately carrying no
    min/max/mode."""
    from datetime import datetime, timezone

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_table_profile_events,
    )

    base_us = 1_704_067_200_000_000
    evs = [(eid, base_us + h * 3_600_000_000, uid, et,
            None if v is None else v * 0.25, props)
           for eid, h, uid, et, v, props in events_spec]
    n = len(evs)

    def prof_int(vals):
        nn = [v for v in vals if v is not None]
        return (n - len(nn), len(set(nn)),
                min(nn) if nn else None, max(nn) if nn else None)

    def prof_str(vals):
        nn = [v for v in vals if v is not None]
        from collections import Counter
        if nn:
            c = Counter(nn)
            mc = max(c.values())
            mode = min(v for v, k in c.items() if k == mc)
        else:
            mode = mc = None
        return (n - len(nn), len(set(nn)),
                min(nn) if nn else None, max(nn) if nn else None, mode, mc)

    ids = prof_int([e[0] for e in evs])
    tss = prof_int([e[1] for e in evs])
    uids = prof_int([e[2] for e in evs])
    ets = prof_str([e[3] for e in evs])
    vals = prof_int([e[4] for e in evs])  # counts only used below
    props = prof_str([e[5] for e in evs])
    expected = {
        ("event_id", n, ids[0], ids[1], ids[2], ids[3],
         None, None, None, None),
        ("user_id", n, uids[0], uids[1], uids[2], uids[3],
         None, None, None, None),
        ("ts", n, tss[0], tss[1], tss[2], tss[3], None, None, None, None),
        ("event_type", n, ets[0], ets[1], None, None,
         ets[2], ets[3], ets[4], ets[5]),
        ("value", n, vals[0], vals[1], None, None, None, None, None, None),
        ("props", n, props[0], props[1], None, None,
         props[2], props[3], props[4], props[5]),
    }

    rows = []
    for eid, us, uid, et, v, p in evs:
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        rows.append(Row(event_id=eid, ts=ts, user_id=uid, event_type=et,
                        value=v, props=p))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"events": df}
        got = {tuple(r) for r in q_table_profile_events(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de", "fr", "zh", "xx"]),
                  st.integers(min_value=0, max_value=12)),   # tokens per doc
        min_size=1, max_size=20,
    )
)
def test_unimax_mix_allocation_matches_python_mirror(spark, docs_spec):
    """Property: the UniMax water-filling allocation equals a
    pure-Python replay over randomized language skews -- ascending
    (n_tokens, lang) processing order with tie-dense tiny corpora,
    integer fair shares (R DIV k), the epoch-cap saturation flag, and
    basis-point epoch rates -- plus the algorithm's defining
    invariants: no language exceeds cap*n, total allocation never
    exceeds the budget, and when the LARGEST language is unsaturated
    the budget is spent exactly."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        _UNIMAX_BUDGET_DEN,
        _UNIMAX_EPOCH_CAP,
        q_unimax_mix_allocation,
    )

    # token_count = size(split(text, ' ')): an empty text is ONE token
    per_lang: dict = {}
    for lang, ntok in docs_spec:
        per_lang[lang] = per_lang.get(lang, 0) + max(ntok, 1)
    ordered = sorted((n, lang) for lang, n in per_lang.items())
    total = sum(n for n, _l in ordered)
    budget = total // _UNIMAX_BUDGET_DEN
    remaining, k = budget, len(ordered)
    expected = set()
    allocs = []
    for n, lang in ordered:
        alloc = min(_UNIMAX_EPOCH_CAP * n, remaining // k)
        remaining -= alloc
        k -= 1
        allocs.append((n, alloc))
        expected.add((
            lang, n, alloc,
            1 if alloc == _UNIMAX_EPOCH_CAP * n else 0,
            alloc * 10_000 // n,
        ))
    assert all(a <= _UNIMAX_EPOCH_CAP * n for n, a in allocs)
    assert sum(a for _n, a in allocs) <= budget
    last_n, last_a = allocs[-1]
    if last_a < _UNIMAX_EPOCH_CAP * last_n:
        assert sum(a for _n, a in allocs) == budget

    rows = [
        Row(doc_id=i, lang=lang,
            text=" ".join("t" for _ in range(ntok)))  # 0 tokens -> ""
        for i, (lang, ntok) in enumerate(docs_spec)
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {tuple(r) for r in q_unimax_mix_allocation(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected


# --- round-14 mirror batch 6: HAVING subqueries, Q21 rewrite, regex clean ----


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),     # partkey
                  st.integers(min_value=1, max_value=400)),  # price grid
        min_size=1, max_size=16,
    )
)
def test_important_parts_matches_python_mirror(spark, lines_spec):
    """Property: the TPC-H Q11-shaped HAVING > scalar-subquery filter
    equals a Python replay -- fixed-point revenue cents, the
    cross-multiplied INTEGER threshold (2*rev*n_parts > 3*total, no
    float boundary), and exact-boundary cases where a part's share is
    exactly 1.5x the average (excluded by the strict compare)."""
    import math

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tpm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_important_parts,
    )

    disc = 0.25
    per_part: dict = {}
    for pk, g in lines_spec:
        rev = (g * 0.25) * (1 - disc)
        per_part[pk] = per_part.get(pk, 0) + math.floor(rev * 10000 + 0.5)
    total = sum(per_part.values())
    n = len(per_part)
    expected = {
        (pk, cents / 10000.0)
        for pk, cents in per_part.items()
        if 2 * cents * n > 3 * total
    }

    lines = spark.createDataFrame(
        [Row(l_partkey=pk, l_extendedprice=g * 0.25, l_discount=disc)
         for pk, g in lines_spec],
        "l_partkey int, l_extendedprice double, l_discount double",
    )
    orig = tpm.load_tables
    try:
        tpm.load_tables = lambda _s, _d, _t: {"lineitem": lines}
        got = {(r.l_partkey, r.revenue)
               for r in q_important_parts(spark, "u").collect()}
    finally:
        tpm.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # orderkey
                  st.integers(min_value=0, max_value=3),     # suppkey
                  st.booleans()),                            # returned line
        min_size=1, max_size=16,
    )
)
def test_sole_failed_supplier_matches_python_mirror(spark, lines_spec):
    """Property: the TPC-H Q21-shaped sole-culprit rewrite equals a
    Python replay -- per-(order, supplier) failure flags, the
    multi-supplier (>=2) AND exactly-one-failed order filter, and the
    final grouping on s_name with COLLIDING names (two suppliers share
    'SUP_X': their waits must merge, which grouping by suppkey would
    get wrong)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.tpch_more as tpm
    from spark_streaming_postgres_lab2_spark.queries.tpch_more import (
        q_sole_failed_supplier,
    )

    names = {0: "SUP_X", 1: "SUP_X", 2: "SUP_Y", 3: "SUP_Z"}
    flags: dict = {}
    for ok, sk, ret in lines_spec:
        flags[(ok, sk)] = max(flags.get((ok, sk), 0), 1 if ret else 0)
    per_order: dict = {}
    for (ok, sk), f in flags.items():
        n, nf = per_order.get(ok, (0, 0))
        per_order[ok] = (n + 1, nf + f)
    waits: dict = {}
    for (ok, sk), f in flags.items():
        n, nf = per_order[ok]
        if f == 1 and n >= 2 and nf == 1:
            waits[names[sk]] = waits.get(names[sk], 0) + 1
    expected = {(nm, c) for nm, c in waits.items()}

    lines = spark.createDataFrame(
        [Row(l_orderkey=ok, l_suppkey=sk,
             l_returnflag="R" if ret else "N")
         for ok, sk, ret in lines_spec],
        "l_orderkey int, l_suppkey int, l_returnflag string",
    )
    supplier = spark.createDataFrame(
        [Row(s_suppkey=k, s_name=v) for k, v in names.items()],
        "s_suppkey int, s_name string",
    )
    orig = tpm.load_tables
    try:
        tpm.load_tables = lambda _s, _d, _t: {
            "lineitem": lines, "supplier": supplier,
        }
        got = {tuple(r) for r in q_sole_failed_supplier(spark, "u").collect()}
    finally:
        tpm.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),    # doc_id (mod 3!)
                  st.sampled_from(["plain text", "a  b", "x https://keep.net y",
                                   "mail me@host.org now", ""])),
        min_size=1, max_size=10,
        unique_by=lambda t: t[0],
    )
)
def test_doc_clean_matches_python_mirror(spark, docs_spec):
    """Property: the URL/email scrub + whitespace collapse equals a
    Python re replay (third regex engine, the html_text_extract
    precedent) -- including texts that THEMSELVES carry URLs/emails
    beyond the doc_id-keyed injected noise, and the doc_id % 3 noise
    arms."""
    import re

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import q_doc_clean

    expected = set()
    for doc_id, text in docs_spec:
        if doc_id % 3 == 0:
            noisy = f"{text} visit https://example.com/p{doc_id} now"
        elif doc_id % 3 == 1:
            noisy = f"{text}  contact bob{doc_id}@mail.example.org  "
        else:
            noisy = text
        cleaned = re.sub(
            r"(https?://\S+)|([A-Za-z0-9.]+@[A-Za-z0-9.]+)", "", noisy
        )
        cleaned = re.sub(r"\s+", " ", cleaned).strip()
        expected.add((doc_id, len(noisy), len(cleaned),
                      len(noisy) - len(cleaned)))

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs_spec],
        "doc_id int, text string",
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_doc_clean(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


# --- round-15 mirror batch (VERDICT r14 item 5): canonical selection, ------
# --- PMI vocabulary/pair cuts, PQ assignment arithmetic --------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # template (text)
                  st.integers(min_value=0, max_value=2),     # source
                  st.integers(min_value=0, max_value=9)),    # n_chars (ties!)
        min_size=1, max_size=12,
    )
)
def test_canonical_docs_matches_python_mirror(spark, docs_spec):
    """Property: the canonical-selection + accounting stage of
    ``canonical_docs`` equals a pure-Python replay on corpora with a
    KNOWN ground-truth pair set: docs sharing a template are verbatim
    duplicates (Jaccard 1.0 -- every LSH band collides, verify always
    keeps), templates share no tokens (zero shingle overlap -- no
    cross pairs possible), so clusters == template groups and the
    mirror replays the struct-MAX (n_chars, lowest doc_id) keep rule
    -- tie-dense n_chars by construction -- plus the per-source
    kept/dropped rollup."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import q_canonical_docs

    texts = {
        t: " ".join(f"t{t}w{i}" for i in range(5)) for t in range(4)
    }
    docs = [
        (i, f"s{src}", texts[tpl], nch, tpl)
        for i, (tpl, src, nch) in enumerate(docs_spec)
    ]
    by_tpl: dict = {}
    for doc_id, src, _text, nch, tpl in docs:
        by_tpl.setdefault(tpl, []).append((doc_id, src, nch))
    kept_ids = set()
    for members in by_tpl.values():
        # struct MAX on (n_chars, -doc_id): longest doc, lowest id tie-break
        best = max(members, key=lambda m: (m[2], -m[0]))
        kept_ids.add(best[0])
    expected = {}
    for doc_id, src, _text, nch, _tpl in docs:
        n, k = expected.get(src, (0, 0))
        expected[src] = (n + 1, k + (1 if doc_id in kept_ids else 0))
    expected_rows = {
        (src, n, k, n - k) for src, (n, k) in expected.items()
    }

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, lang="en", text=t, n_chars=n)
         for i, s, t, n, _tpl in docs],
        "doc_id bigint, source string, lang string, text string, n_chars int",
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {tuple(r) for r in q_canonical_docs(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected_rows


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10**6))
def test_term_pmi_matches_python_mirror(spark, seed):
    """Property: ``term_pmi_cooccurrence`` equals a pure-Python replay
    over a 34-term Zipf-skewed random corpus -- WIDER than _PMI_VOCAB
    (30), so the deterministic (df DESC, term) vocabulary cut binds,
    and with enough co-occurring pairs that the top-50
    (n_both DESC, term_a, term_b) emission cut binds too; doc-level
    presence counting (explode+distinct), exact BIGINT counts, and
    the display-only ln rounded half-up to 4."""
    import math
    import random as rnd

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as cur
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _PMI_TOPK,
        _PMI_VOCAB,
        q_term_pmi_cooccurrence,
    )

    r = rnd.Random(seed)
    vocab = [f"w{i:02d}" for i in range(34)]
    n_docs = r.randint(8, 20)
    corpus_docs = []
    for i in range(n_docs):
        k = r.randint(1, 10)
        # Zipf-ish skew: low-index terms appear in many docs
        toks = [vocab[min(int(r.expovariate(0.12)), 33)] for _ in range(k)]
        corpus_docs.append((i, " ".join(toks)))

    present: dict = {}
    for doc_id, text in corpus_docs:
        for term in {t for t in text.split(" ") if t}:
            present.setdefault(term, set()).add(doc_id)
    df_by_term = {t: len(ds) for t, ds in present.items()}
    cut = sorted(df_by_term.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_VOCAB]
    vocab_df = dict(cut)
    pair_counts: dict = {}
    for doc_id, text in corpus_docs:
        terms = sorted(
            {t for t in text.split(" ") if t and t in vocab_df}
        )
        for ai in range(len(terms)):
            for bi in range(ai + 1, len(terms)):
                key = (terms[ai], terms[bi])
                pair_counts[key] = pair_counts.get(key, 0) + 1
    rows = []
    for (a, b), n_both in pair_counts.items():
        pmi = round_half_up(
            math.log(n_both * n_docs / (df_by_term[a] * df_by_term[b])), 4
        )
        rows.append((a, b, n_both, df_by_term[a], df_by_term[b], pmi))
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    expected = set(rows[:_PMI_TOPK])

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in corpus_docs],
        "doc_id bigint, text string",
    )
    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_term_pmi_cooccurrence(spark, "u").collect()}
    finally:
        cur.load_tables = orig
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10**6))
def test_embedding_pq_audit_matches_python_mirror(spark, seed):
    """Property: the PQ assignment/reconstruction arithmetic of
    ``embedding_pq_audit`` equals a pure-Python integer replay on a
    random float32 corpus: floor(double(x) * 2^14) BIGINT quantization
    (float32->double is exact, so both sides quantize identically),
    per-(vector, subspace) BIGINT squared distances to all 16 seeded
    codes, argmin tie-broken on (d2, code), per-subspace rollup of
    count / distinct codes / total squared error."""
    import math

    import numpy as np
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        _KM_DIM,
        _KM_QSCALE,
        _PQ_K,
        _PQ_SUB,
        q_embedding_pq_audit,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(17, 40))
    vecs = rng.normal(scale=0.6, size=(n, _KM_DIM)).astype(np.float32)
    qv = [
        [int(math.floor(float(x) * _KM_QSCALE)) for x in row] for row in vecs
    ]
    n_sub = _KM_DIM // _PQ_SUB
    # codebook: subvectors of the _PQ_K lowest vec_ids (ids are 0..n-1)
    book = {
        m: [qv[code][m * _PQ_SUB:(m + 1) * _PQ_SUB] for code in range(_PQ_K)]
        for m in range(n_sub)
    }
    agg = {m: [0, set(), 0] for m in range(n_sub)}
    for vid in range(n):
        for m in range(n_sub):
            sub = qv[vid][m * _PQ_SUB:(m + 1) * _PQ_SUB]
            best = min(
                (
                    (sum((a - c) ** 2 for a, c in zip(sub, book[m][code])), code)
                    for code in range(_PQ_K)
                )
            )
            agg[m][0] += 1
            agg[m][1].add(best[1])
            agg[m][2] += best[0]
    expected = {
        (m, agg[m][0], len(agg[m][1]), agg[m][2]) for m in range(n_sub)
    }

    emb = spark.createDataFrame(
        [Row(vec_id=i, label=int(i % 3),
             embedding=[float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"embeddings": emb}
        got = {tuple(r) for r in q_embedding_pq_audit(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=10).map(" ".join),
                          st.sampled_from(["A", "B", "C"])),
                min_size=1, max_size=12))
def test_doremi_domain_weights_matches_python_mirror(spark, docs_spec):
    """Property: the DoReMi-style reweighting equals a pure-Python
    replay on random corpora -- the SAME add-one-bigram bit-surprisal
    replay as the lm_surprisal mirror (the two queries now share
    _bigram_bits_scored, so the mirrors sharing the replay is the
    point), then the domain fold: millibits-per-bigram integer
    division, excess over the min scored domain, excess-proportional
    basis points with the all-tied -> uniform and no-bigrams -> 0
    degenerate arms.  The 3-symbol alphabet makes tied losses and
    unscorable domains dense."""
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_doremi_domain_weights,
    )

    toks = {i: [t for t in text.split(" ") if t]
            for i, (text, _s) in enumerate(docs_spec)}
    c12: Counter = Counter()
    c1: Counter = Counter()
    per_doc = {}
    for i, tk in toks.items():
        bgs = list(zip(tk, tk[1:]))
        if bgs:
            per_doc[i] = bgs
            c12.update(bgs)
            c1.update(w1 for w1, _ in bgs)
    vocab = len({t for tk in toks.values() for t in tk})
    dom: dict = {}
    for i, (_text, src) in enumerate(docs_spec):
        e = dom.setdefault(src, [0, 0, 0, 0])  # n_docs, n_scored, bits, bigrams
        e[0] += 1
        if i in per_doc:
            bgs = per_doc[i]
            total = sum(
                (((c1[w1] + vocab) // (c12[(w1, w2)] + 1)).bit_length() - 1)
                for w1, w2 in bgs
            )
            e[1] += 1
            e[2] += total
            e[3] += len(bgs)
    loss = {
        s: (e[2] * 1000) // e[3] if e[3] > 0 else None for s, e in dom.items()
    }
    scored_losses = [v for v in loss.values() if v is not None]
    mn = min(scored_losses) if scored_losses else None
    k = len(scored_losses)
    sum_excess = sum(v - mn for v in scored_losses) if scored_losses else 0
    expected = set()
    for s, e in dom.items():
        lv = loss[s]
        if lv is None:
            w = 0
            excess = None
        else:
            excess = lv - mn
            w = (excess * 10000) // sum_excess if sum_excess > 0 else 10000 // k
        expected.add((s, e[0], e[1], e[2], e[3], lv, excess, w))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t, lang="en", n_chars=len(t))
         for i, (t, s) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_doremi_domain_weights(spark, "u").collect()}
    finally:
        curation.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "und", None]),
            st.one_of(
                st.none(),
                st.sampled_from(
                    ["", "plain words here", "a  b", "num 42 x!",
                     "ümläut straße", "中文 text",
                     "a,b.c", "  "]
                ),
            ),
        ),
        min_size=1, max_size=12,
    )
)
def test_tokenizer_fertility_matches_python_mirror(spark, docs_spec):
    """Property: the per-language fertility audit equals a Python re
    replay (third regex engine) over corpora dense in the hard cases:
    NULL lang (merges into 'und'), NULL text (zero everywhere),
    empty/whitespace-only text (the split-of-empty one-token
    artifact), multi-byte UTF-8 (bytes != chars), and punctuation
    (regex tokens != whitespace tokens)."""
    import re

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.ext as extmod
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        q_tokenizer_fertility_audit,
    )

    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    agg: dict = {}
    for lang, text in docs_spec:
        lg = lang if lang is not None else "und"
        e = agg.setdefault(lg, [0, 0, 0, 0])
        e[0] += 1
        if text is not None:
            e[1] += len(text.split(" "))  # split keeps empty fields
            e[2] += len(pat.findall(text))
            e[3] += len(text.encode("utf-8"))
    expected = set()
    for lg, (nd, w, r, b) in agg.items():
        expected.add((
            lg, nd, w, r, b,
            round_half_up(r / w, 4) if w > 0 else None,
            round_half_up(b / r, 4) if r > 0 else None,
        ))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", lang=lg, text=t,
             n_chars=len(t) if t else 0)
         for i, (lg, t) in enumerate(docs_spec)],
        "doc_id bigint, source string, lang string, text string, n_chars int",
    )
    orig = extmod.load_tables
    try:
        extmod.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_tokenizer_fertility_audit(spark, "u").collect()}
    finally:
        extmod.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),     # template (text)
                  st.integers(min_value=0, max_value=9)),    # n_chars
        min_size=1, max_size=12,
    )
)
def test_dedup_cluster_profile_matches_python_mirror(spark, docs_spec):
    """Property: the duplication-profile histogram equals a
    pure-Python replay on the canonical_docs mirror's ground-truth
    corpora (verbatim-dup templates with disjoint token sets, so
    clusters == template groups): per-size cluster counts, doc
    conservation, and byte accounting."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.corpus as corpus
    from spark_streaming_postgres_lab2_spark.queries.corpus import (
        q_dedup_cluster_profile,
    )

    texts = {t: " ".join(f"t{t}w{i}" for i in range(5)) for t in range(4)}
    by_tpl: dict = {}
    for i, (tpl, nch) in enumerate(docs_spec):
        by_tpl.setdefault(tpl, []).append((i, nch))
    hist: dict = {}
    for members in by_tpl.values():
        sz = len(members)
        e = hist.setdefault(sz, [0, 0, 0])
        e[0] += 1
        e[1] += sz
        e[2] += sum(nch for _i, nch in members)
    expected = {(sz, e[0], e[1], e[2]) for sz, e in hist.items()}
    assert sum(e[1] for e in hist.values()) == len(docs_spec)  # conservation

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", lang="en", text=texts[tpl], n_chars=nch)
         for i, (tpl, nch) in enumerate(docs_spec)],
        "doc_id bigint, source string, lang string, text string, n_chars int",
    )
    orig = corpus.load_tables
    try:
        corpus.load_tables = lambda _s, _d, _t: {"documents": df}
        got = {tuple(r) for r in q_dedup_cluster_profile(spark, "u").collect()}
    finally:
        corpus.load_tables = orig
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["hash", "join", "vector", "scan", "slow", "merge", "batch",
                 "customer", "order", "filter", "column", "noise", "pad"]
            ),
            min_size=1, max_size=12,
        ).map(" ".join),
        min_size=2, max_size=10,
    )
)
def test_rrf_hybrid_search_matches_python_mirror(spark, texts):
    """Property: the RRF fusion equals a pure-Python replay over random
    corpora drawn from the benchmark-query vocabulary (so pools
    overlap, diverge, and truncate): BM25 and TF-IDF scores rounded 4,
    per-system ranks on (score DESC, doc_id), top-10 pool cut,
    1/(60+rank) fusion with absent-system 0, round 6, fused top-5 on
    (rrf DESC, doc_id)."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as cur
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERIES,
        _RRF_K,
        _RRF_POOL,
        _RRF_TOPK,
        q_rrf_hybrid_search,
    )

    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    tf = {i: Counter(tk) for i, tk in toks.items()}
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    dl = {i: len(tk) for i, tk in toks.items()}
    n = len(texts)
    avgdl = sum(dl.values()) / n
    queries: dict = {}
    for qid, term in _BM25_QUERIES:
        queries.setdefault(qid, []).append(term)

    fused_expected = set()
    for qid, terms in queries.items():
        scored = {}
        for i in tf:
            hit = [t for t in terms if tf[i][t] > 0]
            if not hit:
                continue
            s_b = sum(
                math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                * (tf[i][t] * (1 + _BM25_K1))
                / (tf[i][t] + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[i] / avgdl))
                for t in hit
            )
            s_t = sum(tf[i][t] * math.log(1 + n / df[t]) for t in hit)
            scored[i] = (round_half_up(s_b, 4), round_half_up(s_t, 4))
        ra = {i: r + 1 for r, (i, _s) in enumerate(
            sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0])))}
        rb = {i: r + 1 for r, (i, _s) in enumerate(
            sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0])))}
        pool = {
            i: (
                ra[i] if ra[i] <= _RRF_POOL else None,
                rb[i] if rb[i] <= _RRF_POOL else None,
            )
            for i in scored
            if ra[i] <= _RRF_POOL or rb[i] <= _RRF_POOL
        }
        fused = {
            i: round_half_up(
                (1.0 / (_RRF_K + a) if a else 0.0)
                + (1.0 / (_RRF_K + b) if b else 0.0),
                6,
            )
            for i, (a, b) in pool.items()
        }
        ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
        for fr, (i, sc) in enumerate(ranked[:_RRF_TOPK], 1):
            fused_expected.add((qid, fr, i, sc, pool[i][0], pool[i][1]))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", lang="en", text=t, n_chars=len(t))
         for i, t in enumerate(texts)],
        "doc_id bigint, source string, lang string, text string, n_chars int",
    )
    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_rrf_hybrid_search(spark, "u").collect()}
    finally:
        cur.load_tables = orig
    assert got == fused_expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.lists(_mh_tok, min_size=0, max_size=30).map(" ".join),
                          st.sampled_from(["A", "B"])),
                min_size=1, max_size=12))
def test_quality_consensus_matches_python_mirror(spark, docs_spec):
    """Property: the three-tier consensus equals a pure-Python replay
    composing the three tier mirrors -- the C4 rule chain (length /
    diversity / blocklist, first-match-wins), the hashing-trick
    classifier (md5-prefix weights over distinct tokens), and the
    add-one-bigram LM gate (below-corpus-mean bits) -- including the
    unscorable-votes-False pins and the 0..3 vote histogram."""
    import hashlib
    import math
    from collections import Counter

    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BAD_TERM_LIMIT,
        _BAD_TERMS,
        _MAX_TOKENS,
        _MIN_DIVERSITY,
        _MIN_TOKENS,
        _QC_MOD,
        q_quality_consensus_report,
    )

    toks = {i: [t for t in text.split(" ") if t]
            for i, (text, _s) in enumerate(docs_spec)}
    # tier 1: rules
    v_rules = {}
    for i, tk in toks.items():
        n, uniq = len(tk), len(set(tk))
        bad = sum(1 for t in tk if t in _BAD_TERMS)
        if n < _MIN_TOKENS or n > _MAX_TOKENS:
            v_rules[i] = False
        elif uniq / n < _MIN_DIVERSITY:
            v_rules[i] = False
        elif bad >= _BAD_TERM_LIMIT:
            v_rules[i] = False
        else:
            v_rules[i] = True
    # tier 2: classifier over DISTINCT tokens
    v_clf = {}
    for i, tk in toks.items():
        if not tk:
            v_clf[i] = False
            continue
        score = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _QC_MOD
            - (_QC_MOD - 1) // 2
            for t in set(tk)
        )
        v_clf[i] = score > 0
    # tier 3: LM gate
    c12: Counter = Counter()
    c1: Counter = Counter()
    per_doc = {}
    for i, tk in toks.items():
        bgs = list(zip(tk, tk[1:]))
        if bgs:
            per_doc[i] = bgs
            c12.update(bgs)
            c1.update(w1 for w1, _ in bgs)
    vocab = len({t for tk in toks.values() for t in tk})
    scored = {}
    for i, bgs in per_doc.items():
        total = sum(
            (((c1[w1] + vocab) // (c12[(w1, w2)] + 1)).bit_length() - 1)
            for w1, w2 in bgs
        )
        scored[i] = (len(bgs), total)
    mean = (sum(t for _n, t in scored.values())
            / sum(n for n, _t in scored.values())) if scored else None
    v_lm = {
        i: (i in scored and scored[i][1] / scored[i][0] <= mean)
        for i in toks
    }
    agg: dict = {}
    for i, (_text, src) in enumerate(docs_spec):
        e = agg.setdefault(src, [0] * 9)
        votes = int(v_rules[i]) + int(v_clf[i]) + int(v_lm[i])
        e[0] += 1
        e[1] += int(v_rules[i])
        e[2] += int(v_clf[i])
        e[3] += int(v_lm[i])
        e[4 + votes] += 1
        e[8] += 0  # placeholder; consensus appended below
    expected = set()
    for src, e in agg.items():
        consensus = e[6] + e[7]  # votes_2 + votes_3
        expected.add((src, e[0], e[1], e[2], e[3], e[4], e[5], e[6], e[7],
                      consensus))

    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t, lang="en", n_chars=len(t))
         for i, (t, s) in enumerate(docs_spec)]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {tuple(r) for r in q_quality_consensus_report(spark, "u").collect()}
    finally:
        curation.load_tables = orig
    assert got == expected

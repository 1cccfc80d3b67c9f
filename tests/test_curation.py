"""Tests for the curation-family operators (queries/curation.py):
fixture parity covers the happy path, these pin plan shape and the
boundary semantics the fixtures don't exercise."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.plans import checks
from spark_streaming_postgres_lab2_spark.queries.curation import (
    _BAD_TERM_LIMIT,
    _MIN_TOKENS,
    _QUOTA,
    _TFIDF_K,
    _TOPK_TERMS,
    q_corpus_filter_chain,
    q_exact_ngram_decontaminate,
    q_pii_redaction,
    q_source_quota_sample,
    q_tfidf_top_terms,
    q_zipf_top_terms,
)
from conftest import round_half_up


# --- plan pins ----------------------------------------------------------------


def test_exact_ngram_decon_broadcasts_eval_side(spark, sf_dir):
    # the eval gram set must broadcast: the train corpus (100 TB side)
    # may never be shuffled for the probe
    df = q_exact_ngram_decontaminate(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    # document frequencies are vocabulary-sized -> BroadcastHashJoin;
    # the corpus count is a broadcast 1-row cross
    # (BroadcastNestedLoopJoin); nothing sort-merges.  (The old >= 2
    # BHJ assertion only passed because formatted-mode counting
    # double-counted the single hash join -- r5 review finding.)
    df = q_tfidf_top_terms(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoopJoin" in checks._countable_plan_text(df)
    assert checks.sort_merge_join_count(df) == 0


def test_zipf_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    # orderBy+limit over the term counts must lower to
    # TakeOrderedAndProject (distributed top-K merge), so the only
    # unbounded-window input is K rows
    plan = checks.physical_plan(q_zipf_top_terms(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_filter_chain_single_shuffle(spark, sf_dir):
    # one tokenization, one map-side-combinable groupBy: the plan may
    # shuffle only for the aggregate (plus the final presentation sort)
    df = q_corpus_filter_chain(spark, sf_dir)
    assert checks.shuffle_count(df) <= 2


def test_pii_redaction_no_shuffle_before_sort(spark, sf_dir):
    # pure per-row projection: only the presentation orderBy may
    # exchange
    df = q_pii_redaction(spark, sf_dir)
    assert checks.shuffle_count(df) <= 1


# --- semantics ----------------------------------------------------------------


def test_pii_redaction_scrubs_all_three_kinds(spark, sf_dir):
    rows = q_pii_redaction(spark, sf_dir).limit(10).collect()
    assert rows, "expected documents"
    for r in rows:
        # the synthesized dirt adds exactly 2 emails, 1 ip, 1 phone
        assert (r.n_emails, r.n_ips, r.n_phones) == (2, 1, 1)


def test_pii_redaction_hash_changes_with_payload(spark, sf_dir):
    hashes = {
        r.clean_hash for r in q_pii_redaction(spark, sf_dir).limit(20).collect()
    }
    assert len(hashes) > 1  # per-doc content survives into the hash


def test_source_quota_respects_cap_and_order(spark, sf_dir):
    rows = q_source_quota_sample(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        assert len(rs) <= _QUOTA
        sizes = [r.n_chars for r in sorted(rs, key=lambda r: r.quota_rank)]
        assert sizes == sorted(sizes, reverse=True), src


def test_zipf_cumulative_share_monotone(spark, sf_dir):
    rows = q_zipf_top_terms(spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPK_TERMS
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)
    counts = [r.term_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_tfidf_rank_within_doc(spark, sf_dir):
    rows = q_tfidf_top_terms(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        assert 1 <= len(rs) <= _TFIDF_K
        ordered = sorted(rs, key=lambda r: r.term_rank)
        scores = [r.tfidf for r in ordered]
        assert scores == sorted(scores, reverse=True), doc


def test_filter_chain_first_match_wins(spark, sf_dir):
    """A doc that is BOTH too short and policy-flagged must be tagged
    too_short (rule order), mirroring the reference validation chain."""
    short_and_bad = " ".join(["slow"] * (_BAD_TERM_LIMIT + 1))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=short_and_bad, lang="en", source="s", n_chars=1),
            Row(
                doc_id=2,
                text=" ".join(f"t{i}" for i in range(_MIN_TOKENS + 10)),
                lang="en",
                source="s",
                n_chars=1,
            ),
        ]
    )

    # drive the operator body directly over a hand-built frame
    import spark_streaming_postgres_lab2_spark.queries.curation as cur

    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        out = {
            (r.reason): r.n_docs for r in q_corpus_filter_chain(spark, "unused").collect()
        }
    finally:
        cur.load_tables = orig
    assert out.get("too_short") == 1
    assert out.get("keep") == 1


def test_exact_ngram_decon_planted_contamination(spark, sf_dir):
    """A train doc sharing a verbatim 8-gram with an eval doc is
    flagged with the right shared count; disjoint docs are not."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"pre {shared} post", lang="en", source="src0", n_chars=1),
            Row(doc_id=2, text="a b c d e f g h i j", lang="en", source="src1", n_chars=1),
            Row(doc_id=100, text=f"{shared} tail1 tail2", lang="en", source="src18", n_chars=1),
        ]
    )
    import spark_streaming_postgres_lab2_spark.queries.curation as cur

    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = q_exact_ngram_decontaminate(spark, "unused").collect()
    finally:
        cur.load_tables = orig
    assert [(r.train_doc_id, r.eval_doc_id, r.n_shared_ngrams) for r in rows] == [
        (1, 100, 1)
    ]


def test_bpe_merge_candidates_counts(spark):
    """Pair counts = adjacent char pairs weighted by word frequency;
    top pair is the most frequent merge candidate."""
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [
            # 'abab' x3 -> pairs ab, ba, ab (ab twice per occurrence)
            Row(doc_id=1, text="abab abab abab cd", lang="en", source="s", n_chars=1),
            Row(doc_id=2, text="cd x", lang="en", source="s", n_chars=1),  # 'x' too short
        ]
    )
    import spark_streaming_postgres_lab2_spark.queries.curation as cur

    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = q_bpe_merge_candidates(spark, "unused").collect()
    finally:
        cur.load_tables = orig
    got = {r.pair: r.n_occ for r in rows}
    assert got == {"ab": 6, "ba": 3, "cd": 2}
    # ordering: count desc, then pair asc
    assert [r.pair for r in rows] == ["ab", "ba", "cd"]


# --- URL canonicalization dedup ------------------------------------------------


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule, exercised on crafted URLs: fragment,
    utm params (leading and chained), explicit :443 port, scheme+host
    case, trailing slash -- and a URL that needs none of them."""
    from pyspark.sql import Row

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        canonicalize_url,
    )

    cases = [
        ("https://a.example/p/1", "https://a.example/p/1"),
        ("https://a.example/p/1#frag", "https://a.example/p/1"),
        ("https://a.example/p/1?utm_source=x", "https://a.example/p/1"),
        (
            "https://a.example/p/1/?utm_campaign=x&utm_medium=y",
            "https://a.example/p/1",
        ),
        ("HTTPS://A.Example:443/p/1", "https://a.example/p/1"),
        ("HTTPS://A.EXAMPLE:443/p/1?utm_source=f#z", "https://a.example/p/1"),
        # review-hardened rules: the port strip is anchored to the
        # https authority, and stripping a LEADING utm param repairs
        # the '?' separator for the surviving params
        ("https://a.example/doc:443/x", "https://a.example/doc:443/x"),
        ("http://a.example:443/x", "http://a.example:443/x"),
        ("https://a.example:443?q=1", "https://a.example?q=1"),
        ("https://a.example:443", "https://a.example"),
        ("https://a.example/p/1?utm_source=x&page=2", "https://a.example/p/1?page=2"),
        ("https://a.example/p/1?page=2&utm_source=x", "https://a.example/p/1?page=2"),
        (
            "https://a.example/p/1?utm_a=x&utm_b=y&page=2",
            "https://a.example/p/1?page=2",
        ),
        # TWO surviving params after a stripped leading utm: the repair
        # must promote the FIRST '&' (a greedy [^?]* promoted the last
        # one -- review finding)
        (
            "https://a.example/p/1?utm_source=x&page=2&q=3",
            "https://a.example/p/1?page=2&q=3",
        ),
    ]
    df = spark.createDataFrame([Row(url=u) for u, _ in cases]).select(
        "url", canonicalize_url(F.col("url")).alias("canon")
    )
    got = {r.url: r.canon for r in df.collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_url_canonical_dedup_groups_triples(spark, sf_dir):
    """The synthesized grammar makes consecutive doc_id triples collide
    iff canonicalization is right: every group has <= 3 variants, group
    sizes sum to the corpus size, and the kept id is the group minimum
    (variant 0's id, which is divisible by 3 whenever present)."""
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_url_canonical_dedup,
    )
    from spark_streaming_postgres_lab2_spark.sources.tables import load_tables

    rows = q_url_canonical_dedup(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir, ["documents"])["documents"].count()
    assert sum(r.n_variants for r in rows) == n_docs
    assert all(1 <= r.n_variants <= 3 for r in rows)
    assert any(r.n_variants == 3 for r in rows)  # collisions actually happen
    # canonical URL embeds base = keep_doc_id DIV 3 for the minimum id
    for r in rows:
        assert r.canonical_url.endswith(f"/p/{r.keep_doc_id // 3}")


# --- within-document repeated-block removal -------------------------------------


def test_intra_doc_dedup_keep_first_semantics(spark):
    """Crafted doc: 16 tokens = block A twice -> after augmentation
    (aligned prefix + first block) the doc is [A, A, A]: 3 blocks,
    2 repeats, kept hash == md5 of A's hash alone.  A 7-token doc has
    no full block and is absent."""
    import hashlib

    from pyspark.sql import Row

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_intra_doc_dedup,
    )
    import spark_streaming_postgres_lab2_spark.queries.curation as cur

    block = "w0 w1 w2 w3 w4 w5 w6 w7"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{block} {block}", lang="en", source="s", n_chars=1),
            Row(doc_id=2, text="a b c d e f g", lang="en", source="s", n_chars=1),
        ]
    )
    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = {r.doc_id: r for r in q_intra_doc_dedup(spark, "unused").collect()}
    finally:
        cur.load_tables = orig
    assert set(rows) == {1}  # the 7-token doc has no blocks
    r = rows[1]
    assert (r.n_blocks, r.n_repeats) == (3, 2)
    bh = hashlib.md5(block.encode()).hexdigest()
    assert r.kept_hash == hashlib.md5(bh.encode()).hexdigest()


def test_intra_doc_dedup_fixture_invariants(spark, sf_dir):
    """Every full-block document gains >= 1 repeat from the aligned
    augmentation, repeats never exceed blocks, and the result is
    deterministic."""
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_intra_doc_dedup,
    )

    rows = q_intra_doc_dedup(spark, sf_dir).collect()
    assert rows
    assert all(r.n_repeats >= 1 for r in rows)
    assert all(r.n_repeats < r.n_blocks for r in rows)
    again = {r.doc_id: r.kept_hash for r in q_intra_doc_dedup(spark, sf_dir).collect()}
    assert {r.doc_id: r.kept_hash for r in rows} == again


# --- model-based quality filtering ----------------------------------------------


def test_quality_classifier_decision_boundary(spark):
    """The hashing-trick scorer's decision rule is pinned on crafted
    docs: a doc's score is the exact integer sum of its distinct token
    weights, keep iff > 0 -- verified against an independent Python
    recomputation of the same md5 arithmetic."""
    import hashlib

    from pyspark.sql import Row

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _QC_MOD,
        q_quality_classifier_filter,
    )
    import spark_streaming_postgres_lab2_spark.queries.curation as cur

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _QC_MOD - (
            _QC_MOD - 1
        ) // 2

    texts = {1: "alpha beta gamma", 2: "delta epsilon", 3: "zeta eta theta iota"}
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=1) for i, t in texts.items()]
    )
    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        rows = q_quality_classifier_filter(spark, "unused").collect()
    finally:
        cur.load_tables = orig
    assert len(rows) == 1
    r = rows[0]
    scores = {i: sum(w(tok) for tok in set(t.split())) for i, t in texts.items()}
    expect_kept = sorted(i for i, s in scores.items() if s > 0)
    assert r.kept_docs == len(expect_kept)
    assert r.dropped_docs == 3 - len(expect_kept)
    kept_str = ",".join(str(i) for i in expect_kept)
    assert r.kept_hash == hashlib.md5(kept_str.encode()).hexdigest()


def test_quality_classifier_fixture_nonvacuous(spark, sf_dir):
    """On the fixtures the classifier both keeps and drops documents
    (a filter that never fires proves nothing)."""
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_quality_classifier_filter,
    )

    rows = q_quality_classifier_filter(spark, sf_dir).collect()
    assert sum(r.kept_docs for r in rows) > 0
    assert sum(r.dropped_docs for r in rows) > 0


def test_bm25_matches_python_mirror(spark, sf_dir):
    """BM25 scores and ranking match an independent pure-Python
    implementation of the same formula on the fixture corpus."""
    import math

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERIES,
        _BM25_TOPK,
        q_bm25_search,
    )
    from spark_streaming_postgres_lab2_spark.sources.tables import load_tables

    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in load_tables(spark, sf_dir, ["documents"])["documents"].collect()
    }
    n = len(docs)
    dl = {d: len(ts) for d, ts in docs.items()}
    avgdl = sum(dl.values()) / n
    df: dict = {}
    for ts in docs.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    by_q: dict = {}
    for q, t in _BM25_QUERIES:
        by_q.setdefault(q, []).append(t)
    expect = {}
    for q, terms in by_q.items():
        scored = []
        for d, ts in docs.items():
            s, hits = 0.0, 0
            for t in terms:
                tf = ts.count(t)
                if not tf:
                    continue
                hits += 1
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (1 + _BM25_K1)) / (
                    tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[d] / avgdl)
                )
            if hits:
                scored.append((round(s, 4), d, hits))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d, hits) in enumerate(scored[:_BM25_TOPK], 1):
            expect[(q, rank)] = (d, s, hits)

    got = q_bm25_search(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert expect[(r.query_id, r.rank)] == (r.doc_id, r.score, r.n_terms_hit)


def test_term_pmi_hand_computed(spark, tmp_path):
    """PMI values and counts on a hand-computable corpus."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_term_pmi_cooccurrence,
    )

    texts = ["a b", "a b", "a c", "b c x", "x"]
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
        tmp_path / "documents.parquet",
    )
    got = {
        (r.term_a, r.term_b): (r.n_both, r.df_a, r.df_b, r.pmi)
        for r in q_term_pmi_cooccurrence(spark, str(tmp_path)).collect()
    }
    n = 5
    assert got[("a", "b")] == (2, 3, 3, round_half_up(math.log(2 * n / 9), 4))
    assert got[("a", "c")] == (1, 3, 2, round_half_up(math.log(1 * n / 6), 4))
    assert got[("b", "c")] == (1, 3, 2, round_half_up(math.log(1 * n / 6), 4))
    assert got[("b", "x")] == (1, 3, 2, round_half_up(math.log(1 * n / 6), 4))
    assert got[("c", "x")] == (1, 2, 2, round_half_up(math.log(1 * n / 4), 4))
    assert len(got) == 5  # no (a,x): never co-occur


def test_freq_items_audit_planted_heavy_hitters(spark):
    """Planted Zipf: only terms above the exact integer 1% threshold
    appear, their counts are exact, and the Misra-Gries containment
    guarantee holds (in_sketch == 1 for every true heavy hitter)."""
    from pyspark.sql import Row

    import spark_streaming_postgres_lab2_spark.queries.curation as cur
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_freq_items_audit,
    )

    # 5x 'hot', 2x 'warm', 96 unique fillers -> total 103 tokens;
    # heavy iff cnt*100 > 103 -> cnt >= 2 -> {hot, warm}
    fillers = " ".join(f"f{i}" for i in range(96))
    text = "hot hot hot hot hot warm warm " + fillers
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    orig = cur.load_tables
    try:
        cur.load_tables = lambda _s, _d, _t: {"documents": df}
        got = q_freq_items_audit(spark, "unused").collect()
    finally:
        cur.load_tables = orig
    assert [(r.term, r.term_count, r.in_sketch) for r in got] == [
        ("hot", 5, 1), ("warm", 2, 1)
    ]


# --- BPE apply (round 9) -------------------------------------------------------


def test_bpe_apply_overlap_and_merged_boundary_rules(spark):
    """Crafted corpus pins the encode rules: (a) leftmost
    NON-OVERLAPPING replacement -- 'aaaa' under merge 'aa' becomes 2
    symbols, never 3; (b) a higher-priority merge consumes characters
    so a lower-priority pair spanning the merged boundary can no
    longer apply ('ba' in 'banana' disappears once 'an' has merged);
    (c) compression accounting is per source.

    Pair counts (weighted by word frequency): banana x3 -> an:6, na:6,
    ba:3; aaaa x2 -> aa:6.  Rank order (count desc, pair asc):
    aa, an, na, ba.  banana -> b[an][an]a = 4 symbols; aaaa ->
    [aa][aa] = 2 symbols."""
    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_bpe_apply_compression,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1", text="banana banana banana"),
            Row(doc_id=2, source="s2", text="aaaa aaaa"),
        ]
    )
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        got = {r.source: r for r in q_bpe_apply_compression(spark, "unused").collect()}
    finally:
        curation.load_tables = orig

    s1, s2 = got["s1"], got["s2"]
    assert (s1.n_tokens, s1.symbols_before, s1.symbols_after) == (3, 18, 12)
    assert s1.compression_ratio == round(12 / 18, 4)
    assert (s2.n_tokens, s2.symbols_before, s2.symbols_after) == (2, 8, 4)
    assert s2.compression_ratio == 0.5


def test_bpe_apply_plan_broadcasts_segmented_vocab(spark, sf_dir):
    """The rollup join of the raw token stream against the segmented
    vocabulary must broadcast (the vocabulary grows ~log corpus, the
    token stream is the 100 TB side); the vocabulary rollup itself
    must partial-aggregate map-side."""
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        q_bpe_apply_compression,
    )

    df = q_bpe_apply_compression(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1
    assert checks.sort_merge_join_count(df) == 0
    assert checks.has_partial_aggregation(df)
    assert set(checks.read_schema_columns(df)) == {"source", "text"}


def test_bpe_apply_reserved_codepoint_words_are_excluded(spark):
    """ADVICE r9: a hostile document containing U+E000-block chars (the
    reserved merged-symbol placeholders) must not corrupt segmentation
    or symbol accounting -- the guard excludes such words from the
    vocabulary on BOTH engines, so the result equals the same corpus
    with those words absent and the engines still agree."""
    import duckdb
    import pandas as pd

    import spark_streaming_postgres_lab2_spark.queries.curation as curation
    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BPE_PLACE,
        ORACLE_BPE_APPLY,
        q_bpe_apply_compression,
    )

    hostile = f"ab{_BPE_PLACE[0]}cd"  # contains rank-1's placeholder char
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "source": ["s", "s"],
            # without the guard, the hostile word's embedded placeholder
            # would be indistinguishable from an applied merge
            "text": [f"abab abab {hostile}", "abab"],
            "lang": ["en", "en"],
            "n_chars": [15, 4],
        }
    )
    docs = spark.createDataFrame(pdf)
    orig = curation.load_tables
    try:
        curation.load_tables = lambda _s, _d, _t: {"documents": docs}
        rows = q_bpe_apply_compression(spark, "unused").collect()
    finally:
        curation.load_tables = orig

    assert len(rows) == 1
    r = rows[0]
    # the hostile word is excluded: 3 'abab' tokens remain; 'ab' is the
    # top merge, so each 4-char word encodes to 2 symbols
    assert (r.n_tokens, r.symbols_before, r.symbols_after) == (3, 12, 6)
    assert r.compression_ratio == 0.5

    con = duckdb.connect()
    con.register("documents", pdf)
    drow = con.sql(ORACLE_BPE_APPLY).fetchall()[0]
    assert drow == ("s", 3, 12, 6, 0.5)


def test_md5_bucket_matches_hashlib_recipe(spark):
    """The inline copy inside ``q_quality_classifier_filter`` was
    folded into ``_md5_bucket`` (r15 rotation), so the old
    expression-equality pin is retired; this pins the single helper
    against an independent hashlib recompute instead.  Drift inside
    q_quality_classifier_filter itself is still caught by its
    randomized hashlib-replay mirror (test_properties.py,
    test_quality_classifier_matches_python_mirror)."""
    import hashlib

    from pyspark.sql import functions as F

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _QC_MOD,
        _md5_bucket,
    )

    vals = ["", "a", "tok", "\\N", "\u00fcmlaut", "x" * 64, "0", "deadbeef",
            '{"j": 1}', "-1"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", _md5_bucket(F.col("s"), _QC_MOD).alias("b")).collect()
    for r in rows:
        expect = int(hashlib.md5(r.s.encode()).hexdigest()[:15], 16) % _QC_MOD
        assert r.b == expect, (r.s, r.b, expect)

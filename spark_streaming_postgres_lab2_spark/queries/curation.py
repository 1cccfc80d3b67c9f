"""Data-curation operators for a training-corpus pipeline: the
filter / redact / quota / term-analytics stages that sit between raw
ingest and the dedup+mix stages in ``queries/corpus.py``.

All six operators are pure Column expressions (JVM-side, codegen'd;
no UDF anywhere) and every one carries a DuckDB oracle:

- ``exact_ngram_decontaminate``: the GPT-3/PaLM-style EXACT n-gram
  contamination check (any shared 8-gram between a train and an eval
  document), complementing the fuzzy MinHash ``decontaminate``.
- ``pii_redaction``: regex PII scrubbing (emails / IPv4 / phone) with
  per-document redaction counts and a content hash of the scrubbed
  text.
- ``source_quota_sample``: per-source document quota (top-K by size),
  the "domain balancing" stage of corpus assembly.
- ``zipf_top_terms``: corpus-wide term-frequency top-K with rank and
  cumulative share (Zipf diagnostics).
- ``tfidf_top_terms``: per-document top-3 TF-IDF terms over the
  corpus document frequencies.
- ``corpus_filter_chain``: first-match-wins rule-based document
  filter (length / diversity / policy-term) with per-source,
  per-reason accounting -- the corpus-curation analog of the
  reference's 12-tag validation chain
  (/root/reference/src/streaming_job.py validation semantics).

Later additions (same oracle discipline): ``boilerplate_dedup``,
``bpe_merge_candidates``, ``url_domain_filter``,
``html_text_extract``, and ``url_canonical_dedup`` (URL
canonicalization + keep-one dedup, the other half of URL curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..sources.tables import load_tables
from . import QuerySpec

_EVAL_SOURCES = ("src18", "src19")  # same eval split as corpus.decontaminate
_NGRAM_N = 8


def _clean_tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != "")


def _md5_bucket(col, mod: int):
    """The package's portable hash recipe (md5-prefix-15-hex int mod
    m) as a Column -- the single definition used by both the DSIR
    bucketing and the quality-classifier weight hash (the former
    inline copy in ``q_quality_classifier_filter`` was folded here in
    the r15 driver-window rotation, per the r13/r14 review)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % mod


# --- exact n-gram decontamination --------------------------------------------


def q_exact_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram contamination check: a train document is flagged
    iff it shares at least one verbatim 8-token n-gram with an eval
    document (the decontamination rule used for GPT-3/PaLM-style
    benchmark hygiene -- exact substring evidence, vs the Jaccard
    evidence of ``decontaminate``).

    Scale shape mirrors ``minhash_decontaminate``: the EVAL side (a
    benchmark suite -- tiny vs a 100 TB train corpus) is exploded to
    distinct grams and BROADCAST; the train corpus streams through one
    linear shingle pass + broadcast-hash probe and only colliding
    (train, eval, gram) rows reach the final pair aggregation, which
    is bounded by true contamination, not corpus size.  The train side
    is never shuffled in full."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    is_eval = F.col("source").isin(*_EVAL_SOURCES)

    def grams(df: DataFrame, idcol: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(idcol),
            F.explode(F.array_distinct(shingles(F.col("text"), _NGRAM_N))).alias(
                "gram"
            ),
        )

    # spread_input (r15, guide §2.5): the TRAIN side's shingle +
    # explode pass -- the dominant per-row compute -- otherwise runs
    # single-task on the one-split fixture scan.  The eval side stays
    # unspread: it is tiny by construction and feeds a broadcast.
    from ..sources.tables import spread_input

    train = grams(spread_input(docs.filter(~is_eval)), "train_doc_id")
    ev = grams(docs.filter(is_eval), "eval_doc_id")
    return (
        train.join(F.broadcast(ev), "gram")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
        .orderBy("train_doc_id", "eval_doc_id")
    )


def _sql_grams(n: int) -> str:
    """DuckDB n-gram builder mirroring text.shingles: empty docs give
    no grams, docs shorter than n give one whole-text gram."""
    return f"""
__tok AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
__grams AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks) - {n - 2}),
                     i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))
         END AS grams
  FROM __tok
)"""


_EV = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)

ORACLE_EXACT_NGRAM_DECON = (
    "WITH "
    + _sql_grams(_NGRAM_N)
    + f""",
__e AS (
  SELECT doc_id, unnest(list_distinct(grams)) AS gram
  FROM __grams WHERE source IN ({_EV})
),
__t AS (
  SELECT doc_id, unnest(list_distinct(grams)) AS gram
  FROM __grams WHERE source NOT IN ({_EV})
)
SELECT __t.doc_id AS train_doc_id, __e.doc_id AS eval_doc_id,
       CAST(count(*) AS BIGINT) AS n_shared_ngrams
FROM __t JOIN __e USING (gram)
GROUP BY 1, 2
ORDER BY 1, 2
"""
)


# --- PII redaction ------------------------------------------------------------

# Deliberately simple patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB): no backreferences, no lookaround.
_PII_EMAIL = r"[a-z0-9]+@[a-z]+\.(com|net)"
_PII_IP = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
_PII_PHONE = r"555-[0-9]{4}"


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the documents corpus.  The fixture text is a
    clean token stream, so the query first APPENDS deterministic PII
    (an email, an IPv4, a phone number -- all pure arithmetic on
    doc_id) and then redacts it; the oracle re-derives both steps, so
    the hash match proves the redaction itself, not just the counts.

    One codegen'd projection per partition -- no shuffle, no UDF; at
    100 TB this runs at scan speed.  Redaction order (email -> ip ->
    phone) is fixed; the patterns are non-overlapping by construction."""
    t = load_tables(spark, sf_dir, ["documents"])
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or admin@corp.net from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.7 phone 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = t["documents"].select("doc_id", dirty.alias("__dirty"))
    cols = pii_redact_cols(F.col("__dirty"))
    return d.select(
        "doc_id",
        cols["n_emails"].alias("n_emails"),
        cols["n_ips"].alias("n_ips"),
        cols["n_phones"].alias("n_phones"),
        F.md5(cols["clean"]).alias("clean_hash"),
    ).orderBy("doc_id")


def pii_redact_cols(dirty) -> dict:
    """The PII scrub as reusable Column expressions: match counts per
    category and the redacted text (email -> ip -> phone, fixed
    order).  Property-tested against a pure-Python re mirror on
    adversarial inputs (tests/test_properties.py)."""
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, _PII_EMAIL, "[EMAIL]"),
            _PII_IP,
            "[IP]",
        ),
        _PII_PHONE,
        "[PHONE]",
    )
    return {
        "n_emails": F.regexp_count(dirty, F.lit(_PII_EMAIL)).cast("bigint"),
        "n_ips": F.regexp_count(dirty, F.lit(_PII_IP)).cast("bigint"),
        "n_phones": F.regexp_count(dirty, F.lit(_PII_PHONE)).cast("bigint"),
        "clean": clean,
    }


ORACLE_PII_REDACTION = f"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or admin@corp.net from 10.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.0.7 phone 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '{_PII_IP}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(dirty, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(
             dirty, '{_PII_EMAIL}', '[EMAIL]', 'g'),
             '{_PII_IP}', '[IP]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g')) AS clean_hash
FROM d
ORDER BY doc_id
"""


# --- per-source quota sampling ------------------------------------------------

_QUOTA = 15


def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most ``_QUOTA`` documents per source,
    preferring larger documents (n_chars DESC, doc_id ASC tie-break).

    One shuffle keyed on source for the row_number window.  At 100 TB
    a mega-source still pays a full per-group sort here; the
    mitigation (documented, not needed at fixture scale) is a two-phase
    prune: per-partition top-K first (mapPartitions-free -- a local
    sort limit per partition via repartition+sortWithinPartitions),
    or an approximate K-th-size threshold from approx_percentile to
    pre-filter before the exact window.  Only kept rows are emitted,
    so downstream never sees the over-quota mass."""
    t = load_tables(spark, sf_dir, ["documents"])
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        t["documents"]
        .select("doc_id", "source", "n_chars")
        .withColumn("quota_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("quota_rank") <= _QUOTA)
        .orderBy("source", "quota_rank")
    )


ORACLE_SOURCE_QUOTA = f"""
SELECT doc_id, source, n_chars, quota_rank
FROM (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS INTEGER) AS quota_rank
  FROM documents
)
WHERE quota_rank <= {_QUOTA}
ORDER BY source, quota_rank
"""


# --- Zipf term analytics ------------------------------------------------------

_TOPK_TERMS = 50


def q_zipf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term-frequency top-K with rank, share, and
    cumulative share (the Zipf diagnostic a corpus report leads with).

    explode -> groupBy(term) partial-aggregates map-side (combiner
    before the shuffle), then the top-K is selected with
    orderBy+limit, which Spark executes as TakeOrderedAndProject --
    a distributed per-partition top-K merge, NOT a global sort.  The
    rank/cumulative window then runs over K rows only, so the
    single-partition window is constant-sized no matter the corpus.
    Cumulative share accumulates exact BIGINT counts and divides once
    (doubles only at the last step -- see NOTES.md on double folding)."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t["documents"].select(
        F.explode(_clean_tokens(F.col("text"))).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("term_count")
    )
    total = counts.agg(F.sum("term_count").cast("bigint").alias("__total"))
    top = counts.orderBy(F.desc("term_count"), F.asc("term")).limit(_TOPK_TERMS)
    w = Window.orderBy(F.desc("term_count"), F.asc("term"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("int").alias("zipf_rank"),
            "term",
            "term_count",
            F.round(
                F.col("term_count").cast("double") / F.col("__total"), 6
            ).alias("share"),
            F.round(
                F.sum("term_count")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("__total"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("zipf_rank")
    )


ORACLE_ZIPF_TOP_TERMS = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS term_count FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(term_count) AS BIGINT) AS total FROM c),
top AS (SELECT * FROM c ORDER BY term_count DESC, term LIMIT {_TOPK_TERMS})
SELECT CAST(row_number() OVER (ORDER BY term_count DESC, term) AS INTEGER) AS zipf_rank,
       term, term_count,
       round(CAST(term_count AS DOUBLE) / total, 6) AS share,
       round(CAST(sum(term_count) OVER (
               ORDER BY term_count DESC, term ROWS UNBOUNDED PRECEDING
             ) AS DOUBLE) / total, 6) AS cum_share
FROM top, tot
ORDER BY zipf_rank
"""


# --- TF-IDF top terms per document -------------------------------------------

_TFIDF_K = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf = term count in the doc,
    idf = ln(N / df) over corpus document frequencies, ranked by
    (round(tf*idf, 4) DESC, term ASC).

    The document-frequency table is vocabulary-sized (tiny vs the
    corpus) and explicitly broadcast, as is the 1-row corpus count --
    the (doc, term) tf frame, which IS corpus-sized, is touched by
    exactly one shuffle (its own groupBy) plus the per-doc rank
    window.  Ranking uses the ROUNDED score on both engines so a
    sub-ulp ln() difference cannot reorder ties; residual ties break
    on term ASC."""
    t = load_tables(spark, sf_dir, ["documents"])
    # r15 (guide §2.4): ``tf`` feeds df_ AND scored as independent
    # subtrees, so the tokenize + explode + tf aggregation ran twice;
    # the lineage cut makes it run once (the checkpointed rows are
    # three slim columns).  Deliberately NOT spread: interleaved A/B
    # measured the repartition costing ~1.6x on this family -- the
    # tokenize pass is cheap vectorized JVM work, unlike the
    # md5/shingle-heavy census passes where spreading wins.
    tok = t["documents"].select(
        "doc_id", F.explode(_clean_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = t["documents"].agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("__n").cast("double") / F.col("df")),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= _TFIDF_K)
        .select("doc_id", "term_rank", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "term_rank")
    )


ORACLE_TFIDF_TOP_TERMS = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term_rank, term, tf, df, tfidf
FROM (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term
         ) AS INTEGER) AS term_rank
  FROM scored
)
WHERE term_rank <= {_TFIDF_K}
ORDER BY doc_id, term_rank
"""


# --- BM25 keyword search ------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5
# (query_id, term) pairs -- a benchmark query set over the corpus
# vocabulary, literal on both engines
_BM25_QUERIES = (
    ("q_hash_join", "hash"), ("q_hash_join", "join"),
    ("q_vector_scan", "vector"), ("q_vector_scan", "scan"),
    ("q_slow_merge", "slow"), ("q_slow_merge", "merge"), ("q_slow_merge", "batch"),
    ("q_customer_order", "customer"), ("q_customer_order", "order"),
    ("q_filter_column", "filter"), ("q_filter_column", "column"),
)


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 documents per keyword query (Robertson/Sparck-Jones
    with the Lucene non-negative idf): the retrieval stage of a
    search / RAG pipeline over the corpus.

    score(q,d) = sum over query terms t in d of
      ln(1 + (N - df + 0.5)/(df + 0.5))
      * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale shape: the (doc, term) tf frame is corpus-sized but touched
    by one shuffle (its own groupBy); the df table is
    vocabulary-sized and the query set is literal -- both broadcast,
    so scoring is a map-side join over tf.  Per-query top-k is one
    window over the scored frame (|queries| partitions).  Ranking
    uses the ROUNDED score on both engines (tfidf_top_terms
    precedent) so sub-ulp ln()/summation differences cannot reorder
    ties; residual ties break on doc_id ASC."""
    t = load_tables(spark, sf_dir, ["documents"])
    # r15 (guide §2.4): ``tok`` feeds tf AND dl, and ``tf`` feeds
    # df_ AND the scoring join -- independent subtrees re-running the
    # tokenize + explode pass.  The two lineage cuts (slim
    # (doc_id, term, tf) and (doc_id, dl) rows) make it run once.
    # Deliberately NOT spread: interleaved A/B at sf0.1 measured
    # orig 1.40s / ckpt-only 1.42s / spread+ckpt 2.09s / spread 2.31s
    # -- the exchange costs more than the cheap JVM tokenize saves.
    tok = t["documents"].select(
        "doc_id", F.explode(_clean_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    dl = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    ).localCheckpoint(eager=False)
    stats = t["documents"].agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("__avgdl")
    )
    qterms = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id string, term string"
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (F.col("tf") * (1 + _BM25_K1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(idf * norm_tf), 4).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "rank", "doc_id", "score", "n_terms_hit")
        .orderBy("query_id", "rank")
    )


def _bm25_scored_ctes() -> str:
    """WITH-body prefix (qterms .. scored) for the BM25 retrieval
    oracles -- ONE SQL builder shared by ORACLE_BM25 and
    ORACLE_RRF_HYBRID, so the two retrieval consumers replay one
    scoring recipe (byte-identical to the pre-r15 inline text: the
    bm25_search oracle hash, and so its content stamp, is unchanged
    by this extraction)."""
    values = ",\n    ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERIES)
    return f"""qterms(query_id, term) AS (VALUES
    {values}
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
ad AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1 + {_BM25_K1}))
             / (tf.tf + {_BM25_K1}
                * (1 - {_BM25_B} + {_BM25_B} * dl.dl / ad.avgdl))
         ), 4) AS score,
         CAST(count(*) AS INTEGER) AS n_terms_hit
  FROM tf
  JOIN qterms USING (term)
  JOIN df USING (term)
  JOIN dl USING (doc_id), n, ad
  GROUP BY qterms.query_id, tf.doc_id
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()}
SELECT query_id, rank, doc_id, score, n_terms_hit
FROM (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {_BM25_TOPK}
ORDER BY query_id, rank
"""


ORACLE_BM25 = _bm25_oracle()


# --- reciprocal-rank-fusion hybrid retrieval ---------------------------------

_RRF_K = 60      # the canonical RRF constant (Cormack et al. 2009)
_RRF_POOL = 10   # per-system candidate depth fed into the fusion
_RRF_TOPK = 5    # fused results emitted per query


def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion hybrid retrieval (Cormack et al. 2009):
    fuse a BM25 ranking with a TF-IDF ranking of the same keyword
    queries via rrf(d) = sum over systems of 1/(k + rank_s(d)) with
    k=60, over the union of the two top-10 pools (a system that did
    not retrieve the doc contributes 0) -- the standard way search /
    RAG stacks combine lexical and second-opinion rankings without
    score calibration, since RRF consumes only RANK POSITIONS.

    Determinism: each per-system ranking orders on its ROUNDED score
    with doc_id tie-break (the bm25_search recipe), so ranks are
    integers both engines agree on; the fused score is then two IEEE
    divisions and one addition on identical operands, rounded 6 for
    display, and the fused ordering tie-breaks on doc_id.

    Scale shape: tok/tf/df/dl are built ONCE and feed both scorers
    (the corpus-sized frames are never computed twice -- the reason
    this does not simply call q_bm25_search); query terms, df, and
    the 1-row stats broadcast exactly as in bm25_search; the fusion
    itself joins two |queries| x pool frames -- trivially broadcast,
    bounded by the query set, never by the corpus."""
    t = load_tables(spark, sf_dir, ["documents"])
    # r15 (guide §2.4): same restructure as bm25_search -- tok feeds
    # tf AND dl, tf feeds df_ AND the scoring join; the two lineage
    # cuts make the tokenize + explode pass run once.  NOT spread,
    # per the same interleaved A/B verdict as bm25_search.
    tok = t["documents"].select(
        "doc_id", F.explode(_clean_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    dl = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    ).localCheckpoint(eager=False)
    stats = t["documents"].agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("__avgdl")
    )
    qterms = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id string, term string"
    )
    base = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
    )
    bm25_idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    bm25_tf = (F.col("tf") * (1 + _BM25_K1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("__avgdl"))
    )
    scored = base.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(bm25_idf * bm25_tf), 4).alias("__s_bm25"),
        F.round(
            F.sum(
                F.col("tf").cast("double")
                * F.log(F.lit(1.0) + F.col("__n") / F.col("df"))
            ),
            4,
        ).alias("__s_tfidf"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("__s_bm25"), F.asc("doc_id")
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.desc("__s_tfidf"), F.asc("doc_id")
    )
    pools = scored.select(
        "query_id",
        "doc_id",
        F.row_number().over(wa).cast("int").alias("rank_bm25"),
        F.row_number().over(wb).cast("int").alias("rank_tfidf"),
    ).select(
        "query_id",
        "doc_id",
        F.when(F.col("rank_bm25") <= _RRF_POOL, F.col("rank_bm25")).alias(
            "rank_bm25"
        ),
        F.when(F.col("rank_tfidf") <= _RRF_POOL, F.col("rank_tfidf")).alias(
            "rank_tfidf"
        ),
    ).filter(
        F.col("rank_bm25").isNotNull() | F.col("rank_tfidf").isNotNull()
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (_RRF_K + F.col("rank_bm25")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("rank_tfidf")), F.lit(0.0)),
        6,
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("__rrf"), F.asc("doc_id")
    )
    return (
        pools.withColumn("__rrf", rrf)
        .withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("fused_rank") <= _RRF_TOPK)
        .select(
            "query_id",
            "fused_rank",
            "doc_id",
            F.col("__rrf").alias("rrf_score"),
            "rank_bm25",
            "rank_tfidf",
        )
        .orderBy("query_id", "fused_rank")
    )


def _rrf_oracle() -> str:
    return f"""
WITH {_bm25_scored_ctes()},
both_scored AS (
  SELECT qterms.query_id, tf.doc_id,
         round(sum(
           ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1 + {_BM25_K1}))
             / (tf.tf + {_BM25_K1}
                * (1 - {_BM25_B} + {_BM25_B} * dl.dl / ad.avgdl))
         ), 4) AS s_bm25,
         round(sum(
           CAST(tf.tf AS DOUBLE) * ln(1 + CAST(n.n_docs AS DOUBLE) / df.df)
         ), 4) AS s_tfidf
  FROM tf
  JOIN qterms USING (term)
  JOIN df USING (term)
  JOIN dl USING (doc_id), n, ad
  GROUP BY qterms.query_id, tf.doc_id
),
pools AS (
  SELECT query_id, doc_id,
         CASE WHEN ra <= {_RRF_POOL} THEN ra END AS rank_bm25,
         CASE WHEN rb <= {_RRF_POOL} THEN rb END AS rank_tfidf
  FROM (
    SELECT *,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY s_bm25 DESC, doc_id
           ) AS INTEGER) AS ra,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY s_tfidf DESC, doc_id
           ) AS INTEGER) AS rb
    FROM both_scored
  )
  WHERE ra <= {_RRF_POOL} OR rb <= {_RRF_POOL}
),
fused AS (
  SELECT query_id, doc_id, rank_bm25, rank_tfidf,
         round(coalesce(1.0 / ({_RRF_K} + rank_bm25), 0)
               + coalesce(1.0 / ({_RRF_K} + rank_tfidf), 0), 6) AS rrf_score
  FROM pools
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
       ) AS INTEGER) AS fused_rank,
       doc_id, rrf_score, rank_bm25, rank_tfidf
FROM fused
QUALIFY fused_rank <= {_RRF_TOPK}
ORDER BY query_id, fused_rank
"""


ORACLE_RRF_HYBRID = _rrf_oracle()


# --- PMI term co-occurrence ---------------------------------------------------

_PMI_VOCAB = 30   # pairs restricted to the top-30 terms by doc frequency
_PMI_TOPK = 50    # emitted pairs


def q_term_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over co-occurring term pairs --
    the word-association statistic behind collocation extraction and
    phrase mining: pmi(a,b) = ln(P(a,b) / (P(a)P(b))) with
    document-level presence probabilities.

    Pairs are restricted to the top-``_PMI_VOCAB`` terms by document
    frequency (cut deterministically on (df DESC, term)), so the pair
    space is <= C(30,2) and each document contributes at most that
    many pairs to the count -- the doc-id self-join is bounded per
    doc, never corpus-quadratic; the vocabulary table broadcasts.
    All counts are exact BIGINTs; pmi is display-only (one ln,
    rounded 4) and the emitted top-50 orders on (n_both DESC, term_a,
    term_b) -- fully discrete."""
    t = load_tables(spark, sf_dir, ["documents"])
    # tok feeds THREE consumers (the df rollup and both sides of the
    # pair self-join): without the cut the tokenize + explode +
    # distinct pipeline plans as three independent subtrees and runs
    # three times per action (r16, guide §2.4 -- the dsir/census
    # repeated-subtree lesson).  Slim (doc_id, term) rows only.
    tok = (
        t["documents"]
        .select("doc_id", F.explode(_clean_tokens(F.col("text"))).alias("term"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_ = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    vocab = df_.orderBy(F.desc("df"), F.asc("term")).limit(_PMI_VOCAB)
    vtok = tok.join(F.broadcast(vocab), "term")
    n_row = t["documents"].agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    a, b = vtok.alias("a"), vtok.alias("b")
    pairs = (
        a.join(b, F.col("a.doc_id") == F.col("b.doc_id"))
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("b.term").alias("term_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_row))
        .select(
            "term_a",
            "term_b",
            "n_both",
            "df_a",
            "df_b",
            F.round(
                F.log(
                    (F.col("n_both") * F.col("__n")).cast("double")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_both"), "term_a", "term_b")
        .limit(_PMI_TOPK)
    )


ORACLE_TERM_PMI = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
    FROM documents
  )
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY term),
vocab AS (SELECT * FROM df ORDER BY df DESC, term LIMIT {_PMI_VOCAB}),
vtok AS (SELECT tok.doc_id, tok.term, vocab.df FROM tok JOIN vocab USING (term)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM vtok a JOIN vtok b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term, a.df, b.df
)
SELECT term_a, term_b, n_both, df_a, df_b,
       round(ln(CAST(n_both * n.n_docs AS DOUBLE) / (df_a * df_b)), 4) AS pmi
FROM pairs, n
ORDER BY n_both DESC, term_a, term_b
LIMIT {_PMI_TOPK}
"""


# --- rule-based filter chain --------------------------------------------------

_MIN_TOKENS = 20
_MAX_TOKENS = 90
_MIN_DIVERSITY = 0.35
_BAD_TERMS = ("slow", "dup")
_BAD_TERM_LIMIT = 4  # >= this many policy-term hits drops the doc


def filter_chain_classify(docs: DataFrame) -> DataFrame:
    """Per-document first-match-wins drop reason over a ``text``
    column: too_short -> too_long -> low_diversity (distinct/total
    token ratio) -> policy_terms (>= _BAD_TERM_LIMIT blocklist hits)
    -> keep.  Adds a ``reason`` column; all features derive from ONE
    tokenization.  Property-tested against a pure-Python spec mirror
    (tests/test_properties.py)."""
    toks = _clean_tokens(F.col("text"))
    d = docs.withColumns(
        {
            "__n_tok": F.size(toks),
            "__n_uniq": F.size(F.array_distinct(toks)),
            "__n_bad": F.size(F.filter(toks, lambda x: x.isin(*_BAD_TERMS))),
        }
    )
    diversity = F.col("__n_uniq").cast("double") / F.col("__n_tok")
    reason = (
        F.when(F.col("__n_tok") < _MIN_TOKENS, F.lit("too_short"))
        .when(F.col("__n_tok") > _MAX_TOKENS, F.lit("too_long"))
        .when(diversity < _MIN_DIVERSITY, F.lit("low_diversity"))
        .when(F.col("__n_bad") >= _BAD_TERM_LIMIT, F.lit("policy_terms"))
        .otherwise(F.lit("keep"))
    )
    return d.withColumn("reason", reason).drop("__n_tok", "__n_uniq", "__n_bad")


def q_corpus_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-based corpus filter with first-match-wins drop
    reasons (the curation analog of the reference's 12-tag validation
    chain): see filter_chain_classify.  Per-source x reason accounting.

    One tokenization, then a map-side-combinable groupBy; no UDF, no
    window.  The division in the diversity rule is exact IEEE double
    on two small ints, so the 0.35 comparison is engine-stable."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        filter_chain_classify(t["documents"].select("source", "text"))
        .groupBy("source", "reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "reason")
    )


_BAD_SQL = ", ".join(f"'{w}'" for w in _BAD_TERMS)

ORACLE_FILTER_CHAIN = f"""
WITH d AS (
  SELECT source,
         len(toks) AS n_tok,
         len(list_distinct(toks)) AS n_uniq,
         len(list_filter(toks, x -> x IN ({_BAD_SQL}))) AS n_bad
  FROM (
    SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents
  )
)
SELECT source,
       CASE WHEN n_tok < {_MIN_TOKENS} THEN 'too_short'
            WHEN n_tok > {_MAX_TOKENS} THEN 'too_long'
            WHEN CAST(n_uniq AS DOUBLE) / n_tok < {_MIN_DIVERSITY} THEN 'low_diversity'
            WHEN n_bad >= {_BAD_TERM_LIMIT} THEN 'policy_terms'
            ELSE 'keep'
       END AS reason,
       CAST(count(*) AS BIGINT) AS n_docs
FROM d
GROUP BY 1, 2
ORDER BY source, reason
"""


# --- corpus-wide boilerplate removal -----------------------------------------

_BLOCK_N = 8  # tokens per non-overlapping block ("paragraph" unit)
_BOILERPLATE_MIN_DOCS = 2  # block in >= this many DISTINCT docs => boilerplate


def q_boilerplate_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-unit removal (the CCNet/Gopher paragraph-
    dedup step): split every document into non-overlapping 8-token
    blocks, count each block's DISTINCT-document frequency over the
    whole corpus, and drop blocks that appear in >= 2 documents
    (headers, footers, licence banners, mirrored content).  Per doc:
    blocks before/after and an md5 over the kept blocks in position
    order, pinning exactly which content survived.

    Scale shape: one explode of slim (doc_id, pos, md5) rows -> one
    grouped count on the block hash (map-side combinable) -> the
    boilerplate set -- tiny by definition: only units repeated across
    documents -- is broadcast back as a hash-probe filter; the corpus
    itself is shuffled once on doc_id for the ordered re-assembly.
    The fixture has no real newlines, so the unit is a fixed token
    block; the operator is unit-agnostic (swap the block expression
    for split-on-newline in a real corpus)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return boilerplate_doc_stats(t["documents"]).orderBy("doc_id")


def boilerplate_doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document boilerplate accounting over (doc_id, source, text):
    (n_blocks, n_boilerplate, kept_hash).  Documents with fewer than
    _BLOCK_N tokens have no blocks and are absent from the output.
    Property-tested against a pure-Python mirror
    (tests/test_properties.py)."""
    # materialize the token array FIRST: a HOF lambda re-evaluates
    # referenced subexpressions per element, so slicing straight off
    # split(text) would re-tokenize once per block (the r4 O(n^2)
    # shingle lesson).  Deliberately NOT spread_input (r16): the A/B
    # measured the spread variant 1.24x WORSE (1.49 vs 1.20 s) -- the
    # vectorized tokenize+slice is too cheap to pay the exchange, the
    # retrieval-tokenize lesson of r15, not the md5-census one.
    tk = docs.select(
        "doc_id", "source", _clean_tokens(F.col("text")).alias("__tk")
    )
    nb = F.floor(F.size("__tk") / _BLOCK_N).cast("int")
    # filter BEFORE building the sequence: sequence(0, -1) would
    # generate a descending range for block-less docs
    blocks = tk.where(nb > 0).select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda i: F.array_join(
                    F.slice(F.col("__tk"), i * _BLOCK_N + 1, _BLOCK_N), " "
                ),
            )
        ).alias("pos", "block"),
    )
    # hashed feeds BOTH the boilerplate-set aggregate and the probe
    # join below; without the cut the whole tokenize+slice+md5 pipeline
    # plans as two independent subtrees and runs twice (r16, guide
    # §2.4 -- the dsir/census repeated-subtree lesson).  Slim rows
    # only: (doc_id, source, pos, bh).
    hashed = blocks.select(
        "doc_id", "source", "pos", F.md5("block").alias("bh")
    ).localCheckpoint(eager=False)
    boiler = (
        hashed.groupBy("bh")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= _BOILERPLATE_MIN_DOCS)
        .select("bh")
    )
    flagged = hashed.join(
        F.broadcast(boiler.withColumn("__is_boiler", F.lit(1))), "bh", "left"
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__is_boiler").isNull(),
                    F.struct(F.col("pos"), F.col("bh")),
                )
            )
        ),
        lambda s: s["bh"],
    )
    return (
        flagged.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.coalesce(F.col("__is_boiler"), F.lit(0)))
            .cast("bigint")
            .alias("n_boilerplate"),
            F.md5(F.array_join(kept_sorted, "|")).alias("kept_hash"),
        )
    )


ORACLE_BOILERPLATE = f"""
WITH tk AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
positions AS (
  SELECT doc_id, source, tk,
         unnest(range(0, CAST(floor(len(tk) / {_BLOCK_N}) AS BIGINT))) AS pos
  FROM tk
),
blocks AS (
  SELECT doc_id, source, pos,
         md5(array_to_string(list_slice(tk, pos * {_BLOCK_N} + 1, pos * {_BLOCK_N} + {_BLOCK_N}), ' ')) AS bh
  FROM positions
),
boiler AS (
  SELECT bh FROM blocks GROUP BY bh
  HAVING count(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DOCS}
)
SELECT b.doc_id, b.source,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(bo.bh) AS BIGINT) AS n_boilerplate,
       md5(coalesce(string_agg(CASE WHEN bo.bh IS NULL THEN b.bh END, '|' ORDER BY b.pos), '')) AS kept_hash
FROM blocks b LEFT JOIN boiler bo ON b.bh = bo.bh
GROUP BY b.doc_id, b.source
ORDER BY b.doc_id
"""


# --- within-document repeated-block removal ----------------------------------


def q_intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-unit removal (the intra-doc complement
    of boilerplate_dedup; CCNet runs both): split each document into
    non-overlapping 8-token blocks and drop every repeat of a block
    already seen EARLIER IN THE SAME DOCUMENT (keep-first), emitting
    per-doc (n_blocks, n_repeats, kept_hash) with the kept hash over
    surviving blocks in position order.  The fixture corpus has no
    guaranteed intra-doc repetition, so -- same synthesize-then-process
    pattern as pii_redaction -- each document is first truncated to its
    block-aligned prefix and augmented with a copy of its own first 8
    tokens (alignment matters: an unaligned append straddles a block
    boundary and produces no repeated block), guaranteeing >= 1 repeat
    for every document with a full block; the oracle re-derives both
    steps, so the hash pins the keep-first rule itself.

    Scale shape: unlike boilerplate_dedup there is NO corpus-wide
    structure at all -- the min-position window partitions by
    (doc_id, block-hash), so every bit of work is per-document and the
    operator is embarrassingly parallel at any corpus size."""
    t = load_tables(spark, sf_dir, ["documents"])
    # materialize tokens once, then augment (HOF-slice off the same
    # projection is fine here -- no lambda re-evaluation is involved)
    t0 = t["documents"].select(
        "doc_id", _clean_tokens(F.col("text")).alias("__t0")
    )
    aligned = (F.floor(F.size("__t0") / _BLOCK_N) * _BLOCK_N).cast("int")
    tk = t0.select(
        "doc_id",
        F.concat(
            F.slice(F.col("__t0"), 1, aligned),
            F.slice(F.col("__t0"), 1, _BLOCK_N),
        ).alias("__tk"),
    )
    nb = F.floor(F.size("__tk") / _BLOCK_N).cast("int")
    blocks = tk.where(nb > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda i: F.array_join(
                    F.slice(F.col("__tk"), i * _BLOCK_N + 1, _BLOCK_N), " "
                ),
            )
        ).alias("pos", "block"),
    )
    hashed = blocks.select("doc_id", "pos", F.md5("block").alias("bh"))
    w = Window.partitionBy("doc_id", "bh")
    flagged = hashed.withColumn("__keep", F.col("pos") == F.min("pos").over(w))
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__keep"), F.struct(F.col("pos"), F.col("bh")))
            )
        ),
        lambda s: s["bh"],
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.count(F.when(~F.col("__keep"), 1)).cast("bigint").alias("n_repeats"),
            F.md5(F.concat_ws("|", kept_sorted)).alias("kept_hash"),
        )
        .orderBy("doc_id")
    )


ORACLE_INTRA_DOC_DEDUP = f"""
WITH t0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t0
  FROM documents
),
tk AS (
  SELECT doc_id,
         list_concat(
           list_slice(t0, 1, CAST(floor(len(t0) / {_BLOCK_N}) * {_BLOCK_N} AS BIGINT)),
           list_slice(t0, 1, {_BLOCK_N})) AS tk
  FROM t0
),
positions AS (
  SELECT doc_id, tk,
         unnest(range(0, CAST(floor(len(tk) / {_BLOCK_N}) AS BIGINT))) AS pos
  FROM tk
),
blocks AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(tk, pos * {_BLOCK_N} + 1, pos * {_BLOCK_N} + {_BLOCK_N}), ' ')) AS bh
  FROM positions
),
flagged AS (
  SELECT doc_id, pos, bh,
         pos = min(pos) OVER (PARTITION BY doc_id, bh) AS keep
  FROM blocks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_repeats,
       md5(coalesce(string_agg(CASE WHEN keep THEN bh END, '|' ORDER BY pos), '')) AS kept_hash
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


# --- model-based quality filtering -------------------------------------------

# Weight range [-1000, 1000] milli-units; decision rule score > 0.
_QC_MOD = 2001


def q_quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-based quality filtering -- the fastText-classifier stage
    of CCNet/GPT-3-style pipelines, complementing the rule-based
    corpus_filter_chain.  The scorer is a hashing-trick linear model:
    weight(token) = md5-prefix-int % 2001 - 1000 (fastText's hashing
    trick with the weight table REPLACED by a hash function, so the
    'pretrained model' is fully deterministic and the DuckDB oracle
    recomputes every weight); a document's score is the exact BIGINT
    sum over its DISTINCT tokens (integer summation is order-free, so
    no engine can disagree on ties), keep iff score > 0.  Emits
    per-source (n_docs, kept_docs, dropped_docs, avg_score) plus an md5
    over the kept doc-id set, pinning exactly which documents survive.
    Token-less documents never reach the classifier (no feature, no
    row) -- both engines agree by construction.

    Scale shape: a real deployment swaps the hash for a broadcast
    weight table (vocabulary-sized) -- the plan is identical: slim
    (doc_id, token) explode -> per-token weight projection (scan-speed,
    codegen'd) -> ONE map-side-combinable sum per doc -> per-source
    rollup.  100 TB of text crosses the wire once, as longs."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t["documents"].select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_clean_tokens(F.col("text")))).alias("__tok"),
    )
    w = _md5_bucket(F.col("__tok"), _QC_MOD) - (_QC_MOD - 1) // 2
    scored = (
        toks.withColumn("__w", w)
        .groupBy("doc_id", "source")
        .agg(F.sum("__w").alias("__score"))
    )
    kept_ids = F.array_sort(
        F.collect_list(F.when(F.col("__score") > 0, F.col("doc_id")))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("__score") > 0, 1)).cast("bigint").alias("kept_docs"),
            F.count(F.when(F.col("__score") <= 0, 1)).cast("bigint").alias(
                "dropped_docs"
            ),
            F.round(F.sum("__score").cast("double") / F.count(F.lit(1)), 2).alias(
                "avg_score"
            ),
            F.md5(
                F.concat_ws(",", F.transform(kept_ids, lambda x: x.cast("string")))
            ).alias("kept_hash"),
        )
        .orderBy("source")
    )


ORACLE_QUALITY_CLASSIFIER = f"""
WITH tk AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
  FROM documents
),
w AS (
  SELECT doc_id, source,
         (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_QC_MOD} - {(_QC_MOD - 1) // 2}) AS w
  FROM tk
),
s AS (
  SELECT doc_id, source, CAST(sum(w) AS BIGINT) AS score
  FROM w GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN score > 0 THEN 1 END) AS BIGINT) AS kept_docs,
       CAST(count(CASE WHEN score <= 0 THEN 1 END) AS BIGINT) AS dropped_docs,
       round(CAST(sum(score) AS DOUBLE) / count(*), 2) AS avg_score,
       md5(coalesce(string_agg(CASE WHEN score > 0 THEN CAST(doc_id AS VARCHAR) END,
                               ',' ORDER BY doc_id), '')) AS kept_hash
FROM s
GROUP BY source
ORDER BY source
"""


# --- BPE merge-candidate counting --------------------------------------------


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer training at corpus scale: count
    adjacent character pairs weighted by word frequency and return the
    top-50 merge candidates (the pair a BPE trainer would merge next,
    plus the runners-up).

    Scale shape is the textbook one: the corpus collapses to a WORD
    FREQUENCY table first (one shuffle of slim (word, count) rows, a
    few-thousand-row result at any corpus size -- vocabulary grows
    ~log of corpus), and pair extraction runs over the VOCABULARY, not
    the corpus.  100 TB of text never touches the pair stage."""
    t = load_tables(spark, sf_dir, ["documents"])
    words = (
        t["documents"]
        .select(F.explode(_clean_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(50)
    )


ORACLE_BPE_MERGE = """
WITH words AS (
  SELECT w, count(*) AS wc FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
positions AS (
  SELECT w, wc, unnest(range(1, CAST(length(w) AS BIGINT))) AS i
  FROM words WHERE length(w) >= 2
),
pairs AS (
  SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wc FROM positions
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occ
FROM pairs
GROUP BY pair
ORDER BY n_occ DESC, pair
LIMIT 50
"""


# --- HTML text extraction ------------------------------------------------------

# The first stage of any web-corpus pipeline: strip markup down to
# text.  Same synthesize-then-process oracle pattern as pii_redaction:
# the fixture text is wrapped in deterministic HTML (script block,
# heading, attributed paragraph, comment -- all arithmetic on doc_id),
# then the extractor strips it back; the oracle re-derives both steps,
# so the hash pins the extraction rules themselves.


def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction: drop <script> blocks WITH their
    contents, strip remaining tags/comments, collapse runs of spaces,
    trim.  Emits per-doc (n_tags, extracted md5) -- a diverging rule
    (e.g. leaking script bodies into the text) breaks the hash.

    One codegen'd regex projection per partition, no shuffle, no UDF:
    at 100 TB this is the scan-speed pass it must be (a real pipeline
    swaps the regex chain for a proper HTML parser in mapInPandas when
    fidelity demands it -- the Spark-side shape is identical)."""
    t = load_tables(spark, sf_dir, ["documents"])
    html = F.concat(
        F.lit("<html><head><script>var x="),
        F.col("doc_id").cast("string"),
        F.lit(";</script></head><body><h1>Title "),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p class="c'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">'),
        F.col("text"),
        F.lit("</p><!-- footer --></body></html>"),
    )
    d = t["documents"].select("doc_id", html.alias("__html"))
    no_script = F.regexp_replace(
        F.col("__html"), r"<script>[^<]*</script>", " "
    )
    no_tags = F.regexp_replace(no_script, r"<[^>]+>", " ")
    clean = F.trim(F.regexp_replace(no_tags, r" +", " "))
    return d.select(
        "doc_id",
        F.regexp_count(F.col("__html"), F.lit(r"<[^>]+>")).cast("int").alias("n_tags"),
        F.md5(clean).alias("text_hash"),
    ).orderBy("doc_id")


ORACLE_HTML_TEXT_EXTRACT = r"""
WITH d AS (
  SELECT doc_id,
         '<html><head><script>var x=' || CAST(doc_id AS VARCHAR)
         || ';</script></head><body><h1>Title ' || CAST(doc_id AS VARCHAR)
         || '</h1><p class="c' || CAST(doc_id % 7 AS VARCHAR) || '">'
         || text || '</p><!-- footer --></body></html>' AS html
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(html, '<[^>]+>')) AS INTEGER) AS n_tags,
       md5(trim(regexp_replace(regexp_replace(regexp_replace(
             html, '<script>[^<]*</script>', ' ', 'g'),
             '<[^>]+>', ' ', 'g'),
             ' +', ' ', 'g'))) AS text_hash
FROM d
ORDER BY doc_id
"""


# --- URL/domain blocklist filtering -------------------------------------------

# C4-style domain curation: a web corpus is filtered by source domain
# before any content rule runs.  The fixture has no URL column, so --
# exactly like pii_redaction -- the query SYNTHESIZES a deterministic
# URL per document (pure arithmetic on doc_id) and then runs the real
# operator (regex domain extraction -> blocklist join -> per-domain
# accounting); the oracle re-derives both steps, so the hash match
# proves the extraction and the filter, not fixture luck.
_URL_DOMAINS = [
    "news.example", "blog.example", "docs.example", "forum.example",
    "wiki.example", "shop.example", "spam.example", "ads.example",
]
_URL_BLOCKLIST = ("spam.example", "ads.example")


def q_url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus accounting with a domain blocklist: synthesize
    ``https://<domain>/p/<doc_id>`` (domain = pool[doc_id % 8]), extract
    the registrable domain back out with a regex (the operator under
    test -- a real pipeline gets a raw ``url`` column), flag blocklisted
    domains, and emit per-domain (n_docs, total_chars, blocked).

    Scale shape: one codegen'd projection (regexp_extract + an 8-way
    CASE) and one map-side-combinable groupBy on domain -- at 100 TB
    this is a scan-speed pass; the blocklist is a literal IN (a real
    deployment broadcasts a blocklist dimension, the same shape as
    exact_ngram_decontaminate's broadcast probe)."""
    t = load_tables(spark, sf_dir, ["documents"])
    domain_expr = F.element_at(
        F.array(*[F.lit(d) for d in _URL_DOMAINS]),
        (F.col("doc_id") % len(_URL_DOMAINS)).cast("int") + 1,
    )
    d = t["documents"].select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://"), domain_expr, F.lit("/p/"), F.col("doc_id").cast("string")
        ).alias("__url"),
    )
    extracted = d.select(
        "doc_id",
        "n_chars",
        F.regexp_extract(F.col("__url"), r"https://([^/]+)/", 1).alias("domain"),
    )
    return (
        extracted.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .withColumn(
            "blocked",
            F.when(F.col("domain").isin(*_URL_BLOCKLIST), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .orderBy("domain")
    )


_DOMAINS_SQL = ", ".join(f"'{d}'" for d in _URL_DOMAINS)
_BLOCK_SQL = ", ".join(f"'{d}'" for d in _URL_BLOCKLIST)

ORACLE_URL_DOMAIN_FILTER = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         'https://' || ([{_DOMAINS_SQL}][CAST(doc_id % {len(_URL_DOMAINS)} AS INTEGER) + 1])
                    || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
x AS (
  SELECT doc_id, n_chars, regexp_extract(url, 'https://([^/]+)/', 1) AS domain
  FROM d
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(CASE WHEN domain IN ({_BLOCK_SQL}) THEN 1 ELSE 0 END AS INTEGER) AS blocked
FROM x
GROUP BY domain
ORDER BY domain
"""


# --- URL canonicalization + dedup ----------------------------------------------

# The other half of URL curation (url_domain_filter is the blocklist
# half): a crawl sees the same page under many surface forms -- scheme/
# host case, explicit default port, tracking parameters, fragments,
# trailing slash.  Canonicalize, then keep one document per canonical
# URL.  The fixture has no URL column, so -- same pattern as
# pii_redaction / url_domain_filter -- each doc synthesizes one of
# three deterministic messy variants of a shared base URL (base =
# doc_id // 3, so consecutive id-triples collide iff canonicalization
# is right), and the oracle re-derives both the mess and the cleanup.
_CANON_DOMAINS = ["news.example", "blog.example", "docs.example", "wiki.example"]


def canonicalize_url(col: F.Column) -> F.Column:
    """The canonicalization chain under test, as a reusable Column
    expression: strip fragment -> lowercase -> strip utm_* tracking
    params -> repair the query separator -> strip the explicit :443
    default port (https only, anchored to the authority) -> strip the
    trailing slash.  Every step is a codegen'd string primitive; the
    DuckDB mirror in ORACLE_URL_CANONICAL_DEDUP and the pure-Python
    mirror in tests/mirrors.py apply the identical chain.

    Review-hardened rules: the port strip is anchored to
    ``^https://<authority>`` so a ':443' inside a path or on an http
    URL (where 443 is NOT the default) is preserved, and it fires with
    or without a following path; stripping a leading utm param leaves
    '&' where '?' belongs, so the first separator is promoted back
    ('^([^?]*)&' fires at most once by anchoring).  Caveat (by
    design): the final lower() lowercases the whole string, which is
    exact for scheme+host and for this operator's digit-path grammar;
    a deployment with case-significant paths would scope it to the
    authority."""
    canon = F.regexp_replace(col, r"#.*$", "")                     # fragment
    canon = F.lower(canon)                                         # scheme+host case
    canon = F.regexp_replace(canon, r"[?&]utm_[a-z]+=[^&#]*", "")  # tracking params
    canon = F.regexp_replace(canon, r"^([^?&]*)&", "$1?")           # separator repair
    canon = F.regexp_replace(
        canon, r"^(https://[^/?#]+):443([/?#]|$)", "$1$2"          # default https port
    )
    return F.regexp_replace(canon, r"/$", "")                      # trailing slash


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: strip fragment, strip utm_* tracking
    params, strip the explicit :443 default port, lowercase, strip the
    trailing slash; group by canonical URL and keep the minimum doc_id.
    (The grammar keeps paths digit-only, so whole-string lower() equals
    the scheme+host-only lowering a general canonicalizer does.)

    Scale shape: the canonicalization is a chain of codegen'd
    regexp_replace/replace/lower projections (scan-speed, no UDF), and
    the dedup is ONE map-side-combinable groupBy on the canonical
    string -- the same shape as exact hash-dedup, because after
    canonicalization that is exactly what URL dedup is."""
    t = load_tables(spark, sf_dir, ["documents"])
    base = F.expr("doc_id DIV 3")
    domain = F.element_at(
        F.array(*[F.lit(d) for d in _CANON_DOMAINS]),
        (base % len(_CANON_DOMAINS)).cast("int") + 1,
    )
    variant = (F.col("doc_id") % 3).cast("int")
    url = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://"), domain, F.lit("/p/"), base.cast("string")),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://"),
                F.upper(domain),
                F.lit(":443/p/"),
                base.cast("string"),
                F.lit("?utm_source=feed#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"),
                domain,
                F.lit("/p/"),
                base.cast("string"),
                F.lit("/?utm_campaign=x&utm_medium=y"),
            )
        )
    )
    d = t["documents"].select("doc_id", url.alias("__url"))
    return (
        d.select("doc_id", canonicalize_url(F.col("__url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


_CANON_DOMAINS_SQL = ", ".join(f"'{d}'" for d in _CANON_DOMAINS)

ORACLE_URL_CANONICAL_DEDUP = rf"""
WITH d AS (
  SELECT doc_id,
         doc_id // 3 AS base,
         [{_CANON_DOMAINS_SQL}][CAST((doc_id // 3) % {len(_CANON_DOMAINS)} AS INTEGER) + 1] AS domain,
         CAST(doc_id % 3 AS INTEGER) AS variant
  FROM documents
),
u AS (
  SELECT doc_id,
         CASE variant
           WHEN 0 THEN 'https://' || domain || '/p/' || CAST(base AS VARCHAR)
           WHEN 1 THEN 'HTTPS://' || upper(domain) || ':443/p/' || CAST(base AS VARCHAR)
                       || '?utm_source=feed#frag'
           ELSE 'https://' || domain || '/p/' || CAST(base AS VARCHAR)
                       || '/?utm_campaign=x&utm_medium=y'
         END AS url
  FROM d
),
c AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(regexp_replace(url, '#.*$', '', 'g')),
                              '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
               '^([^?&]*)&', '\1?'),
             '^(https://[^/?#]+):443([/?#]|$)', '\1\2'),
           '/$', '', 'g') AS canonical_url
  FROM u
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       min(doc_id) AS keep_doc_id
FROM c
GROUP BY canonical_url
ORDER BY canonical_url
"""


def q_freq_items_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible quality gate for the FREQUENT-ITEMS sketch
    (``df.stat.freqItems``, Karp/Misra-Gries) -- the last approximate
    family without oracle evidence (HLL++, Bernoulli sampling, and the
    quantile sketch already have audits).  Over the Zipfian corpus
    token stream: every term whose exact count exceeds 1% of all
    tokens (the integer cross-multiply ``cnt*100 > total``, no float
    threshold) is emitted with its exact count and an ``in_sketch``
    flag.  Misra-Gries' containment guarantee -- any item with
    frequency > support*n is ALWAYS reported, independent of partition
    order -- makes the flag deterministically 1, so a sketch
    regression fails the driver hash while the sketch's (permitted)
    false positives never enter the result.

    Scale shape: one map-side-combinable term count; the sketch pass
    is a single aggregation with <= 1/support state entries per
    partition; the collected sketch row is bounded at 1/support = 100
    items (the bounded-collect precedent: k-means seeds, CC probe)."""
    support = 0.01
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t["documents"].select(
        F.explode(_clean_tokens(F.col("text"))).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("term_count")
    )
    total = counts.agg(F.sum("term_count").cast("bigint").alias("__total"))
    sketch_items = set(toks.stat.freqItems(["term"], support).collect()[0][0])
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("term_count") * 100 > F.col("__total"))
        .select(
            "term",
            "term_count",
            F.col("term").isin(list(sketch_items)).cast("int").alias("in_sketch"),
        )
        .orderBy(F.desc("term_count"), "term")
    )


ORACLE_FREQ_ITEMS_AUDIT = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS term_count FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(term_count) AS BIGINT) AS total FROM c)
SELECT term, term_count, CAST(1 AS INTEGER) AS in_sketch
FROM c, tot
WHERE term_count * 100 > total
ORDER BY term_count DESC, term
"""


# --- CCNet-style LM quality gate -----------------------------------------------


def _bigram_bits_scored(docs) -> DataFrame:
    """Per-document (doc_id, n_bigrams, total_bits) under THE add-one
    bigram integer-surprisal surrogate -- the single definition shared
    by ``lm_surprisal_filter`` (doc-level quality gate) and
    ``doremi_domain_weights`` (domain reweighting), extracted r15 so
    the two LM consumers cannot drift (the _md5_bucket lesson, applied
    at birth this time).  ``docs`` must carry ``doc_id`` and a
    tokenized ``__tk`` array column; docs with < 2 tokens produce no
    output row.  Exactness + 100 TB scale rationale: see
    q_lm_surprisal_filter, whose docstring owns the recipe."""
    bg = (
        docs.filter(F.size("__tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__tk) - 2),"
                    " i -> struct(__tk[i] AS w1, __tk[i + 1] AS w2))"
                )
            ).alias("__b"),
        )
        .select("doc_id", F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = docs.select(F.explode("__tk").alias("__t")).agg(
        F.countDistinct("__t").cast("long").alias("v")
    )
    # per-DISTINCT-bigram surprisal table, built from the two count
    # tables alone (bounded by the distinct-bigram count, never corpus
    # size) so the corpus-sized bigram stream shuffles through ONE
    # join instead of two (r13 review)
    bits = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (F.length(F.expr("bin((c1 + v) div (c12 + 1))")) - 1)
            .cast("long")
            .alias("__bits"),
        )
    )
    return (
        bg.join(bits, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__bits").cast("long").alias("total_bits"),
        )
    )


# shared DuckDB CTE prefix mirroring _bigram_bits_scored -- ONE SQL
# builder for both LM-surrogate oracles, same reasoning as the shared
# Spark helper (names: ftk / bg / c12 / c1 / vocab / scored)
_SQL_BIGRAM_SCORED = """
ftk AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
bgpos AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
  FROM ftk WHERE len(tk) >= 2
),
bg AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM bgpos),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
c1  AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
vocab AS (
  SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
  FROM (SELECT unnest(tk) AS t FROM ftk)
),
scored AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(length(bin((c1.c1 + vocab.v) // (c12.c12 + 1))) - 1)
              AS BIGINT) AS total_bits
  FROM bg b
  JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  JOIN c1 ON c1.w1 = b.w1, vocab
  GROUP BY b.doc_id
)"""


def q_lm_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality gate, the CCNet recipe (Wenzek et al., LREC
    2020: score every document with a language model and keep the
    low-perplexity side) with the LM trained on the corpus itself: an
    add-one-smoothed BIGRAM model, P(w2|w1) = (c12+1)/(c1+V).  The
    heuristic tier (``quality_classifier_filter``) scores surface
    features; this is the missing model-based tier of the quality
    family.

    Exactness: real log-probabilities can never hash-match across
    engines (libm), so the score is an integer SURPRISAL surrogate:
    per bigram, bits = floor(log2((c1+V) div (c12+1))) computed as
    length(bin(q))-1 -- pure integer division + binary length, bit-
    identical on Spark and DuckDB (verified: both engines' ``bin``
    agree).  A document's mean bits-per-bigram is a double obtained by
    ONE IEEE division of two BIGINTs, and the keep rule compares it to
    the corpus mean (same construction), so every comparison is
    deterministic.  Docs with < 2 tokens have no bigrams: counted
    (n_docs) but never scored or kept.

    Scale shape (100 TB): token and bigram counts are map-side-
    combinable groupBys; scoring joins the bigram stream against the
    count tables with plain hash equi-joins on the bigram/context key
    (both sides corpus-derived -- nothing corpus-sized is ever
    broadcast); V and the corpus-mean gate are 1-row broadcast
    scalars.  No window, no self-join, no driver loop."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select(
        "doc_id",
        "source",
        _clean_tokens(F.col("text")).alias("__tk"),
    )
    # scored feeds the corpus-mean gate AND the per-doc flag join; the
    # scale-gated cut (r16, VERDICT r15 item 5) runs the bigram
    # pipeline once per action instead of once per consumer as soon as
    # the input is big enough to out-cost the materialization --
    # measured locally un-cut is faster, so the gate keeps the fixture
    # shape at sf0.1
    from ..sources.tables import cut_when_large

    scored = cut_when_large(_bigram_bits_scored(docs), t["documents"])
    gate = scored.agg(
        (F.sum("total_bits") / F.sum("n_bigrams")).alias("__mean")
    )
    flagged = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(gate))
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            "total_bits",
            F.col("n_bigrams").isNotNull().alias("__scored"),
            (
                F.col("n_bigrams").isNotNull()
                & ((F.col("total_bits") / F.col("n_bigrams")) <= F.col("__mean"))
            ).alias("__kept"),
        )
    )
    kept_ids = F.array_sort(
        F.collect_list(F.when(F.col("__kept"), F.col("doc_id")))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("__scored"), 1)).cast("long").alias("n_scored"),
            F.count(F.when(F.col("__kept"), 1)).cast("long").alias("n_kept"),
            F.coalesce(F.sum("total_bits"), F.lit(0)).cast("long").alias("sum_bits"),
            F.coalesce(F.sum("n_bigrams"), F.lit(0)).cast("long").alias("sum_bigrams"),
            F.when(
                F.coalesce(F.sum("n_bigrams"), F.lit(0)) > 0,
                F.round(F.sum("total_bits") / F.sum("n_bigrams"), 4),
            ).alias("mean_bits"),
            F.md5(
                F.concat_ws(",", F.transform(kept_ids, lambda x: x.cast("string")))
            ).alias("kept_ids_hash"),
        )
        .orderBy("source")
    )


ORACLE_LM_SURPRISAL = f"""
WITH {_SQL_BIGRAM_SCORED},
gate AS (
  SELECT CAST(sum(total_bits) AS DOUBLE) / CAST(sum(n_bigrams) AS DOUBLE)
           AS mean_bits
  FROM scored
),
flagged AS (
  SELECT f.doc_id, f.source, s.n_bigrams, s.total_bits,
         s.doc_id IS NOT NULL AS scored,
         (s.doc_id IS NOT NULL)
           AND (CAST(s.total_bits AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
                <= g.mean_bits) AS kept
  FROM ftk f LEFT JOIN scored s ON s.doc_id = f.doc_id, gate g
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN scored THEN 1 END) AS BIGINT) AS n_scored,
       CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(total_bits), 0) AS BIGINT) AS sum_bits,
       CAST(coalesce(sum(n_bigrams), 0) AS BIGINT) AS sum_bigrams,
       CASE WHEN coalesce(sum(n_bigrams), 0) > 0
            THEN round(CAST(sum(total_bits) AS DOUBLE)
                       / CAST(sum(n_bigrams) AS DOUBLE), 4)
       END AS mean_bits,
       md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                    FILTER (WHERE kept), '')) AS kept_ids_hash
FROM flagged
GROUP BY source
ORDER BY source
"""


# --- three-tier quality consensus --------------------------------------------


def q_quality_consensus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tier quality consensus -- the vote a production curation
    stack actually gates on: the repo's three INDEPENDENT quality
    tiers (C4-style rule chain / hashing-trick classifier / corpus-
    trained bigram-LM gate) each cast a keep vote per document, and
    the pipeline keeps on majority (votes >= 2).  Certifies tier
    COMPOSITION under one hash: per source, the per-tier keep counts,
    the full 0..3 vote histogram, and the consensus-kept count.

    Tier semantics are the certified originals, reached through the
    same shared code paths (filter_chain_classify; _md5_bucket weight
    hash; _bigram_bits_scored + corpus-mean gate), so this query
    cannot drift from the tiers it composes.  Unscorable documents
    vote False in the tier that cannot score them (no tokens -> no
    classifier features; < 2 tokens -> no LM bigrams), pinned with
    explicit coalesce on BOTH engines so degenerate corpora (empty,
    all-NULL) stay hash-identical.

    Scale shape: one tokenization feeds the rule features; the
    classifier and LM tiers are the originals' plans (map-side
    combinable aggs + bigram-key equi-joins); the three vote frames
    join back on doc_id (hash joins on the corpus key, no window, no
    driver loop) and collapse to one per-source rollup."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select("doc_id", "source", "text")
    rules = filter_chain_classify(docs).select(
        "doc_id", (F.col("reason") == "keep").alias("__v_rules")
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_clean_tokens(F.col("text")))).alias("__tok"),
    )
    clf = (
        toks.withColumn(
            "__w", _md5_bucket(F.col("__tok"), _QC_MOD) - (_QC_MOD - 1) // 2
        )
        .groupBy("doc_id")
        .agg(F.sum("__w").cast("long").alias("__score"))
    )
    # same scale-gated cut as q_lm_surprisal_filter: scored feeds the
    # gate aggregate AND the vote join (r16, VERDICT r15 item 5)
    from ..sources.tables import cut_when_large

    scored = cut_when_large(
        _bigram_bits_scored(
            docs.select("doc_id", _clean_tokens(F.col("text")).alias("__tk"))
        ),
        t["documents"],
    )
    gate = scored.agg(
        (F.sum("total_bits") / F.sum("n_bigrams")).alias("__mean")
    )
    votes = (
        docs.select("doc_id", "source")
        .join(rules, "doc_id")
        .join(clf, "doc_id", "left")
        .join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(gate))
        .select(
            "source",
            F.col("__v_rules"),
            F.coalesce(F.col("__score") > 0, F.lit(False)).alias("__v_clf"),
            F.coalesce(
                (F.col("total_bits") / F.col("n_bigrams")) <= F.col("__mean"),
                F.lit(False),
            ).alias("__v_lm"),
        )
        .withColumn(
            "__votes",
            F.col("__v_rules").cast("int")
            + F.col("__v_clf").cast("int")
            + F.col("__v_lm").cast("int"),
        )
    )
    return (
        votes.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("__v_rules"), 1)).cast("long").alias("keep_rules"),
            F.count(F.when(F.col("__v_clf"), 1)).cast("long").alias(
                "keep_classifier"
            ),
            F.count(F.when(F.col("__v_lm"), 1)).cast("long").alias("keep_lm"),
            F.count(F.when(F.col("__votes") == 0, 1)).cast("long").alias("votes_0"),
            F.count(F.when(F.col("__votes") == 1, 1)).cast("long").alias("votes_1"),
            F.count(F.when(F.col("__votes") == 2, 1)).cast("long").alias("votes_2"),
            F.count(F.when(F.col("__votes") == 3, 1)).cast("long").alias("votes_3"),
            F.count(F.when(F.col("__votes") >= 2, 1)).cast("long").alias(
                "consensus_kept"
            ),
        )
        .orderBy("source")
    )


ORACLE_QUALITY_CONSENSUS = f"""
WITH {_SQL_BIGRAM_SCORED},
gate AS (
  SELECT CAST(sum(total_bits) AS DOUBLE) / CAST(sum(n_bigrams) AS DOUBLE)
           AS mean_bits
  FROM scored
),
rule_feats AS (
  SELECT doc_id, source,
         len(toks) AS n_tok,
         len(list_distinct(toks)) AS n_uniq,
         len(list_filter(toks, x -> x IN ({_BAD_SQL}))) AS n_bad
  FROM (
    SELECT doc_id, source,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents
  )
),
rules AS (
  SELECT doc_id, source,
         CASE WHEN n_tok < {_MIN_TOKENS} THEN FALSE
              WHEN n_tok > {_MAX_TOKENS} THEN FALSE
              WHEN CAST(n_uniq AS DOUBLE) / n_tok < {_MIN_DIVERSITY} THEN FALSE
              WHEN n_bad >= {_BAD_TERM_LIMIT} THEN FALSE
              ELSE TRUE
         END AS v_rules
  FROM rule_feats
),
clf AS (
  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
  FROM (
    SELECT doc_id,
           (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {_QC_MOD}
            - {(_QC_MOD - 1) // 2}) AS w
    FROM (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(text, ' '),
                                              x -> x <> ''))) AS tok
      FROM documents
    )
  )
  GROUP BY doc_id
),
votes AS (
  SELECT r.source,
         r.v_rules,
         coalesce(c.score > 0, FALSE) AS v_clf,
         coalesce(CAST(s.total_bits AS DOUBLE) / s.n_bigrams <= g.mean_bits,
                  FALSE) AS v_lm
  FROM rules r
  LEFT JOIN clf c ON c.doc_id = r.doc_id
  LEFT JOIN scored s ON s.doc_id = r.doc_id, gate g
),
counted AS (
  SELECT source, v_rules, v_clf, v_lm,
         CAST(v_rules AS INTEGER) + CAST(v_clf AS INTEGER)
           + CAST(v_lm AS INTEGER) AS votes
  FROM votes
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN v_rules THEN 1 END) AS BIGINT) AS keep_rules,
       CAST(count(CASE WHEN v_clf THEN 1 END) AS BIGINT) AS keep_classifier,
       CAST(count(CASE WHEN v_lm THEN 1 END) AS BIGINT) AS keep_lm,
       CAST(count(CASE WHEN votes = 0 THEN 1 END) AS BIGINT) AS votes_0,
       CAST(count(CASE WHEN votes = 1 THEN 1 END) AS BIGINT) AS votes_1,
       CAST(count(CASE WHEN votes = 2 THEN 1 END) AS BIGINT) AS votes_2,
       CAST(count(CASE WHEN votes = 3 THEN 1 END) AS BIGINT) AS votes_3,
       CAST(count(CASE WHEN votes >= 2 THEN 1 END) AS BIGINT) AS consensus_kept
FROM counted
GROUP BY source
ORDER BY source
"""


# --- DoReMi-style domain reweighting -----------------------------------------


def q_doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    per-domain excess loss under a reference model drives the next
    mix's domain weights.  Fourth member of the training-mix family --
    training_mix_sample (fixed rates), training_mix_upsample (fixed
    epochs), unimax_mix_allocation (token-budget water-filling), and
    now LOSS-driven allocation, with domain = source.

    The reference model is the corpus-trained add-one-bigram integer
    surprisal surrogate shared with lm_surprisal_filter
    (_bigram_bits_scored -- one definition, so the gate and the
    reweighter can never score the same corpus differently).  Domain
    loss is integer millibits-per-bigram (sum_bits*1000 DIV
    sum_bigrams), excess is loss minus the minimum domain loss, and
    one LINEARIZED multiplicative-weights step emits integer basis
    points proportional to excess (DoReMi's exp(eta*excess) update
    linearized so the whole allocation is integer-exact and sits
    under the driver hash; exp/softmax display math is exactly what
    the repo's cross-engine contract avoids).  Degenerate cases are
    total: all domains tied -> uniform 10000 DIV k; a domain with no
    scorable bigram -> NULL loss, weight 0.

    Scale shape: the corpus-sized work is exactly
    lm_surprisal_filter's (map-side-combinable counts, hash
    equi-joins on bigram keys, nothing corpus-sized broadcast); all
    reweighting arithmetic runs on the DOMAIN table (tens of rows at
    any corpus scale) against a ONE-ROW broadcast stats frame -- no
    window over data, no driver loop, no second corpus pass."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select(
        "doc_id",
        "source",
        _clean_tokens(F.col("text")).alias("__tk"),
    )
    scored = _bigram_bits_scored(docs)
    dom = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("n_bigrams").isNotNull(), 1))
            .cast("long")
            .alias("n_scored"),
            F.coalesce(F.sum("total_bits"), F.lit(0)).cast("long").alias("sum_bits"),
            F.coalesce(F.sum("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("sum_bigrams"),
        )
        .withColumn(
            "loss_mbits",
            F.when(
                F.col("sum_bigrams") > 0,
                F.expr("(sum_bits * 1000) div sum_bigrams"),
            ).cast("long"),
        )
        # r15 (guide §2.4): ``dom`` feeds the stats agg AND the final
        # select as independent subtrees, so the whole corpus-sized
        # bigram-LM pipeline underneath ran twice per action.  dom is
        # DOMAIN-sized (tens of rows at any corpus scale), so the cut
        # is free -- unlike checkpointing the corpus-sized LM frames,
        # which measured as a local regression and stays rejected.
        .localCheckpoint(eager=False)
    )
    # min/sum/count over the scored domains collapse to ONE row
    # (sum of excess == sum_loss - k*min_loss, so no second pass)
    stats = dom.agg(
        F.min("loss_mbits").alias("__min_loss"),
        F.sum("loss_mbits").cast("long").alias("__sum_loss"),
        F.count("loss_mbits").cast("long").alias("__k"),
    )
    return (
        dom.crossJoin(F.broadcast(stats))
        .select(
            "source",
            "n_docs",
            "n_scored",
            "sum_bits",
            "sum_bigrams",
            "loss_mbits",
            (F.col("loss_mbits") - F.col("__min_loss"))
            .cast("long")
            .alias("excess_mbits"),
            F.when(F.col("loss_mbits").isNull(), F.lit(0))
            .when(
                F.col("__sum_loss") - F.col("__k") * F.col("__min_loss") > 0,
                F.expr(
                    "((loss_mbits - __min_loss) * 10000)"
                    " div (__sum_loss - __k * __min_loss)"
                ),
            )
            .otherwise(F.expr("10000 div __k"))
            .cast("long")
            .alias("weight_bp"),
        )
        .orderBy("source")
    )


ORACLE_DOREMI = f"""
WITH {_SQL_BIGRAM_SCORED},
dom AS (
  SELECT f.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(s.doc_id) AS BIGINT) AS n_scored,
         CAST(coalesce(sum(s.total_bits), 0) AS BIGINT) AS sum_bits,
         CAST(coalesce(sum(s.n_bigrams), 0) AS BIGINT) AS sum_bigrams
  FROM ftk f LEFT JOIN scored s ON s.doc_id = f.doc_id
  GROUP BY f.source
),
dom2 AS (
  SELECT *,
         CASE WHEN sum_bigrams > 0
              THEN CAST((sum_bits * 1000) // sum_bigrams AS BIGINT)
         END AS loss_mbits
  FROM dom
),
stats AS (
  SELECT min(loss_mbits) AS min_loss,
         CAST(sum(loss_mbits) AS BIGINT) AS sum_loss,
         CAST(count(loss_mbits) AS BIGINT) AS k
  FROM dom2
)
SELECT source, n_docs, n_scored, sum_bits, sum_bigrams, loss_mbits,
       CAST(loss_mbits - min_loss AS BIGINT) AS excess_mbits,
       CAST(CASE WHEN loss_mbits IS NULL THEN 0
                 WHEN sum_loss - k * min_loss > 0
                 THEN ((loss_mbits - min_loss) * 10000)
                      // (sum_loss - k * min_loss)
                 ELSE 10000 // k END AS BIGINT) AS weight_bp
FROM dom2, stats
ORDER BY source
"""


# --- DSIR importance selection ---------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TOPK = 50
_DSIR_TARGET_LANG = "en"


def q_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection via importance resampling -- the DSIR recipe
    (Xie et al., NeurIPS 2023: weight every raw document by the
    likelihood ratio of a TARGET domain vs the raw corpus under
    hashed-n-gram feature distributions, then sample by weight).  The
    target here is the ``lang = 'en'`` subcorpus (the "select
    web data that looks like Wikipedia" framing); the emitted result
    is the top-k docs by importance weight -- the deterministic
    ranking core of the method (the paper's Gumbel perturbation is a
    sampling detail on top of exactly this weight).

    Exactness: features are hashed BIGRAM buckets (md5-prefix int mod
    256, the package's portable hash recipe), and the per-bucket log
    ratio ln(p_target/p_raw) is replaced by the integer surrogate
    floor(log2(c_t+1)) - floor(log2(c_r+1)) via length(bin(x))-1 --
    the same bit-surprisal trick as lm_surprisal_filter, so weights
    are BIGINTs under the driver hash and the top-k cut
    (weight DESC, doc_id ASC) is fully discrete.

    Scale shape (100 TB): the feature space is CONSTANT (256 buckets),
    so both distributions are one map-side-combinable agg each, the
    weight table is 256 rows and BROADCASTS, scoring is one broadcast
    join over the bigram stream plus a per-doc partial agg, and the
    top-k is TakeOrdered (no global sort shuffle).  Nothing
    corpus-sized is ever joined against itself or broadcast."""
    from ..sources.tables import spread_input

    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select(
        "doc_id",
        "source",
        "lang",
        _clean_tokens(F.col("text")).alias("__tk"),
    )
    # r15 (guide §2.4/§2.5): ``bg`` feeds THREE consumers (raw, tgt,
    # scored) that plan as independent subtrees, so the tokenize +
    # bigram-explode + md5-bucket pipeline -- the query's dominant
    # per-row compute -- ran three times, each time single-task on the
    # one-split fixture scan.  spread_input parallelizes the pass and
    # the lineage cut makes it run ONCE; the checkpointed rows are
    # three slim columns (doc_id, lang, bucket).
    bg = (
        spread_input(docs)
        .filter(F.size("__tk") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__tk) - 2),"
                    " i -> concat(__tk[i], ' ', __tk[i + 1]))"
                )
            ).alias("__bgram"),
        )
        .select(
            "doc_id",
            "lang",
            _md5_bucket(F.col("__bgram"), _DSIR_BUCKETS).alias("__bucket"),
        )
        .localCheckpoint(eager=False)
    )
    raw = bg.groupBy("__bucket").agg(F.count(F.lit(1)).cast("long").alias("__c_r"))
    tgt = (
        bg.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__c_t"))
    )
    weights = (
        raw.join(tgt, "__bucket", "left")
        .select(
            "__bucket",
            (
                (F.length(F.expr("bin(coalesce(__c_t, 0L) + 1L)")) - 1)
                - (F.length(F.expr("bin(__c_r + 1L)")) - 1)
            ).cast("long").alias("__w"),
        )
    )
    scored = (
        bg.join(F.broadcast(weights), "__bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__w").cast("long").alias("weight"),
        )
    )
    return (
        scored.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .select("doc_id", "source", "lang", "n_bigrams", "weight")
        .orderBy(F.col("weight").desc(), "doc_id")
        .limit(_DSIR_TOPK)
    )


ORACLE_DSIR = f"""
WITH ftk AS (
  SELECT doc_id, source, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
bgpos AS (
  SELECT doc_id, lang, tk, unnest(generate_series(1, len(tk) - 1)) AS i
  FROM ftk WHERE len(tk) >= 2
),
bg AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i + 1]), 1, 15)) AS BIGINT)
           % {_DSIR_BUCKETS} AS bucket
  FROM bgpos
),
raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_r FROM bg GROUP BY bucket),
tgt AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS c_t
  FROM bg WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY bucket
),
w AS (
  SELECT r.bucket,
         CAST((length(bin(coalesce(t.c_t, 0) + 1)) - 1)
              - (length(bin(r.c_r + 1)) - 1) AS BIGINT) AS w
  FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket
),
scored AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(w.w) AS BIGINT) AS weight
  FROM bg b JOIN w ON w.bucket = b.bucket
  GROUP BY b.doc_id
)
SELECT s.doc_id, f.source, f.lang, s.n_bigrams, s.weight
FROM scored s JOIN ftk f ON f.doc_id = s.doc_id
ORDER BY s.weight DESC, s.doc_id
LIMIT {_DSIR_TOPK}
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(
            "dsir_importance_select",
            q_dsir_importance_select,
            ORACLE_DSIR,
            "DSIR importance selection: hashed-bigram target/raw "
            "likelihood-ratio weights (integer bit surrogate), top-k",
        ),
        QuerySpec(
            "lm_surprisal_filter",
            q_lm_surprisal_filter,
            ORACLE_LM_SURPRISAL,
            "CCNet-style LM quality gate: corpus-trained add-one bigram "
            "model, integer bit-surprisal score, keep-below-corpus-mean",
        ),
        QuerySpec(
            "doremi_domain_weights",
            q_doremi_domain_weights,
            ORACLE_DOREMI,
            "DoReMi-style loss-driven domain reweighting: excess "
            "millibits-per-bigram per source, integer basis-point mix",
        ),
        QuerySpec(
            "rrf_hybrid_search",
            q_rrf_hybrid_search,
            ORACLE_RRF_HYBRID,
            "reciprocal-rank-fusion hybrid retrieval: BM25 + TF-IDF "
            "rankings fused on rank positions (k=60)",
        ),
        QuerySpec(
            "quality_consensus_report",
            q_quality_consensus_report,
            ORACLE_QUALITY_CONSENSUS,
            "three-tier quality vote (rules/classifier/LM): per-source "
            "histogram + majority-consensus keep counts",
        ),
        QuerySpec(
            "exact_ngram_decontaminate",
            q_exact_ngram_decontaminate,
            ORACLE_EXACT_NGRAM_DECON,
            "exact 8-gram train/eval contamination, broadcast eval grams",
        ),
        QuerySpec(
            "pii_redaction",
            q_pii_redaction,
            ORACLE_PII_REDACTION,
            "regex PII scrub with per-doc counts + scrubbed-content hash",
        ),
        QuerySpec(
            "source_quota_sample",
            q_source_quota_sample,
            ORACLE_SOURCE_QUOTA,
            "per-source top-K document quota (domain balancing)",
        ),
        QuerySpec(
            "zipf_top_terms",
            q_zipf_top_terms,
            ORACLE_ZIPF_TOP_TERMS,
            "corpus term-frequency top-K with cumulative share",
        ),
        QuerySpec(
            "freq_items_audit",
            q_freq_items_audit,
            ORACLE_FREQ_ITEMS_AUDIT,
            "Misra-Gries heavy-hitters sketch audit: containment of all "
            "true >1% terms pinned under the hash",
        ),
        QuerySpec(
            "tfidf_top_terms",
            q_tfidf_top_terms,
            ORACLE_TFIDF_TOP_TERMS,
            "per-doc top-3 TF-IDF terms, broadcast df table",
        ),
        QuerySpec(
            "bm25_search",
            q_bm25_search,
            ORACLE_BM25,
            "BM25 top-5 docs per keyword query, broadcast query/df tables",
        ),
        QuerySpec(
            "term_pmi_cooccurrence",
            q_term_pmi_cooccurrence,
            ORACLE_TERM_PMI,
            "PMI word association over the top-30-df vocabulary, top-50 pairs",
        ),
        QuerySpec(
            "corpus_filter_chain",
            q_corpus_filter_chain,
            ORACLE_FILTER_CHAIN,
            "first-match-wins rule filter with per-source accounting",
        ),
        QuerySpec(
            "boilerplate_dedup",
            q_boilerplate_dedup,
            ORACLE_BOILERPLATE,
            "corpus-wide repeated-block removal (paragraph-dedup step)",
        ),
        QuerySpec(
            "bpe_merge_candidates",
            q_bpe_merge_candidates,
            ORACLE_BPE_MERGE,
            "BPE merge-pair counting over the word-frequency table",
        ),
        QuerySpec(
            "url_domain_filter",
            q_url_domain_filter,
            ORACLE_URL_DOMAIN_FILTER,
            "regex domain extraction + blocklist accounting (C4-style)",
        ),
        QuerySpec(
            "html_text_extract",
            q_html_text_extract,
            ORACLE_HTML_TEXT_EXTRACT,
            "HTML -> text extraction (script-drop, tag-strip, collapse)",
        ),
        QuerySpec(
            "url_canonical_dedup",
            q_url_canonical_dedup,
            ORACLE_URL_CANONICAL_DEDUP,
            "URL canonicalization (case/port/utm/fragment/slash) + keep-one dedup",
        ),
        QuerySpec(
            "intra_doc_dedup",
            q_intra_doc_dedup,
            ORACLE_INTRA_DOC_DEDUP,
            "within-document repeated-block removal (keep-first), per-doc hash",
        ),
        QuerySpec(
            "quality_classifier_filter",
            q_quality_classifier_filter,
            ORACLE_QUALITY_CLASSIFIER,
            "hashing-trick linear quality classifier (model-based filter)",
        ),
        QuerySpec(
            "bpe_apply_compression",
            q_bpe_apply_compression,
            ORACLE_BPE_APPLY,
            "BPE encode: top-8 merges derived and applied engine-side, "
            "per-source symbol compression",
        ),
    ]


# --- BPE apply (the tokenizer's encode stage) ----------------------------------

# top-R merges applied; rank r's merged symbol is the single private-use
# char _BPE_PLACE[r-1], so later merges can never span a merged boundary
_BPE_R = 8
_BPE_PLACE = [chr(0xE000 + i) for i in range(1, _BPE_R + 1)]
_BPE_SEP = chr(0xE0FF)  # oracle-side (pair, sub) delimiter, not in any corpus
# any word containing a reserved private-use code point is excluded
# from the BPE vocabulary (it would collide with the merged-symbol
# placeholders and silently corrupt segmentation)
_BPE_RESERVED_RE = f"[{chr(0xE000)}-{chr(0xE0FF)}]"


def q_bpe_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE at corpus scale -- the other half of
    ``bpe_merge_candidates`` (train): derive the top-8 character-pair
    merges from corpus word frequencies, then apply them to every
    token in priority order (leftmost non-overlapping, each merged
    pair becoming ONE atomic symbol, so a later merge can never span a
    merged boundary) and account the per-source symbol compression --
    exactly what a tokenizer's encode pass does to 100 TB of text
    before packing.

    Fidelity note: merge derivation is SINGLE-PASS (the top-8 pairs
    come from the initial pair counts in one shot; canonical BPE
    training recounts pairs after each merge, so the ranked list can
    differ from a real tokenizer's) -- only the APPLY/ENCODE
    semantics are certified here.  Precondition: the merge fold
    reserves Unicode private-use code points U+E000..U+E0FF as atomic
    merged symbols; corpus words containing them are excluded from
    the vocabulary on BOTH engines (guard below) so a hostile
    document can never corrupt segmentation or symbol accounting.

    Engine-side dynamism, no driver collect: the ranked merge table
    aggregates to a single array-of-structs row, cross-joins onto the
    vocabulary, and ``F.aggregate`` folds the replace chain per word
    (rank r's replacement is a reserved private-use char, the atomic
    symbol).  DuckDB replays the fold with ``list_reduce`` over the
    word prepended to the same delimiter-encoded merge list -- both
    engines' ``replace`` is the same leftmost non-overlapping scan
    ('aaa' under merge 'aa' -> 2 symbols, pinned in tests.

    Scale shape: the corpus collapses to the word-frequency VOCABULARY
    first (one slim shuffle; vocabulary grows ~log corpus), pair
    mining and the merge fold run over the vocabulary only, and the
    per-source rollup joins tokens to the BROADCAST segmented
    vocabulary -- 100 TB of raw text is touched exactly twice (token
    explode, rollup join), never by the string rewriting."""
    from ..functions.text import clean_tokens

    t = load_tables(spark, sf_dir, ["documents"])
    # the canonical shared token contract (functions/text.clean_tokens)
    # -- the encode stage must tokenize exactly like the gram family
    toks = t["documents"].select(
        "source", F.explode(clean_tokens(F.col("text"))).alias("w")
    )
    # the vocabulary feeds BOTH the merge derivation and the
    # segmentation fold: checkpoint so the corpus-wide token rollup
    # runs once (the kmeans/PQ lazy-localCheckpoint pattern), keeping
    # the raw text at exactly two scans (vocab build + rollup join)
    # reserved-codepoint guard (see docstring precondition): vocabulary
    # excludes words that collide with the merged-symbol placeholders;
    # the inner rollup join then drops their occurrences on both engines
    vocab = (
        toks.filter(~F.col("w").rlike(_BPE_RESERVED_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .localCheckpoint(eager=False)
    )
    pairs = vocab.filter(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    cand = (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(_BPE_R)
    )
    ranked = cand.select(
        "pair",
        F.row_number().over(Window.orderBy(F.desc("n_occ"), "pair")).alias("rk"),
    )
    place = F.array(*[F.lit(c) for c in _BPE_PLACE])
    merges = ranked.agg(
        F.sort_array(
            F.collect_list(
                F.struct("rk", "pair", F.element_at(place, F.col("rk")).alias("sub"))
            )
        ).alias("ms")
    )
    seg = vocab.crossJoin(F.broadcast(merges)).select(
        "w",
        F.aggregate(
            "ms", F.col("w"), lambda acc, m: F.replace(acc, m["pair"], m["sub"])
        ).alias("seg"),
    )
    return (
        toks.join(F.broadcast(seg), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("symbols_before"),
            F.sum(F.length("seg")).cast("bigint").alias("symbols_after"),
            F.round(
                F.sum(F.length("seg")) / F.sum(F.length("w")), 4
            ).alias("compression_ratio"),
        )
        .orderBy("source")
    )


_BPE_PL_SQL = "[" + ", ".join(f"'{c}'" for c in _BPE_PLACE) + "]"

ORACLE_BPE_APPLY = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
vocab AS (
  SELECT w, count(*) AS wc FROM toks
  WHERE NOT regexp_matches(w, '{_BPE_RESERVED_RE}')
  GROUP BY w
),
positions AS (
  SELECT w, wc, unnest(range(1, CAST(length(w) AS BIGINT))) AS i
  FROM vocab WHERE length(w) >= 2
),
cand AS (
  SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, CAST(sum(wc) AS BIGINT) AS n_occ
  FROM positions GROUP BY pair
  ORDER BY n_occ DESC, pair LIMIT {_BPE_R}
),
ranked AS (
  SELECT pair, row_number() OVER (ORDER BY n_occ DESC, pair) AS rk FROM cand
),
merges AS (
  SELECT list(pair || '{_BPE_SEP}' || ({_BPE_PL_SQL})[rk] ORDER BY rk) AS ml
  FROM ranked
),
seg AS (
  SELECT w, list_reduce(
           list_prepend(w, ml),
           (acc, x) -> replace(acc, split_part(x, '{_BPE_SEP}', 1),
                               split_part(x, '{_BPE_SEP}', 2))
         ) AS seg
  FROM vocab, merges
)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(length(t.w)) AS BIGINT) AS symbols_before,
       CAST(sum(length(s.seg)) AS BIGINT) AS symbols_after,
       round(CAST(sum(length(s.seg)) AS DOUBLE) / sum(length(t.w)), 4)
         AS compression_ratio
FROM toks t JOIN seg s ON s.w = t.w
GROUP BY t.source
ORDER BY t.source
"""

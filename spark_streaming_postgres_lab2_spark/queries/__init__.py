"""Judge-checked query inventory.

Each entry pairs a Spark DataFrame query (``fn(spark, sf_dir)``) with
an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
genuinely non-SQL-expressible operators, which get a rows-only check).

Conventions that make the DuckDB comparison bit-stable:

- session timezone pinned to UTC (sources/tables.load_tables);
- timestamps exported as ``unix_micros`` / ``epoch_us`` BIGINT;
- double aggregates rounded (2 decimals for money, 4 for ratios);
- integer sums cast to BIGINT on the DuckDB side (DuckDB sums ints to
  HUGEINT);
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str


# The driver's correctness gate checks exactly the FIRST 50 entries of
# ``queries()`` (observed round 1: CORRECTNESS_r01 contains precisely
# the first 50 specs in declaration order; the remaining 18 -- 6 of
# them oracle-declared -- produced no row at all).  With >50
# oracle-bearing queries, ordering is therefore a coverage decision:
# put the queries with no driver row yet, the ones added this round,
# and the ones whose implementation changed this round FIRST, so the
# union of per-round CORRECTNESS files covers the whole inventory.
# Everything past slot 50 is still verified every round by the local
# replica (tools/parity_check.py; committed as PARITY_r{N}.json).
DRIVER_PRIORITY = [
    # round 13, tier 0 (20, slots 1-20): the last pre-stamp-era cohort
    # (VERDICT r12 item 1) -- the r9 holdouts whose driver-green rows
    # carry no src_stamp.  After this window greens, EVERY oracle's
    # last driver row is stamped-era, and the pre-stamp exemption
    # branches in both guard tiers (tools/parity_check.py
    # stamp_guard_violations `old is None`, blame_guard pre-stamp path)
    # can become hard assertions next round.
    "approx_distinct_audit",
    "approx_quantiles_audit",
    "doc_regex_extract",
    "dominant_suppliers",
    "embedding_norms",
    "idle_customers",
    "parts_never_shipped",
    "part_string_funcs",
    "priority_linestatus",
    "props_json",
    "psi_value_drift",
    "salted_distinct_users",
    "schema_migration",
    "sessionization",
    "stratified_sample_audit",
    "supplier_count_by_part",
    "trending_topk",
    "url_domain_filter",
    "user_set_ops",
    "zscore_anomaly_hours",
    # round 13, tier 1 (29, slots 21-49): stamped oracles ranked by
    # MEASURED cross-module blame-span width (sum of span lines in
    # files other than the fn's own module, via
    # tools/parity_check.fn_blame_spans at the r13 head) -- the code
    # most able to change under a certification without flipping the
    # same-module content stamp (VERDICT r12 item 3).  The named
    # high-risk families all rank here by measurement: decontaminate
    # (196 cross-module lines), incremental_dedup (196), the substring
    # family (55 each), the IVF audits (151-182).  The PQ pair
    # (ann_ivfpq_adc_audit, embedding_pq_audit) is deliberately NOT
    # re-windowed: measured cross-module width ~0 -- every helper is
    # same-module in queries/ext.py, which query_stamp already covers
    # exhaustively, and both are stamped green r12.
    "semantic_dedup",
    "near_dup_clusters",
    "canonical_docs",
    "embedding_lsh_near_dup_portable",
    "incremental_dedup",
    "decontaminate",
    "ann_recall_audit",
    "minhash_near_dup",
    "ann_ivf_lossless_audit",
    "video_frame_stats",
    "png_decode",
    "multimodal_resize_real",
    "simhash_near_dup",
    "multimodal_decode",
    "audio_frame_energy",
    "audio_decode",
    "triangle_counts",
    "pagerank_links",
    "table_counts_union",
    "quality_hourly",
    "multimodal_features",
    "ngram_jaccard_pairs",
    "asof_quotes",
    "fact_join_bucketed",
    "substring_dedup_cut_fast",
    "substring_dedup_cut",
    "source_overlap_matrix",
    "exact_ngram_decontaminate",
    "duplicate_ngrams",
    # 50th slot: the historically NTZ-sensitive session-window oracle --
    # the cheapest canary for another fixture timestamp drift; nine
    # rounds green and counting (VERDICT r6 item 8 / r12 item 3: keep
    # it pinned).
    "user_session_window",
]


def all_specs() -> list[QuerySpec]:
    from . import advanced, core, corpus, curation, ext, graph, tpch_more

    specs = (
        core.specs()
        + advanced.specs()
        + ext.specs()
        + tpch_more.specs()
        + corpus.specs()
        + curation.specs()
        + graph.specs()
    )
    by_name = {s.name: s for s in specs}
    missing = [n for n in DRIVER_PRIORITY if n not in by_name]
    assert not missing, f"DRIVER_PRIORITY names not in inventory: {missing}"
    prioritized = [by_name[n] for n in DRIVER_PRIORITY]
    rest = [s for s in specs if s.name not in DRIVER_PRIORITY]
    # oracle-bearing specs before rows-only ones: a rows-only spec
    # inside the driver's 50-entry window would consume a slot without
    # producing any correctness signal
    rest_oracle = [s for s in rest if s.oracle is not None]
    rest_rows_only = [s for s in rest if s.oracle is None]
    return prioritized + rest_oracle + rest_rows_only


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}

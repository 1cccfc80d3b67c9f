"""Empty-input robustness: every operator must degrade gracefully on
zero-row tables -- at 100 TB an empty slice (a new tenant, a filtered
partition, a fresh day) is routine, and an operator that crashes on it
takes the pipeline down.  Summary-row operators emit their zero-count
row; per-entity operators emit nothing; nothing throws."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from spark_streaming_postgres_lab2_spark.queries import all_specs

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# representative slice: one per family added in r5 + classic shapes
_PROBE = [
    "pagerank_links", "triangle_counts", "bm25_search",
    "sorted_neighborhood_dedup", "zscore_anomaly_hours",
    "session_path_mining", "term_pmi_cooccurrence",
    "fuzzy_record_linkage", "scd2_priority_dim", "table_profile_events",
    "iqr_outlier_summary", "ab_test_conversion", "forecast_baseline",
    "market_basket", "gdpr_erasure_audit", "winsorized_value_stats",
    "approx_quantiles_audit", "tpch_q1", "funnel_conversion",
    "cohort_retention",
    # round-9 additions: all nine must survive the empty slice
    "duplicate_ngrams", "source_overlap_matrix", "shard_manifest",
    "substring_dedup_cut", "embedding_pq_audit", "ann_ivfpq_adc_audit",
    "bpe_apply_compression", "psi_value_drift", "train_eval_split",
    # round-10 addition: the capped cut flavor
    "substring_dedup_cut_fast",
    # round-11: the r11 full-inventory empty sweep caught the IVF
    # family crashing in kmeans_lite seeding (np.array([]) reaching
    # the axis-1 norm) -- pin the whole family
    "ann_ivf_topk", "ann_ivf_topk_quantized",
    "ann_ivf_lossless_audit", "ann_recall_audit",
    "kmeans_cluster_profile",
]

# operators whose output is a fixed summary frame even with no input
_SUMMARY_ROWS = {
    "table_profile_events": 6,   # one row per profiled column
    "gdpr_erasure_audit": 3,     # one row per cascade table
    "ab_test_conversion": 1,     # the single test-summary row
    "funnel_conversion": 1,      # the single funnel row
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    src = "/root/testdata/sf0.001"
    for t in _TABLES:
        pq.write_table(
            pq.read_table(os.path.join(src, f"{t}.parquet")).slice(0, 0),
            d / f"{t}.parquet",
        )
    return str(d)


@pytest.mark.parametrize("name", _PROBE)
def test_operator_survives_empty_tables(spark, empty_sf_dir, name):
    spec = {s.name: s for s in all_specs()}[name]
    rows = spec.fn(spark, empty_sf_dir).collect()
    assert len(rows) == _SUMMARY_ROWS.get(name, 0)


DEEP = os.environ.get("SPARK_GRAFT_DEEP_FUZZ") == "1"


@pytest.mark.skipif(not DEEP, reason="full sweep is opt-in: SPARK_GRAFT_DEEP_FUZZ=1")
def test_every_inventory_query_survives_the_empty_slice(spark, empty_sf_dir):
    """Opt-in full-inventory sweep (the probe above is the fast tier):
    EVERY queries() entry must execute on the all-empty fixture.  The
    r11 run of exactly this sweep caught the IVF family crashing in
    kmeans_lite seeding -- a class the representative probe missed
    because the probe predates those operators' family."""
    fails = []
    for s in all_specs():
        try:
            s.fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001
            fails.append(f"{s.name}: {str(e).splitlines()[0][:120]}")
    assert not fails, f"{len(fails)} operators died on the empty slice: {fails}"

"""Opt-in deep-fuzz tier (set SPARK_GRAFT_DEEP_FUZZ=1): the same
spec-mirror equivalences as tests/test_properties.py -- via the SHARED
mirrors in tests/mirrors.py, so the two tiers cannot silently diverge
-- but with an order-of-magnitude larger randomized input budget.  Ran
green in r5 (480 adversarial docs x 3 curation operators; 6 graph
trials x ~225 edges for CC driver/distributed parity); kept env-gated
so the default suite stays fast."""

from __future__ import annotations

import os
import random

import pytest

from mirrors import py_boilerplate, py_filter_reason, py_pii

DEEP = os.environ.get("SPARK_GRAFT_DEEP_FUZZ") == "1"
pytestmark = pytest.mark.skipif(
    not DEEP, reason="deep fuzz is opt-in: SPARK_GRAFT_DEEP_FUZZ=1"
)


def test_curation_mirrors_deep(spark):
    from pyspark.sql import functions as F

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        boilerplate_doc_stats,
        filter_chain_classify,
        pii_redact_cols,
    )

    rng = random.Random(20260814)
    vocab = [
        "alpha", "beta", "slow", "dup", "x", "héllo", "日本", "a1", "",
        "b@c.com", "1.2.3.4", "555-0001", "9.9.9.9@z.net", "☃", "\t", "a" * 50,
    ]

    def rand_text() -> str:
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 140)))

    for trial in range(12):
        docs = list(enumerate(rand_text() for _ in range(40)))
        df = spark.createDataFrame(
            [(i, "s", t) for i, t in docs], "doc_id int, source string, text string"
        )
        got = {
            r["doc_id"]: r["reason"]
            for r in filter_chain_classify(df).select("doc_id", "reason").collect()
        }
        assert got == {i: py_filter_reason(t) for i, t in docs}, f"filter trial {trial}"
        gb = {
            r["doc_id"]: (r["n_blocks"], r["n_boilerplate"], r["kept_hash"])
            for r in boilerplate_doc_stats(df).collect()
        }
        assert gb == py_boilerplate(docs), f"boiler trial {trial}"
        cols = pii_redact_cols(F.col("text"))
        rows = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id",
                cols["n_emails"].alias("e"),
                cols["n_ips"].alias("i"),
                cols["n_phones"].alias("p"),
                cols["clean"].alias("c"),
            ).collect()
        }
        for i, t in docs:
            r = rows[i]
            assert (r["e"], r["i"], r["p"], r["c"]) == py_pii(t), (
                f"pii trial {trial} doc {i}"
            )


def test_connected_components_paths_deep(spark):
    from spark_streaming_postgres_lab2_spark.functions.similarity import (
        connected_components,
    )

    rng = random.Random(99)
    for trial in range(6):
        n = 300
        edges = [(i, i + 1) for i in range(0, 80)]  # diameter stress
        edges += [(rng.randrange(n),) * 2 for _ in range(10)]  # self loops
        edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
        edges += [(200 + i, 200 + (i + 1) % 15) for i in range(15)]  # ring
        df = spark.createDataFrame(edges, "doc_id_1 long, doc_id_2 long")
        driver = {
            r["doc_id"]: r["component"] for r in connected_components(df).collect()
        }
        dist = {
            r["doc_id"]: r["component"]
            for r in connected_components(df, driver_threshold=0).collect()
        }
        assert driver == dist, f"trial {trial}"

"""Opt-in deep-fuzz tier (set SPARK_GRAFT_DEEP_FUZZ=1): the same
spec-mirror equivalences as tests/test_properties.py, but with an
order-of-magnitude larger randomized input budget.  Ran green in r5
(480 adversarial docs x 3 curation operators; 6 graph trials x ~225
edges for CC driver/distributed parity); kept env-gated so the default
suite stays fast."""

from __future__ import annotations

import hashlib
import os
import random
import re

import pytest

DEEP = os.environ.get("SPARK_GRAFT_DEEP_FUZZ") == "1"
pytestmark = pytest.mark.skipif(
    not DEEP, reason="deep fuzz is opt-in: SPARK_GRAFT_DEEP_FUZZ=1"
)


def _py_tokens(t: str) -> list[str]:
    return [x for x in t.split(" ") if x != ""]


def test_curation_mirrors_deep(spark):
    from pyspark.sql import functions as F

    from spark_streaming_postgres_lab2_spark.queries.curation import (
        _BAD_TERM_LIMIT,
        _BAD_TERMS,
        _BLOCK_N,
        _MAX_TOKENS,
        _MIN_DIVERSITY,
        _MIN_TOKENS,
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
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

    def py_reason(t: str) -> str:
        toks = _py_tokens(t)
        n, u = len(toks), len(set(toks))
        bad = sum(1 for x in toks if x in _BAD_TERMS)
        if n < _MIN_TOKENS:
            return "too_short"
        if n > _MAX_TOKENS:
            return "too_long"
        if u / n < _MIN_DIVERSITY:
            return "low_diversity"
        if bad >= _BAD_TERM_LIMIT:
            return "policy_terms"
        return "keep"

    def py_boiler(docs):
        per = {}
        for did, t in docs:
            toks = _py_tokens(t)
            per[did] = [
                hashlib.md5(
                    " ".join(toks[i * _BLOCK_N : (i + 1) * _BLOCK_N]).encode()
                ).hexdigest()
                for i in range(len(toks) // _BLOCK_N)
            ]
        seen: dict[str, set] = {}
        for did, bhs in per.items():
            for bh in set(bhs):
                seen.setdefault(bh, set()).add(did)
        boiler = {bh for bh, ds in seen.items() if len(ds) >= 2}
        out = {}
        for did, bhs in per.items():
            if not bhs:
                continue
            kept = [bh for bh in bhs if bh not in boiler]
            out[did] = (
                len(bhs),
                sum(1 for bh in bhs if bh in boiler),
                hashlib.md5("|".join(kept).encode()).hexdigest(),
            )
        return out

    for trial in range(12):
        docs = list(enumerate(rand_text() for _ in range(40)))
        df = spark.createDataFrame(
            [(i, "s", t) for i, t in docs], "doc_id int, source string, text string"
        )
        got = {
            r["doc_id"]: r["reason"]
            for r in filter_chain_classify(df).select("doc_id", "reason").collect()
        }
        assert got == {i: py_reason(t) for i, t in docs}, f"filter trial {trial}"
        gb = {
            r["doc_id"]: (r["n_blocks"], r["n_boilerplate"], r["kept_hash"])
            for r in boilerplate_doc_stats(df).collect()
        }
        assert gb == py_boiler(docs), f"boiler trial {trial}"
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
            exp = (
                sum(1 for _ in re.finditer(_PII_EMAIL, t)),
                sum(1 for _ in re.finditer(_PII_IP, t)),
                sum(1 for _ in re.finditer(_PII_PHONE, t)),
                re.sub(
                    _PII_PHONE,
                    "[PHONE]",
                    re.sub(_PII_IP, "[IP]", re.sub(_PII_EMAIL, "[EMAIL]", t)),
                ),
            )
            r = rows[i]
            assert (r["e"], r["i"], r["p"], r["c"]) == exp, f"pii trial {trial} doc {i}"


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

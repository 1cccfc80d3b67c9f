"""Pure-Python spec mirrors shared by test_properties.py (hypothesis
tier) and test_deep_fuzz.py (opt-in deep tier): one copy, constants
imported from the operators under test, so a spec change cannot
silently diverge the two tiers (r5 review finding)."""

from __future__ import annotations

import hashlib
import re

from spark_streaming_postgres_lab2_spark.queries.curation import (
    _BAD_TERM_LIMIT,
    _BAD_TERMS,
    _BLOCK_N,
    _BOILERPLATE_MIN_DOCS,
    _MAX_TOKENS,
    _MIN_DIVERSITY,
    _MIN_TOKENS,
    _PII_EMAIL,
    _PII_IP,
    _PII_PHONE,
)


def py_tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def py_filter_reason(text: str) -> str:
    """Mirror of queries.curation.filter_chain_classify."""
    toks = py_tokens(text)
    n, u = len(toks), len(set(toks))
    bad = sum(1 for t in toks if t in _BAD_TERMS)
    if n < _MIN_TOKENS:
        return "too_short"
    if n > _MAX_TOKENS:
        return "too_long"
    if u / n < _MIN_DIVERSITY:
        return "low_diversity"
    if bad >= _BAD_TERM_LIMIT:
        return "policy_terms"
    return "keep"


def py_boilerplate(docs: list[tuple[int, str]]) -> dict:
    """Mirror of queries.curation.boilerplate_doc_stats over (id, text)
    pairs: {doc_id: (n_blocks, n_boilerplate, kept_hash)}; block-less
    docs absent."""
    per_doc: dict[int, list[str]] = {}
    for did, text in docs:
        toks = py_tokens(text)
        per_doc[did] = [
            hashlib.md5(
                " ".join(toks[i * _BLOCK_N : (i + 1) * _BLOCK_N]).encode("utf-8")
            ).hexdigest()
            for i in range(len(toks) // _BLOCK_N)
        ]
    seen: dict[str, set[int]] = {}
    for did, bhs in per_doc.items():
        for bh in set(bhs):
            seen.setdefault(bh, set()).add(did)
    boiler = {bh for bh, ds in seen.items() if len(ds) >= _BOILERPLATE_MIN_DOCS}
    out = {}
    for did, bhs in per_doc.items():
        if not bhs:
            continue
        kept = [bh for bh in bhs if bh not in boiler]
        out[did] = (
            len(bhs),
            sum(1 for bh in bhs if bh in boiler),
            hashlib.md5("|".join(kept).encode("utf-8")).hexdigest(),
        )
    return out


def py_pii(text: str) -> tuple[int, int, int, str]:
    """Mirror of queries.curation.pii_redact_cols: per-category match
    counts on the RAW text (the implementation's and the DuckDB
    oracle's spec) + the sequentially redacted text."""
    n_e = sum(1 for _ in re.finditer(_PII_EMAIL, text))
    n_i = sum(1 for _ in re.finditer(_PII_IP, text))
    n_p = sum(1 for _ in re.finditer(_PII_PHONE, text))
    clean = re.sub(_PII_EMAIL, "[EMAIL]", text)
    clean = re.sub(_PII_IP, "[IP]", clean)
    clean = re.sub(_PII_PHONE, "[PHONE]", clean)
    return n_e, n_i, n_p, clean


def py_canonical_url(url: str) -> str:
    """Pure-Python mirror of queries.curation.canonicalize_url (same
    rule chain, same order).  Inputs are newline-free URL-alphabet
    strings -- the property strategy guarantees that, keeping Java and
    Python regex '.'/'$' semantics identical."""
    import re

    u = re.sub(r"#.*$", "", url)
    u = u.lower()
    u = re.sub(r"[?&]utm_[a-z]+=[^&#]*", "", u)
    u = re.sub(r"^([^?&]*)&", r"\1?", u, count=1)
    u = re.sub(r"^(https://[^/?#]+):443([/?#]|$)", r"\1\2", u, count=1)
    return re.sub(r"/$", "", u)

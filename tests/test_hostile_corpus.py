"""Opt-in hostile-corpus tier (SPARK_GRAFT_DEEP_FUZZ=1): every
document-consuming ORACLE query must not only survive pathological
text -- it must still HASH-MATCH DuckDB on it.

The r11 sweep of exactly this check ran green across the whole
inventory (and the no-crash half ran green over empty/one-row/
null-column fixtures too), but the class has bitten before: the r10
BPE reserved-codepoint guard exists because a document containing
U+E000..U+E0FF corrupted segmentation accounting.  Pathologies
covered: empty/whitespace-only text, a 20k-char single token, 15k
tiny tokens, control whitespace, an embedded NUL byte, the private-use
reserved range, astral-plane runs, combining marks, mixed scripts,
format-string look-alikes, space runs (empty tokens), and CSV/quote
delimiter soup.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from parity_check import canon, register_fixture_views  # noqa: E402

from spark_streaming_postgres_lab2_spark.queries import all_specs  # noqa: E402

DEEP = os.environ.get("SPARK_GRAFT_DEEP_FUZZ") == "1"
pytestmark = pytest.mark.skipif(
    not DEEP, reason="hostile-corpus tier is opt-in: SPARK_GRAFT_DEEP_FUZZ=1"
)

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

HOSTILE_TEXTS = [
    "",
    " ",
    "      ",
    "x" * 20000,
    ("ab " * 5000).strip(),
    "\t\n\r",
    "a\x00b nul byte",
    " private use",
    "\U0001f600" * 300,
    "á" * 200 + " combining",
    "ٱلعربية 中文 русский",
    "%s %d {0} $1 \\x41",
    "a  b   c    d",
    "\"quoted,csv|delims'",
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_hostile")
    src = "/root/testdata/sf0.001"
    for t in _TABLES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if t == "documents":
            texts = tb.column("text").to_pylist()
            for i, h in enumerate(HOSTILE_TEXTS):
                texts[i % tb.num_rows] = h
            cols = {
                name: (pa.array(texts, type=pa.string()) if name == "text"
                       else tb.column(name))
                for name in tb.column_names
            }
            if "n_chars" in tb.column_names:
                cols["n_chars"] = pa.array(
                    [len(x) for x in texts], type=tb.schema.field("n_chars").type
                )
            tb = pa.table(cols, schema=tb.schema)
        pq.write_table(tb, str(d / f"{t}.parquet"))
    return str(d)


def _doc_oracle_specs():
    return [
        s for s in all_specs()
        if s.oracle is not None and "documents" in s.oracle
    ]


def test_document_oracles_hash_match_on_hostile_corpus(spark, hostile_sf_dir):
    import duckdb

    con = duckdb.connect()
    register_fixture_views(con, hostile_sf_dir)
    fails = []
    for s in _doc_oracle_specs():
        try:
            sdf = s.fn(spark, hostile_sf_dir)
            srows, scols = sdf.collect(), sdf.columns
            rel = con.sql(s.oracle)
            drows, dcols = rel.fetchall(), rel.columns
        except Exception as e:  # noqa: BLE001
            fails.append(f"{s.name}: {str(e).splitlines()[0][:120]}")
            continue
        if len(srows) != len(drows):
            fails.append(f"{s.name}: rowcount {len(srows)} vs {len(drows)}")
        elif canon(srows, scols) != canon(drows, dcols):
            fails.append(f"{s.name}: values diverge on hostile text")
    assert not fails, (
        f"{len(fails)} document oracles broke on the hostile corpus: {fails}"
    )

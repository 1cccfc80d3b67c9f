"""Structural freshness guard (VERDICT r6 item 6): an operator may
only merge together with its parity row.  Round 6 landed 8 operators
after PARITY_r06.json was generated, leaving them with no committed
correctness evidence; this test makes that divergence a red suite.

Workflow: after adding an operator, run
``PARITY_JSON=PARITY_r{N}.json python tools/parity_check.py
/root/testdata/sf0.01 <new names>`` -- subset runs now MERGE into the
existing artifact, so the row lands without re-running the inventory.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _latest_parity() -> tuple[Path, dict]:
    files = sorted(
        REPO.glob("PARITY_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert files, "no PARITY_r*.json artifact committed at all"
    p = files[-1]
    return p, json.loads(p.read_text())


def test_every_query_has_a_parity_row():
    import __spark_entry__ as entrymod

    path, parity = _latest_parity()
    inventory = set(entrymod.queries())
    missing = sorted(inventory - set(parity))
    assert not missing, (
        f"{len(missing)} queries() entries have no row in {path.name} -- "
        f"regenerate/merge the parity artifact before merging: {missing}"
    )


def test_no_parity_row_is_failing():
    path, parity = _latest_parity()
    bad = sorted(n for n, r in parity.items() if r.get("status") == "FAIL")
    assert not bad, f"failing rows in {path.name}: {bad}"


def test_oracle_queries_are_hash_checked_in_parity():
    """Every oracle-bearing query must have a PASS (hash-checked) row,
    not just a rows_only one -- a silent oracle drop would otherwise
    downgrade the evidence class without failing anything."""
    import __spark_entry__ as entrymod

    path, parity = _latest_parity()
    oracles = set(entrymod.oracle_sql())
    downgraded = sorted(
        n for n in oracles
        if n in parity and parity[n].get("status") == "rows_only"
    )
    assert not downgraded, (
        f"oracle-bearing queries recorded rows-only in {path.name}: {downgraded}"
    )

"""Structural freshness guard (VERDICT r6 item 6): an operator may
only merge together with its parity row.  Round 6 landed 8 operators
after PARITY_r06.json was generated, leaving them with no committed
correctness evidence; this test makes that divergence a red suite.

Workflow: after adding an operator, iterate with plain
``python tools/parity_check.py /root/testdata/sf0.01 <new names>``
(no artifact write), COMMIT the operator, then run the same command
with ``PARITY_JSON=PARITY_r{N}.json`` set -- subset runs MERGE into
the existing artifact, so the row lands without re-running the
inventory, stamped with the clean commit that produced it -- and
commit the artifact immediately after.  Order matters: a merge run
from a dirty tree stamps ``<sha>-dirty`` and
test_parity_provenance_commits_are_ancestors_of_head rejects it.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


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


def test_parity_provenance_commits_are_ancestors_of_head():
    """Every provenance-stamped parity row must come from a commit that
    is an ancestor of HEAD and from a clean evidence-code state --
    otherwise a merged artifact could carry evidence produced by code
    that never landed (divergent branch or dirty worktree).  Rows
    without a ``commit`` key predate the stamping convention (r7 and
    earlier) and are exempt."""
    import shutil
    import subprocess

    import pytest

    if shutil.which("git") is None:
        pytest.skip("git unavailable -- provenance cannot be checked here")

    path, parity = _latest_parity()
    stamped = {
        r["commit"] for r in parity.values()
        if isinstance(r, dict) and r.get("commit") not in (None, "unknown")
    }
    dirty = sorted(c for c in stamped if c.endswith("-dirty"))
    assert not dirty, (
        f"{path.name} carries rows stamped from a dirty worktree: {dirty} -- "
        "commit the code first, then regenerate the evidence"
    )
    for c in sorted(stamped):
        full = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", f"{c}^{{commit}}"],
            capture_output=True, text=True,
        )
        assert full.returncode == 0, (
            f"{path.name} stamps commit {c} which does not exist in this repo"
        )
        anc = subprocess.run(
            ["git", "-C", str(REPO), "merge-base", "--is-ancestor",
             full.stdout.strip(), "HEAD"],
            capture_output=True, text=True,
        )
        assert anc.returncode == 0, (
            f"{path.name} stamps commit {c} which is not an ancestor of HEAD"
        )


def _driver_green_rounds() -> dict:
    """name -> latest round with a fully-green driver row
    (rows + schema + hash) across all committed CORRECTNESS files."""
    last: dict[str, int] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for name, row in json.loads(p.read_text()).items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _parity_stamps_by_round() -> dict:
    """round -> {name: src_stamp} for every committed parity artifact
    that carries content stamps (r11+)."""
    out: dict[int, dict] = {}
    for p in REPO.glob("PARITY_r*.json"):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        stamps = {
            name: row["src_stamp"]
            for name, row in json.loads(p.read_text()).items()
            if isinstance(row, dict) and "src_stamp" in row
        }
        if stamps:
            out[rnd] = stamps
    return out


def test_parity_rows_predate_their_rounds_driver_certification():
    """Closes the r11 review's stamp-refresh hole: a subset merge into
    a PAST round's parity artifact would overwrite the very src_stamp
    the changed-code guard compares against, silently re-certifying
    superseded code.  Structural rule: for every round where BOTH
    artifacts are committed, every parity row's stamped commit must be
    an ancestor of the commit that ADDED that round's CORRECTNESS
    artifact -- local evidence must predate the driver certification
    it later vouches for.  New evidence belongs in the CURRENT round's
    artifact, never merged backwards."""
    import shutil
    import subprocess

    import pytest

    if shutil.which("git") is None:
        pytest.skip("git unavailable -- provenance cannot be checked here")

    def rounds(pattern: str) -> dict:
        return {
            int(re.search(r"r(\d+)", p.name).group(1)): p
            for p in REPO.glob(pattern)
        }

    parity_rounds = rounds("PARITY_r*.json")
    corr_rounds = rounds("CORRECTNESS_r*.json")
    violations = []
    for rnd in sorted(set(parity_rounds) & set(corr_rounds)):
        add = subprocess.run(
            ["git", "-C", str(REPO), "log", "--diff-filter=A",
             "--format=%H", "--", corr_rounds[rnd].name],
            capture_output=True, text=True,
        ).stdout.split()
        if not add:
            continue  # driver artifact not committed yet (mid-round)
        stamped = {
            r["commit"].removesuffix("-dirty")
            for r in json.loads(parity_rounds[rnd].read_text()).values()
            if isinstance(r, dict) and r.get("commit") not in (None, "unknown")
        }
        for c in sorted(stamped):
            anc = subprocess.run(
                ["git", "-C", str(REPO), "merge-base", "--is-ancestor",
                 c, add[0]],
                capture_output=True, text=True,
            )
            if anc.returncode != 0:
                violations.append(
                    f"PARITY_r{rnd} row commit {c} postdates "
                    f"CORRECTNESS_r{rnd}'s add ({add[0][:12]})"
                )
    assert not violations, (
        "parity evidence merged backwards into an already-certified "
        f"round's artifact: {violations}"
    )


def test_changed_queries_are_reprioritized_into_driver_window():
    """VERDICT r10 item 2, made structural: if a query's content stamp
    (fn source + same-module helpers + oracle text) differs from the
    stamp at its last driver-green round, its green CORRECTNESS row
    certifies superseded code -- the query MUST sit in the current
    driver window (first 50 ``queries()`` entries) so the next driver
    run re-certifies it.  r7, r8, and r10 each shipped exactly this
    changed-but-not-re-checked state; this test makes it a red suite."""
    import __spark_entry__ as entrymod
    from parity_check import inventory_stamps, stamp_guard_violations

    window = set(list(entrymod.queries())[:50])
    violations = stamp_guard_violations(
        inventory_stamps(),
        window,
        _driver_green_rounds(),
        _parity_stamps_by_round(),
    )
    assert not violations, (
        "queries changed since their last driver-green round but NOT "
        "re-prioritized into the driver window (DRIVER_PRIORITY in "
        f"queries/__init__.py): {violations}"
    )


def test_stamp_guard_goes_red_on_edit_until_reprioritized(tmp_path):
    """Crafted end-to-end check of the guard mechanics (the VERDICT
    item's done-criterion): editing a query body -- including a
    same-module HELPER the query fn merely calls, the exact r10 miss
    -- changes the stamp and turns the guard red, and re-prioritizing
    the query into the driver window clears it."""
    import importlib.util

    from parity_check import query_stamp, stamp_guard_violations

    src_v1 = (
        "THRESHOLD = 3\n"
        "def _helper(x):\n"
        "    return x + THRESHOLD\n"
        "def q_demo(spark, sf_dir):\n"
        "    return _helper(1)\n"
    )

    def load(body: str, tag: str):
        p = tmp_path / f"demo_{tag}.py"
        p.write_text(body)
        spec = importlib.util.spec_from_file_location(f"demo_{tag}", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    oracle = "SELECT 1 AS x"
    s1 = query_stamp(load(src_v1, "v1").q_demo, oracle)
    # identical source in a different file => identical stamp
    assert query_stamp(load(src_v1, "v1b").q_demo, oracle) == s1
    # helper-body edit (fn source unchanged!) => stamp changes
    s2 = query_stamp(
        load(src_v1.replace("x + THRESHOLD", "x * THRESHOLD"), "v2").q_demo, oracle
    )
    assert s2 != s1
    # referenced scalar constant edit => stamp changes
    s3 = query_stamp(load(src_v1.replace("= 3", "= 4"), "v3").q_demo, oracle)
    assert s3 not in (s1, s2)
    # oracle text edit => stamp changes
    assert query_stamp(load(src_v1, "v4").q_demo, "SELECT 2 AS x") != s1

    last_green = {"demo": 10}
    stamps_at_green = {10: {"demo": s1}}
    # unchanged code: green regardless of window membership
    assert stamp_guard_violations({"demo": s1}, set(), last_green, stamps_at_green) == []
    # changed code outside the window: RED
    assert stamp_guard_violations(
        {"demo": s2}, set(), last_green, stamps_at_green
    ) == ["demo"]
    # re-prioritized into the window: clears
    assert stamp_guard_violations(
        {"demo": s2}, {"demo"}, last_green, stamps_at_green
    ) == []
    # pre-stamp-era evidence (no stamp at the green round): exempt
    assert stamp_guard_violations({"demo": s2}, set(), last_green, {}) == []


def test_driver_and_local_parity_agree_on_hash_status():
    """VERDICT r9 item 7: the compaction_plan r9 divergence (local
    PARITY said PASS, driver CORRECTNESS said hash-FAIL, because the
    local canon() stringified a HUGEINT away) must be a red test, not
    a judge finding.  For the latest round where BOTH artifacts exist,
    every query present in both must agree on hash status -- unless a
    LATER parity artifact re-verified it green at a commit that
    postdates a FIX: the exemption demands that evidence-producing
    code (the package, tools/, __spark_entry__.py) actually changed
    between the driver-red artifact landing and the parity row's
    stamped commit.  A newer-round PASS from an unchanged harness
    cannot be a fix and stays flagged (r10 review finding)."""
    import shutil
    import subprocess

    import pytest

    corr_files = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert corr_files, "no CORRECTNESS_r*.json artifact committed"
    corr_path = corr_files[-1]
    corr_round = int(re.search(r"r(\d+)", corr_path.name).group(1))
    corr = json.loads(corr_path.read_text())

    parity_path, parity = _latest_parity()
    parity_round = int(re.search(r"r(\d+)", parity_path.name).group(1))

    def evidence_changed_since_driver_red(parity_commit: str | None) -> bool:
        """True iff evidence-producing code differs between the commit
        that added the driver-red CORRECTNESS artifact and the commit
        that produced the parity row."""
        if shutil.which("git") is None:
            pytest.skip("git unavailable -- fix recency cannot be checked")
        if not parity_commit or parity_commit == "unknown":
            return False
        corr_add = subprocess.run(
            ["git", "-C", str(REPO), "log", "--diff-filter=A",
             "--format=%H", "--", corr_path.name],
            capture_output=True, text=True,
        ).stdout.split()
        if not corr_add:
            return True  # artifact uncommitted yet: mid-round state
        diff = subprocess.run(
            ["git", "-C", str(REPO), "diff", "--name-only",
             corr_add[0], parity_commit, "--",
             "spark_streaming_postgres_lab2_spark", "tools",
             "__spark_entry__.py"],
            capture_output=True, text=True,
        )
        return diff.returncode == 0 and bool(diff.stdout.strip())

    disagreements = []
    for name, drow in corr.items():
        prow = parity.get(name)
        if not isinstance(drow, dict) or not isinstance(prow, dict):
            continue
        driver_green = bool(drow.get("hash_match"))
        local_green = prow.get("status") == "PASS"
        if driver_green == local_green:
            continue
        # a newer parity artifact may legitimately re-verify a
        # driver-red query AFTER its fix landed; the reverse --
        # driver green, local FAIL -- is always a defect in one of
        # the two harnesses
        if (
            driver_green is False
            and parity_round > corr_round
            and evidence_changed_since_driver_red(prow.get("commit"))
        ):
            continue
        disagreements.append(
            f"{name}: driver({corr_path.name})="
            f"{'green' if driver_green else 'RED'} vs "
            f"local({parity_path.name})={prow.get('status')}"
        )
    assert not disagreements, (
        "driver and local parity disagree on hash status -- one harness "
        f"has a blind spot: {disagreements}"
    )

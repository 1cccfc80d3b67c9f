#!/bin/bash
# End-of-round evidence refresh (VERDICT r8 item 5: three consecutive
# rounds broke the artifact discipline by hand -- make it executable).
#
# Usage: tools/end_round.sh <round-number>        (e.g. tools/end_round.sh 9)
#
# Produces, at the CURRENT COMMIT (refuses a dirty evidence tree):
#   PYTEST_r{N}.txt        full suite output (aborts if red)
#   PARITY_r{N}.json       full-inventory oracle replica at sf0.01
#   PLANS_r{N}.txt         plan-quality report incl. executed-stage xstg
#   BENCH_r{N}_local.json  local bench at $SPARK_GRAFT_SF_DIR (sf0.1)
# then re-runs the artifact-guard tests against the fresh artifacts and
# prints the git command to stage them.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/end_round.sh <round-number>}"
N=$(printf "%02d" "$((10#$N))")   # 10#: "09" is a round number, not octal

# evidence must come from committed code: the parity stamper marks
# rows "-dirty" if these paths have uncommitted (or untracked) changes,
# and the artifact-guard test then rejects the artifact
if [ -n "$(git status --porcelain -- spark_streaming_postgres_lab2_spark __spark_entry__.py tools bench.py)" ]; then
    echo "ABORT: uncommitted changes in evidence-producing code -- commit first" >&2
    git status --porcelain -- spark_streaming_postgres_lab2_spark __spark_entry__.py tools bench.py >&2
    exit 1
fi

echo "== [1/4] full-inventory parity -> PARITY_r${N}.json"
# PARITY FIRST, pytest second (r15 lesson): on a round that BIRTHS
# new queries, the every-query-has-a-parity-row guard is necessarily
# red against the previous round's artifact, and merging rows
# backwards into a certified round's artifact is (correctly) rejected
# by the backdating guard -- only a fresh artifact can carry the
# newborn rows, so it must exist before the suite can be green.
# write to a temp name first: a FAIL row mid-run must not leave a
# poisoned PARITY_r{N}.json that reddens every later pytest run
rm -f "PARITY_r${N}.json.tmp"
PARITY_JSON="PARITY_r${N}.json.tmp" python tools/parity_check.py /root/testdata/sf0.01 2>/dev/null | tail -3
mv "PARITY_r${N}.json.tmp" "PARITY_r${N}.json"

echo "== [2/4] pytest -> PYTEST_r${N}.txt"
# capture pytest's own status (pipefail would otherwise kill the
# pipeline before any diagnostic prints)
set +e
python -m pytest tests/ -q > "PYTEST_r${N}.txt" 2>&1
pytest_rc=$?
set -e
tail -3 "PYTEST_r${N}.txt"
if [ "$pytest_rc" -ne 0 ]; then
    echo "ABORT: suite is red (pytest rc=$pytest_rc) -- fix before stamping artifacts" >&2
    exit 1
fi

echo "== [3/4] plan report -> PLANS_r${N}.txt"
python tools/plan_report.py /root/testdata/sf0.01 2>/dev/null > "PLANS_r${N}.txt"
tail -2 "PLANS_r${N}.txt"

echo "== [4/4] local bench -> BENCH_r${N}_local.json"
python bench.py 2>/dev/null | tail -1 > "BENCH_r${N}_local.json"

echo "== coverage check"
python - "$N" <<'PY'
import json, sys
sys.path.insert(0, ".")
import __spark_entry__ as m
from bench import BENCH_QUERIES
n = sys.argv[1]
inv = set(m.queries())
plans = sum(1 for line in open(f"PLANS_r{n}.txt") if " xchg=" in line)
assert plans == len(inv), f"PLANS_r{n}.txt covers {plans}/{len(inv)} queries"
bench = json.load(open(f"BENCH_r{n}_local.json"))
got, want = bench["summary"]["n_queries"], len(BENCH_QUERIES) + 1  # +1 streaming
assert got == want, f"BENCH_r{n}_local.json covers {got}/{want} bench queries"
s = bench["summary"]
print(f"inventory={len(inv)} plan_rows={plans} bench_queries={got}; "
      f"warm {s['warm_total_sec']}s / cold {s['cold_total_sec']}s, "
      f"streaming {s['streaming_events_per_sec_warm']} ev/s")
PY
# the authoritative parity-artifact checks live in the suite -- rerun
# them against the freshly generated artifact instead of duplicating
# the logic here
python -m pytest tests/test_artifact_guard.py -q 2>&1 | tail -2

echo
echo "stage with: git add PYTEST_r${N}.txt PARITY_r${N}.json PLANS_r${N}.txt BENCH_r${N}_local.json"

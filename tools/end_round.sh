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
# then verifies each artifact covers the whole queries() inventory and
# prints the git command to stage them.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/end_round.sh <round-number>}"
N=$(printf "%02d" "$N")

# evidence must come from committed code: the parity stamper marks
# rows "-dirty" if these paths have uncommitted changes, and the
# artifact-guard test then rejects the artifact
if [ -n "$(git status --porcelain -uno -- spark_streaming_postgres_lab2_spark __spark_entry__.py tools bench.py)" ]; then
    echo "ABORT: uncommitted changes in evidence-producing code -- commit first" >&2
    git status --porcelain -uno -- spark_streaming_postgres_lab2_spark __spark_entry__.py tools bench.py >&2
    exit 1
fi

echo "== [1/4] pytest -> PYTEST_r${N}.txt"
python -m pytest tests/ -q 2>&1 | tee "PYTEST_r${N}.txt" | tail -3
grep -qE "^[0-9]+ (passed|skipped)|passed" "PYTEST_r${N}.txt"
if grep -qE "[0-9]+ (failed|error)" "PYTEST_r${N}.txt"; then
    echo "ABORT: suite is red -- fix before stamping artifacts" >&2
    exit 1
fi

echo "== [2/4] full-inventory parity -> PARITY_r${N}.json"
rm -f "PARITY_r${N}.json"   # full regeneration, not a merge into stale rows
PARITY_JSON="PARITY_r${N}.json" python tools/parity_check.py /root/testdata/sf0.01 2>/dev/null | tail -3

echo "== [3/4] plan report -> PLANS_r${N}.txt"
python tools/plan_report.py /root/testdata/sf0.01 2>/dev/null > "PLANS_r${N}.txt"
tail -2 "PLANS_r${N}.txt"

echo "== [4/4] local bench -> BENCH_r${N}_local.json"
python bench.py 2>/dev/null | tail -1 > "BENCH_r${N}_local.json"
python - "$N" <<'PY'
import json, sys
n = sys.argv[1]
d = json.load(open(f"BENCH_r{n}_local.json"))
s = d["summary"]
print(f"warm {s['warm_total_sec']}s / cold {s['cold_total_sec']}s over {s['n_queries']} queries; "
      f"streaming {s['streaming_events_per_sec_warm']} ev/s")
PY

echo "== coverage check"
python - "$N" <<'PY'
import json, sys
sys.path.insert(0, ".")
import __spark_entry__ as m
n = sys.argv[1]
inv = set(m.queries())
parity = json.load(open(f"PARITY_r{n}.json"))
missing = sorted(inv - set(parity))
assert not missing, f"PARITY_r{n}.json missing rows: {missing}"
fails = sorted(k for k, r in parity.items() if r.get("status") == "FAIL")
assert not fails, f"PARITY_r{n}.json failing rows: {fails}"
dirty = sorted({r.get("commit") for r in parity.values() if str(r.get("commit", "")).endswith("-dirty")})
assert not dirty, f"PARITY_r{n}.json stamped from dirty tree: {dirty}"
plans = sum(1 for line in open(f"PLANS_r{n}.txt") if " xchg=" in line)
bench = json.load(open(f"BENCH_r{n}_local.json"))
print(f"inventory={len(inv)} parity_rows={len(parity)} (0 FAIL, clean stamps) "
      f"plan_rows={plans} bench_queries={bench['summary']['n_queries']}")
PY

echo
echo "stage with: git add PYTEST_r${N}.txt PARITY_r${N}.json PLANS_r${N}.txt BENCH_r${N}_local.json"

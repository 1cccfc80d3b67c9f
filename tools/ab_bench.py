"""Interleaved A/B adjudicator for round-over-round bench drift
(VERDICT r10 item 4): BENCH totals swung +21% on zero-diff code two
rounds running, each time adjudicated by hand with the same protocol
(NOTES r8/r10: uniform per-query ratio + immediate rerun + no local
competitor = host noise).  This tool encodes that protocol.

It runs the top-K most expensive warm queries from the PREVIOUS
round's local bench artifact in ROUND-ROBIN interleaved passes (a
host-load spike then lands on one pass, i.e. on every query equally,
instead of on whichever query it happened to coincide with), and
compares per-query warm medians against the previous artifact's
numbers:

- ``host_shift``: the suite-median ratio head/prev.  A uniform shift
  is the host-noise signature (the r10 adjudication measured median
  1.11x across 163 unchanged queries).
- ``residual``: each query's ratio divided by host_shift.  A genuine
  per-query regression/win shows up as a residual far from 1.0 even
  when the host is loaded; pure host noise leaves residuals ~1.0.
- queries with residual outside [1/1.3, 1.3] are flagged for a code
  diff / plan check; everything else is certified within-noise.

Usage: python tools/ab_bench.py [prev_bench_local.json] [K]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_AB_PASSES counted passes (default 4, +1 warmup).

Prints ONE JSON object (merge into BENCH_r{N}_local.json under "ab"):
{"prev_artifact": ..., "passes": N, "host_shift": r,
 "queries": {name: {"head_warm": s, "prev_warm": s, "ratio": r,
                    "residual": r, "flag": bool}}, "flagged": [...]}

Streaming is excluded: its headline (warm events/s) is the stable
round-over-round comparable already recorded in the bench summary --
treat THAT as the BASELINE.md comparison metric, not the suite total.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESIDUAL_BAND = 1.3  # outside [1/1.3, 1.3] of the host shift => flag


def latest_local_artifact() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(repo, "BENCH_r*_local.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not files:
        raise SystemExit("no BENCH_r*_local.json artifact to compare against")
    return files[-1]


def prev_round_stamps(prev_bench_path: str) -> dict:
    """src_stamp map from the SAME round's parity artifact as the
    previous bench (BENCH_r10_local -> PARITY_r10), empty if that
    artifact predates the stamping convention.  Used to pick the
    host-shift normalizer cohort: only queries whose implementation is
    UNCHANGED since the previous round may define the host shift,
    otherwise a uniform real regression (shared helper, session
    config) would normalize itself away (r11 review finding)."""
    m = re.search(r"r(\d+)", os.path.basename(prev_bench_path))
    if not m:
        return {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = os.path.join(repo, f"PARITY_r{m.group(1)}.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        rows = json.load(f)
    return {
        n: r["src_stamp"]
        for n, r in rows.items()
        if isinstance(r, dict) and "src_stamp" in r
    }


def main() -> None:
    prev_path = sys.argv[1] if len(sys.argv) > 1 else latest_local_artifact()
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_controls = int(os.environ.get("SPARK_GRAFT_AB_CONTROLS", "10"))
    with open(prev_path) as f:
        prev = json.load(f)
    prev_warm = {
        name: sec
        for name, sec in prev.get("queries", {}).items()
        if name != "streaming_pipeline_20k_events"
    }
    ranked = [n for n, _ in sorted(prev_warm.items(), key=lambda kv: -kv[1])]
    # SPARK_GRAFT_AB_QUERIES: explicit comma-separated adjudication
    # targets (r15 -- the VERDICT r14 cold-regressed set is not the
    # warm top-K, so the judge's order needs named targets); controls
    # still come from the most-expensive remainder so the normalizer
    # base stays load-sensitive
    explicit = os.environ.get("SPARK_GRAFT_AB_QUERIES", "").strip()
    if explicit:
        top = [n for n in explicit.split(",") if n]
        absent = [n for n in top if n not in prev_warm]
        if absent:
            raise SystemExit(
                f"SPARK_GRAFT_AB_QUERIES not in previous artifact: {absent}"
            )
        controls = [n for n in ranked if n not in top][:n_controls]
    else:
        top = ranked[:k]
        # control cohort: the next-most-expensive queries, measured in
        # the same interleaved passes -- they widen the normalizer base
        # so the host shift is not estimated from the same handful of
        # queries being adjudicated
        controls = ranked[k : k + n_controls]

    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = max(2, int(os.environ.get("SPARK_GRAFT_AB_PASSES", "4")))

    from parity_check import inventory_stamps

    from spark_streaming_postgres_lab2_spark import queries as inventory
    from spark_streaming_postgres_lab2_spark.session import build_session

    spark = build_session()
    qs = inventory.queries()
    measured = top + controls
    missing = [n for n in measured if n not in qs]
    if missing:
        raise SystemExit(f"previous artifact names absent from queries(): {missing}")

    prev_stamps = prev_round_stamps(prev_path)
    cur_stamps = inventory_stamps()
    unchanged = {
        n for n in measured
        if prev_stamps.get(n) is not None and prev_stamps[n] == cur_stamps.get(n)
    }
    if not prev_stamps:
        # pre-stamp previous round: every query is ASSUMED unchanged
        # for normalization purposes (the pre-r11 behavior)
        unchanged = set(measured)

    from bench import _host_load

    load_start = _host_load()
    samples: dict[str, list[float]] = {n: [] for n in measured}
    # pass 0 = warmup (JVM/codegen/footer caches), not counted
    for p in range(passes + 1):
        for name in measured:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            if p > 0:
                samples[name].append(time.time() - t0)
        print(f"# pass {p} done", file=sys.stderr)

    head = {n: statistics.median(v) for n, v in samples.items()}
    ratios = {n: head[n] / prev_warm[n] for n in measured if prev_warm[n] > 0}
    shift_base = [ratios[n] for n in sorted(unchanged) if n in ratios]
    host_shift = statistics.median(shift_base or list(ratios.values()))
    rows = {}
    flagged = []
    for n in measured:
        ratio = ratios.get(n)
        residual = ratio / host_shift if ratio else None
        flag = bool(
            residual and not (1 / RESIDUAL_BAND <= residual <= RESIDUAL_BAND)
        )
        if flag:
            flagged.append(n)
        rows[n] = {
            "head_warm": round(head[n], 3),
            "prev_warm": prev_warm[n],
            "ratio": round(ratio, 3) if ratio else None,
            "residual": round(residual, 3) if residual else None,
            "changed_since_prev": n not in unchanged,
            "role": "top" if n in top else "control",
            "flag": flag,
        }
    print(
        json.dumps(
            {
                "prev_artifact": os.path.basename(prev_path),
                "passes": passes,
                "sf_dir": sf_dir,
                "host_shift": round(host_shift, 3),
                "host_shift_cohort": f"{len(shift_base)} unchanged of "
                                     f"{len(measured)} measured",
                "residual_band": RESIDUAL_BAND,
                # same evidence as bench.py's summary.host_load
                # (VERDICT r11 item 4): the adjudicator's own window
                # must be classifiable too -- r12's first A/B pass ran
                # loaded and flagged 4 queries; the quieter rerun
                # flagged 2, all load-concentration
                "host_load": {"start": load_start, "end": _host_load()},
                "queries": rows,
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()

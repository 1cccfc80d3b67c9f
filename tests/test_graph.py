"""functions/graph.py: fixed-point PageRank + triangle counting."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.functions.graph import (
    PAGERANK_SCALE,
    pagerank_fixed_point,
    triangle_count,
)


def _pagerank_reference(node_ids, edge_list, iters, scale=PAGERANK_SCALE):
    """Pure-Python replica of the exact integer recurrence."""
    n = len(node_ids)
    outdeg: dict = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in node_ids}
    for _ in range(iters):
        s: dict = {v: 0 for v in node_ids}
        for u, v in edge_list:
            s[v] += rank[u] // outdeg[u]
        rank = {v: (15 * (scale // n)) // 100 + (85 * s[v]) // 100 for v in node_ids}
    return rank


def _run_pagerank(spark, node_ids, edge_list, iters):
    nodes = spark.createDataFrame([(v,) for v in node_ids], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = pagerank_fixed_point(nodes, edges, iters=iters).collect()
    return {r["id"]: r["rank_fp"] for r in out}


def test_pagerank_matches_integer_reference(spark):
    # 6-node graph with a hub, a cycle, a self-loop, and parallel edges
    node_ids = [0, 1, 2, 3, 4, 5]
    edge_list = [
        (0, 1), (1, 2), (2, 0),          # cycle
        (3, 0), (3, 1), (3, 2),          # hub out-links
        (4, 4),                          # self-loop
        (5, 0), (5, 0),                  # parallel edges
    ]
    got = _run_pagerank(spark, node_ids, edge_list, iters=4)
    want = _pagerank_reference(node_ids, edge_list, iters=4)
    assert got == want


def test_pagerank_dangling_node_keeps_teleport_rank(spark):
    # node 2 has no out-edges (dangling) and no in-edges: after one
    # iteration its rank is exactly the teleport term
    node_ids = [0, 1, 2]
    edge_list = [(0, 1), (1, 0)]
    got = _run_pagerank(spark, node_ids, edge_list, iters=3)
    want = _pagerank_reference(node_ids, edge_list, iters=3)
    assert got == want
    teleport = (15 * (PAGERANK_SCALE // 3)) // 100
    assert got[2] == teleport


def test_pagerank_rank_mass_bounded(spark):
    # total mass never exceeds the initial mass (integer division only
    # ever loses mass, never creates it)
    node_ids = list(range(10))
    edge_list = [(i, (i * 3 + 1) % 10) for i in range(10)] + [
        (i, (i + 1) % 10) for i in range(10)
    ]
    got = _run_pagerank(spark, node_ids, edge_list, iters=5)
    assert sum(got.values()) <= PAGERANK_SCALE


def _naive_triangles(edge_list):
    """Set-based exact recount: canonical undirected edges, count
    triangles per vertex."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    verts = sorted(adj)
    for a in verts:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def _run_triangles(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {r["id"]: r["triangles"] for r in triangle_count(edges).collect()}


def test_triangle_count_crafted(spark):
    # K4 on {0,1,2,3}: each vertex in C(3,2)=3 triangles; plus an
    # isolated edge (4,5) and noise: self-loop, duplicate, reversed dup
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(4, 5), (2, 2), (0, 1), (1, 0)]
    got = _run_triangles(spark, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_hub_orientation(spark):
    # star + rim: hub 0 connected to 1..5, rim edges (1,2),(3,4) ->
    # exactly two triangles through the hub.  The hub has max degree,
    # so every wedge is generated at a rim vertex -- exercises the
    # (degree, id) orientation path where raw-id ordering would break.
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (3, 4)]
    got = _run_triangles(spark, edges)
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_triangle_count_random_graph_vs_naive(spark):
    rng = random.Random(1234)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(220)})
    got = _run_triangles(spark, edges)
    assert got == _naive_triangles(edges)


def test_pagerank_loop_shuffles_visible_to_stage_counter(spark):
    """VERDICT r5 item 4: the returned DataFrame's static plan hides
    the loop's exchanges (per-round localCheckpoint cuts lineage), so
    PLANS_r05 read pagerank as xchg=0 and a loop-side shuffle
    regression would have been invisible.  The job-group stage counter
    is the watchdog: pin that it sees at least one shuffle stage per
    iteration."""
    from spark_streaming_postgres_lab2_spark.plans.checks import (
        executed_shuffle_stages,
    )

    sc = spark.sparkContext
    group = "planprobe-test-pagerank"
    sc.setJobGroup(group, "pagerank loop probe")
    try:
        nodes = spark.createDataFrame([(v,) for v in range(50)], "id long")
        edges = spark.createDataFrame(
            [(i, (i * 7 + 3) % 50) for i in range(50)], "src long, dst long"
        )
        pagerank_fixed_point(nodes, edges, iters=3).write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert executed_shuffle_stages(spark, group) >= 3


def test_bfs_hops_path_graph_depth_bound(spark):
    """Directed 10-node path from seed 0: hop == node id up to the
    depth bound, everything past it is -1; edges are not followed
    backwards."""
    from spark_streaming_postgres_lab2_spark.functions.graph import bfs_hops

    nodes = spark.range(10).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    seeds = nodes.filter(F.col("id") == 0)
    got = {r.id: r.hop for r in bfs_hops(nodes, edges, seeds, depth=6).collect()}
    assert got == {i: (i if i <= 6 else -1) for i in range(10)}


def test_bfs_hops_multi_source_first_visit_wins(spark):
    """Two seeds converging on a diamond: the hop label is the MIN
    distance from any seed, revisits never relabel, and parallel /
    duplicate edges don't double-count ring membership."""
    from spark_streaming_postgres_lab2_spark.functions.graph import bfs_hops

    nodes = spark.range(6).select(F.col("id"))
    #   0 -> 2 -> 3 -> 4;  1 -> 4 (shortcut);  4 -> 2 (back edge); dup 0->2
    edges = spark.createDataFrame(
        [(0, 2), (0, 2), (2, 3), (3, 4), (1, 4), (4, 2)],
        "src long, dst long",
    )
    seeds = nodes.filter(F.col("id").isin(0, 1))
    got = {r.id: r.hop for r in bfs_hops(nodes, edges, seeds, depth=6).collect()}
    # 4 is reached at hop 1 via seed 1, NOT at hop 3 via 0->2->3->4;
    # 2 keeps hop 1 (via 0) despite the 4->2 back edge; 5 is isolated
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 1, 5: -1}

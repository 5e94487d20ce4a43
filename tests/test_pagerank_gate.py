"""Quality gate for the (no-oracle) PageRank entry: the DataFrame Pregel
formulation must match an independent pure-Python power iteration with
identical semantics on the real sf0.001 graph, to 1e-6 — plus the
rank-mass invariant the update rule implies.

Semantics under test (Graph.pagerank): damped r' = (1-d)/n + d * Σ
incoming r/out_degree; dangling vertices contribute nothing (their mass
leaks), vertices with no in-edges hold exactly (1-d)/n.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from orientdb_spark.graph import tpch_graph

ITERS = 5
DAMPING = 0.85


@pytest.fixture(scope="module")
def graph(engine):
    return tpch_graph(engine)


def _python_pagerank(vids, edges, iterations, damping):
    n = len(vids)
    out_deg = defaultdict(int)
    for src, _ in edges:
        out_deg[src] += 1
    ranks = {v: 1.0 / n for v in vids}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for src, dst in edges:
            contrib[dst] += ranks[src] / out_deg[src]
        ranks = {v: (1.0 - damping) / n + damping * contrib[v] for v in vids}
    return ranks


def test_pagerank_matches_power_iteration(graph):
    vids = [r["vid"] for r in graph.vertices.select("vid").collect()]
    edges = [(r["src"], r["dst"]) for r in graph.edges.select("src", "dst").collect()]
    got = {r["vid"]: r["rank"] for r in graph.pagerank(iterations=ITERS).collect()}
    want = _python_pagerank(vids, edges, ITERS, DAMPING)

    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst < 1e-6, f"max |spark - python| = {worst:.2e}"

    # rank-mass invariant of this update rule: total mass = (1-d) + d *
    # (previous mass that sits on non-dangling vertices). Checked against
    # the python reference's total rather than a closed form so the gate
    # stays exact when the fixture graph changes.
    assert abs(sum(got.values()) - sum(want.values())) < 1e-9
    # no vertex can fall below the teleport floor
    n = len(vids)
    floor = (1.0 - DAMPING) / n
    assert min(got.values()) >= floor - 1e-12


def test_personalized_pagerank_concentrates_on_source_subtree(spark):
    """PPR from region:0 must give its own subtree strictly positive
    rank and every other region's subtree exactly zero (the FK graph is
    a forest — no path crosses regions), and the source must dominate
    nothing upstream of it (nothing points at region:0)."""
    from pyspark.sql import functions as F

    from orientdb_spark import Engine
    from orientdb_spark.graph import tpch_graph

    eng = Engine(spark)
    eng.register_parquet_dir("/root/testdata/sf0.001")
    g = tpch_graph(eng)
    pr = g.pagerank(iterations=5, personalized_for=["region:0"])
    nations = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in eng.table("nation").select("n_nationkey", "n_regionkey").collect()
    }
    rows = {r["vid"]: r["rank"] for r in pr.filter(F.col("vid").like("nation:%")).collect()}
    for vid, rank in rows.items():
        rk = nations[int(vid.split(":")[1])]
        if rk == 0:
            assert rank > 0, vid
        else:
            assert rank == 0.0, vid
    src_rank = pr.filter(F.col("vid") == "region:0").collect()[0]["rank"]
    assert src_rank > 0

"""PageRank (operators/pagerank.py): golden comparison against a naive
numpy power iteration (same damping, same uniform dangling
redistribution), stochastic-vector invariants, and shape checks."""

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_copier_spark.operators.pagerank import pagerank
from hadoop_copier_spark.queries import REGISTRY


def _ref(edge_list, damping=0.85, iters=60, extra_nodes=()):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list} | set(extra_nodes))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = defaultdict(set)
    for u, v in edge_list:
        out[u].add(v)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - damping) / n)
        dang = sum(r[idx[u]] for u in nodes if not out[u])
        new += damping * dang / n
        for u, vs in out.items():
            share = damping * r[idx[u]] / len(vs)
            for v in vs:
                new[idx[v]] += share
        r = new
    return {v: r[idx[v]] for v in nodes}


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(edge_list, 2), "src long, dst long"
    )


def test_golden_small_graph_lockstep(spark):
    """FIXED iteration count on both sides (tol=0 disables early stop):
    the Spark rounds and the numpy power iteration apply the identical
    linear operator, so after k rounds the vectors agree to FP noise —
    a sharper check than comparing two differently-converged runs."""
    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (5, 1), (6, 5)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edge_list), max_iter=15, tol=0.0).collect()
    }
    ref = _ref(edge_list, iters=15)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12)


def test_ranks_sum_to_one_with_dangling(spark):
    # node 4 is a pure sink (dangling): mass must not leak
    edge_list = [(1, 2), (2, 3), (3, 4), (1, 4)]
    got = pagerank(_edges_df(spark, edge_list)).agg(F.sum("rank")).collect()[0][0]
    assert got == pytest.approx(1.0, abs=1e-9)


def test_ring_is_uniform(spark):
    edge_list = [(i, (i + 1) % 7) for i in range(7)]
    got = [r["rank"] for r in pagerank(_edges_df(spark, edge_list)).collect()]
    assert all(x == pytest.approx(1.0 / 7, abs=1e-9) for x in got)


def test_isolated_node_via_nodes_param(spark):
    edge_list = [(1, 2), (2, 1)]
    nodes = spark.createDataFrame(
        spark.sparkContext.parallelize([(9,)], 1), "node long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edge_list), nodes=nodes).collect()
    }
    ref = _ref(edge_list, extra_nodes=[9])
    assert set(got) == {1, 2, 9}
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-7)
    assert got[9] < got[1]


def test_hub_outranks_spokes(spark):
    edge_list = [(s, 0) for s in range(1, 9)] + [(0, 1)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edge_list), max_iter=12, tol=0.0).collect()
    }
    # the hub (0) collects all spoke mass; node 1, the hub's ONLY
    # out-link, collects the hub's — both dwarf every spoke
    spokes = max(got[s] for s in range(2, 9))
    assert got[0] > 10 * spokes and got[1] > 10 * spokes
    ref = _ref(edge_list, iters=12)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12)


def test_empty_edges(spark):
    empty = _edges_df(spark, []).filter("src is not null")
    assert pagerank(empty).count() == 0


def test_registry_entry_topk(spark, sf_smoke):
    out = REGISTRY["xp_pagerank"].fn(spark, sf_smoke).toPandas()
    assert len(out) == 50
    assert (out["rank"] > 0).all()
    # ranks emitted in descending order; suppliers (many inbound customer
    # edges) dominate the head of the bipartite graph's ranking
    assert list(out["rank"]) == sorted(out["rank"], reverse=True)
    assert (out["node"].head(10) < 1_000_000_000).all()

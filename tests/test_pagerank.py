"""PageRank (operators/pagerank): exact agreement with a local
numpy power iteration on hand-built graphs (same formulation, same
dangling treatment), the Σrank = 1 invariant, dangling-node handling,
duplicate-edge idempotence, convergence, and validation."""

from __future__ import annotations

import numpy as np
import pytest

from etl_data_lake_spark.operators.pagerank import pagerank


def _numpy_pagerank(edge_list, damping=0.85, iters=50):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for u, v in set(edge_list):
        out.setdefault(u, set()).add(v)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in nodes:
            targets = out.get(u)
            if not targets:
                dangling += r[idx[u]]
                continue
            share = r[idx[u]] / len(targets)
            for v in targets:
                nxt[idx[v]] += share
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d has in-degree 0
    ("e", "f"),            # f is dangling (no out-edges)
    ("c", "e"),
]


def test_matches_numpy_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = _ranks(pagerank(df, max_iters=50, tol=0.0))
    want = _numpy_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_ranks_sum_to_one_and_order_sensible(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = _ranks(pagerank(df, max_iters=30))
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # c receives links from a, b, d — it must outrank the unlinked d
    assert got["c"] > got["d"]


def test_duplicate_edges_count_once(spark):
    df1 = spark.createDataFrame(EDGES, "src string, dst string")
    df2 = spark.createDataFrame(EDGES + EDGES, "src string, dst string")
    a = _ranks(pagerank(df1, max_iters=25, tol=0.0))
    b = _ranks(pagerank(df2, max_iters=25, tol=0.0))
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_all_dangling_uniform(spark):
    # no node has out-edges reachable: a→b only; b dangling
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = _ranks(pagerank(df, max_iters=60, tol=0.0))
    want = _numpy_pagerank([("a", "b")], iters=60)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_convergence_stops_early(spark):
    # a 2-cycle converges fast; tol large → early stop still ≈ exact
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = _ranks(pagerank(df, max_iters=100, tol=1e-12))
    assert abs(got["a"] - 0.5) < 1e-9 and abs(got["b"] - 0.5) < 1e-9


def test_nulls_dropped_and_empty(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "b"), ("a", "b")], "src string, dst string"
    )
    got = _ranks(pagerank(df, max_iters=30))
    assert set(got) == {"a", "b"}
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="max_iters"):
        pagerank(df, max_iters=0)


def _numpy_weighted_pagerank(edges_w, damping=0.85, iters=50):
    agg = {}
    for u, v, w in edges_w:
        if w is None or w != w or w <= 0:
            continue
        agg[(u, v)] = agg.get((u, v), 0.0) + w
    nodes = sorted({u for u, _ in agg} | {v for _, v in agg})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for (u, _v), w in agg.items():
        out_w[u] = out_w.get(u, 0.0) + w
    import numpy as np

    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in nodes:
            if u not in out_w:
                dangling += r[idx[u]]
        for (u, v), w in agg.items():
            nxt[idx[v]] += r[idx[u]] * w / out_w[u]
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_weighted_matches_numpy_and_shifts_mass(spark):
    edges_w = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 1.0), ("b", "c", 1.0),      # parallel edge: sums
        ("d", "b", float("nan")),              # dropped (NaN)
        ("d", "b", -2.0),                      # dropped (non-positive)
        ("d", "b", 0.5),
    ]
    df = spark.createDataFrame(edges_w, "src string, dst string, w double")
    got = _ranks(pagerank(df, max_iters=50, tol=0.0, weight_col="w"))
    want = _numpy_weighted_pagerank(edges_w)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # a sends 3x more mass to b than to c directly
    unweighted = _ranks(pagerank(df, max_iters=50, tol=0.0))
    assert got["b"] > unweighted["b"]

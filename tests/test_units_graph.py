"""Graph-ops goldens: pagerank vs a local numpy power iteration, and
structural pins for the ordered triangle count.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pg_telemetry_spark.queries.graph_ops import (
    _month_items,
    copurchase_edges,
    wl_copurchase_triangles,
    wl_pagerank,
)


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """The distributed 8-round power method must match a dense local
    power iteration on the same edges (same damping, same rounds) to
    float precision well beyond the 8-dp rounding in the output."""
    edges = [
        (r["u"], r["v"])
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    ]
    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = [[] for _ in range(n)]
    deg = np.zeros(n)
    for u, v in edges:
        adj[idx[u]].append(idx[v])
        adj[idx[v]].append(idx[u])
        deg[idx[u]] += 1
        deg[idx[v]] += 1
    rank = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(8):
        new = np.full(n, (1 - d) / n)
        for i in range(n):
            share = d * rank[i] / deg[i]
            for j in adj[i]:
                new[j] += share
        rank = new
    expect = sorted(
        ((v, rank[idx[v]]) for v in verts), key=lambda t: (-t[1], t[0])
    )[:20]
    got = [(r["part"], r["rank"]) for r in wl_pagerank(spark, sf_dir).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gp, gr), (ep, er) in zip(got, expect):
        assert gr == pytest.approx(er, abs=5e-8), (gp, gr, er)


def test_triangles_match_local_enumeration(spark, sf_dir):
    edges = {
        (r["u"], r["v"])
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    }
    # local ordered enumeration
    from collections import defaultdict

    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    n_local = 0
    for a, bs in out.items():
        bs_set = set(bs)
        for b in bs:
            for c in out.get(b, ()):
                if c in bs_set:
                    n_local += 1
    got = wl_copurchase_triangles(spark, sf_dir).agg(F.sum("n_triangles")).collect()
    assert (got[0][0] or 0) == n_local
    assert n_local > 0  # the fixture actually has triangles


def test_edges_ordered_and_distinct(spark, sf_dir):
    e = copurchase_edges(_month_items(spark, sf_dir))
    rows = e.collect()
    pairs = [(r["u"], r["v"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(u < v for u, v in pairs)


def test_label_propagation_matches_local_replay(spark, sf_dir):
    """Golden for wl_label_propagation (tier C): replay the same 5
    synchronous mode-of-neighbors rounds (ties to smallest label) in
    local python and require identical community assignment."""
    from collections import Counter, defaultdict

    from pg_telemetry_spark.queries.graph_ops import wl_label_propagation

    edges = [
        (r["u"], r["v"])
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    ]
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = {v: v for v in adj}
    for _ in range(5):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(labels[n] for n in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    sizes = Counter(labels.values())
    expect = sorted(
        ((lab, n, min(v for v, l in labels.items() if l == lab)) for lab, n in sizes.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r["label"], r["n_members"], r["min_part"])
        for r in wl_label_propagation(spark, sf_dir).collect()
    ]
    assert got == expect


def test_kcore_matches_local_peel(spark, sf_dir):
    """Golden for wl_kcore (tier C): replay the degree-peel to a
    fixpoint in local python and require identical core summary."""
    from collections import defaultdict

    from pg_telemetry_spark.queries.graph_ops import wl_kcore

    edges = {
        (r["u"], r["v"])
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 3:
                for n in adj.pop(v):
                    adj[n].discard(v)
                changed = True
    n_edges = sum(len(s) for s in adj.values()) // 2
    row = wl_kcore(spark, sf_dir).collect()[0]
    assert row["n_core_vertices"] == len(adj)
    assert row["n_core_edges"] == n_edges
    assert row["max_degree"] == (max(len(s) for s in adj.values()) if adj else None)
    assert row["min_part"] == (min(adj) if adj else None)


def test_bfs_hops_matches_local_bfs(spark, sf_dir):
    """Golden for wl_bfs_hops (tier C): local BFS from the same
    hub source (max degree, min id tie-break) must give identical
    per-hop census."""
    from collections import defaultdict, deque

    from pg_telemetry_spark.queries.graph_ops import wl_bfs_hops

    edges = [
        (r["u"], r["v"])
        for r in copurchase_edges(_month_items(spark, sf_dir)).collect()
    ]
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    src = max(adj, key=lambda v: (len(adj[v]), -v))
    hop = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if hop[u] >= 10:
            continue
        for n in sorted(adj[u]):
            if n not in hop:
                hop[n] = hop[u] + 1
                dq.append(n)
    expect = {}
    for v, h in hop.items():
        n, m = expect.get(h, (0, None))
        expect[h] = (n + 1, v if m is None else min(m, v))
    got = {
        r["hop"]: (r["n_vertices"], r["min_part"])
        for r in wl_bfs_hops(spark, sf_dir).collect()
    }
    assert got == expect


def test_copurchase_edges_fat_basket(spark):
    """A pathologically wide basket (r17: the VERDICT-r16 skew bound)
    must emit exactly the C(k, 2) ordered pairs — the nested-generator
    emission never materializes the pair set as one row, but the edge
    SET is the exact all-pairs semantics regardless of basket width."""
    import itertools

    k = 500
    items = spark.createDataFrame(
        [(1, p) for p in range(k)] + [(2, 7), (2, 3)],
        "l_orderkey long, l_partkey long",
    )
    got = {
        (r["u"], r["v"]) for r in copurchase_edges(items).collect()
    }
    expect = set(itertools.combinations(range(k), 2)) | {(3, 7)}
    assert got == expect

"""Defining-property tests for wave 43."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def _edges(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    basket = defaultdict(set)
    for r in li:
        basket[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for pks in basket.values():
        for a, b in combinations(sorted(pks), 2):
            edges.add((a, b))
    return edges


def test_assortativity_matches_direct_python(spark):
    [row] = _q("graph_degree_assortativity")(spark, SF).collect()
    edges = _edges(spark)
    assert row["n_edges"] == len(edges)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    m = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert math.isclose(row["assortativity"], r, abs_tol=2e-6)


def test_local_clustering_matches_direct_python(spark):
    rows = {r["partkey"]: r for r in _q("graph_local_clustering")(spark, SF).collect()}
    edges = _edges(spark)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    small = {n for n, d in deg.items() if d <= 128}
    nbrs = defaultdict(set)
    for u, v in edges:
        if u in small and v in small:
            nbrs[u].add(v)
            nbrs[v].add(u)
    eset = edges
    for p in [n for n in nbrs if n % 101 == 0]:
        k = len(nbrs[p])
        if k < 2:
            assert p not in rows
            continue
        tri = sum(
            1
            for a, b in combinations(sorted(nbrs[p]), 2)
            if (a, b) in eset
        )
        r = rows[p]
        assert (r["k"], r["n_tri"]) == (k, tri)
        assert math.isclose(r["cc"], 2 * tri / (k * (k - 1)), abs_tol=2e-6)
    # every reported probe is in the recomputed set
    assert set(rows) <= {n for n in nbrs if n % 101 == 0 and len(nbrs[n]) >= 2}


def test_cvm_matches_direct_python(spark):
    [row] = _q("stat_cvm_two_sample")(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", F.col("l_quantity").cast("bigint").alias("q"))
        .collect()
    )
    a = Counter(r["q"] for r in li if r["l_returnflag"] == "R")
    b = Counter(r["q"] for r in li if r["l_returnflag"] != "R")
    n, m = sum(a.values()), sum(b.values())
    assert (row["n"], row["m"]) == (n, m)
    ca = cb = 0
    num = 0
    for qv in sorted(set(a) | set(b)):
        ca += a.get(qv, 0)
        cb += b.get(qv, 0)
        num += (a.get(qv, 0) + b.get(qv, 0)) * (m * ca - n * cb) ** 2
    t = num / (n * m * (n + m) ** 2)
    assert math.isclose(row["t_stat"], t, abs_tol=2e-6)
    # statistic is non-negative and bounded by (n+m)/3-ish; sanity only
    assert row["t_stat"] >= 0


def test_burstiness_matches_direct_python(spark):
    import re

    rows = _q("doc_term_burstiness")(spark, SF).collect()
    assert rows and len(rows) <= 50
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    d = len(docs)
    per_term = defaultdict(list)
    for r in docs:
        c = Counter(
            w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w
        )
        for w, k in c.items():
            per_term[w].append(k)
    want = sorted(
        ((sum(v), w) for w, v in per_term.items()), key=lambda t: (-t[0], t[1])
    )[:50]
    got = [(r["total_count"], r["term"]) for r in rows]
    assert got == want
    for r in rows:
        v = per_term[r["term"]]
        s, qq = sum(v), sum(x * x for x in v)
        vmr = (d * qq - s * s) / (d * s)
        assert math.isclose(r["vmr"], vmr, abs_tol=2e-6)


def test_vwap_matches_direct_python(spark):
    rows = {(r["yr"], r["mo"]): r for r in _q("li_vwap_by_month")(spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 1e6)
            .cast("bigint")
            .alias("um"),
        )
        .collect()
    )
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        agg[(r["yr"], r["mo"])][0] += r["qty"]
        agg[(r["yr"], r["mo"])][1] += r["qty"] * r["um"]
    assert set(rows) == set(agg)
    for k, (vol, pv) in agg.items():
        assert rows[k]["volume"] == vol
        assert math.isclose(
            rows[k]["vwap"], pv / vol / 1e6, abs_tol=2e-6
        )

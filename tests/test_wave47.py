"""Defining-property tests for wave 47."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_cochran_q_matches_direct_python(spark):
    [row] = _q("stat_cochran_q")(spark, SF).collect()
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", F.year("o_orderdate").alias("yr"))
        .where(F.col("yr").isin(1995, 1996, 1997))
        .distinct()
        .collect()
    )
    g = Counter(r["yr"] for r in orders)
    l = Counter(r["o_custkey"] for r in orders)
    t = sum(g.values())
    k = 3
    q = (
        (k - 1)
        * (k * sum(v * v for v in g.values()) - t * t)
        / (k * t - sum(v * v for v in l.values()))
    )
    assert row["n_positives"] == t
    assert math.isclose(row["q_stat"], q, abs_tol=2e-6)


def test_km_matches_direct_python(spark):
    rows = {r["t_days"]: r["survival"] for r in _q("cust_survival_km")(spark, SF).collect()}
    assert set(rows) == set(range(30, 361, 30))
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .collect()
    )
    per = defaultdict(list)
    h = max(r["d"] for r in orders)
    for r in orders:
        per[r["o_custkey"]].append(r["d"])
    base = []
    for ds in per.values():
        ds.sort()
        if len(ds) >= 2:
            base.append(((ds[1] - ds[0]).days, 1))
        else:
            base.append(((h - ds[0]).days, 0))
    days = defaultdict(lambda: [0, 0])
    for t, ev in base:
        days[t][0] += ev
        days[t][1] += 1 - ev
    n = len(base)
    s = 1.0
    cum = 0
    surv_at = {}
    for t in sorted(days):
        d, c = days[t]
        at_risk = n - cum
        if d > 0:
            s = 0.0 if d == at_risk else s * (1 - d / at_risk)
            surv_at[t] = s
        cum += d + c
    for g in range(30, 361, 30):
        eligible = [t for t in surv_at if t <= g]
        want = surv_at[max(eligible)] if eligible else None
        if want is not None:
            assert math.isclose(rows[g], want, abs_tol=2e-6), (g, rows[g], want)
    # survival is monotone non-increasing on the grid
    vals = [rows[g] for g in sorted(rows)]
    assert all(b <= a + 1e-9 for a, b in zip(vals, vals[1:]))


def test_kraljic_matches_direct_python(spark):
    rows = {r["quadrant"]: r for r in _q("sup_kraljic_matrix")(spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_suppkey",
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    spend = Counter()
    parts = defaultdict(set)
    for r in li:
        spend[r["l_suppkey"]] += r["c"]
        parts[r["l_suppkey"]].add(r["l_partkey"])
    n = len(spend)
    ts = sum(spend.values())
    tp = sum(len(v) for v in parts.values())
    agg = defaultdict(lambda: [0, 0])
    for s in spend:
        quad = (
            ("high-spend/" if spend[s] * n >= ts else "low-spend/")
            + ("high-variety" if len(parts[s]) * n >= tp else "low-variety")
        )
        agg[quad][0] += 1
        agg[quad][1] += spend[s]
    assert set(rows) == set(agg)
    for quad, (cnt, sp) in agg.items():
        assert rows[quad]["n_suppliers"] == cnt
        assert math.isclose(rows[quad]["spend_share"], sp / ts, abs_tol=2e-6)
    assert math.isclose(
        sum(r["spend_share"] for r in rows.values()), 1.0, abs_tol=1e-5
    )

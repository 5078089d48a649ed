"""Defining-property tests for wave 40."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_newsvendor_is_exact_fractile(spark):
    rows = _q("li_newsvendor_quantile")(spark, SF).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_partkey",
            (
                (F.year("l_shipdate") - 1992) * 12 + F.month("l_shipdate") - 1
            ).alias("m"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .groupBy("l_partkey", "m")
        .agg(F.sum("q").alias("q"))
        .collect()
    )
    hist = defaultdict(list)
    for r in li:
        hist[r["l_partkey"]].append(r["q"])
    for r in rows:
        ds = sorted(hist[r["l_partkey"]])
        n = len(ds)
        # smallest rank rk with rk*5 >= 4*n
        rk = (4 * n + 4) // 5
        assert r["n_months"] == n
        assert r["stock_level"] == ds[rk - 1]
        assert r["d_total"] == sum(ds)


def test_lorenz_monotone_convex_ends_at_one(spark):
    rows = _q("cust_lorenz_deciles")(spark, SF01).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["share_ppm"] for r in rows]
    assert shares[-1] == 1_000_000
    assert all(0 <= s <= 1_000_000 for s in shares)
    assert shares == sorted(shares)
    # convexity of the Lorenz curve, with 2 ppm slack for the floor
    incs = [b - a for a, b in zip([0] + shares[:-1], shares)]
    for a, b in zip(incs, incs[1:]):
        assert b >= a - 2


def test_g_test_python_parity(spark):
    row = _q("stat_g_test")(spark, SF).collect()[0]
    p = (
        spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_size") <= 10)
        .select("p_brand", "p_size")
        .collect()
    )
    cells = defaultdict(int)
    rt = defaultdict(int)
    ct = defaultdict(int)
    for r in p:
        cells[(r["p_brand"], r["p_size"])] += 1
        rt[r["p_brand"]] += 1
        ct[r["p_size"]] += 1
    n = len(p)
    t = sum(
        int(round(o * math.log(o * n / (rt[b] * ct[s])) * 1e9))
        for (b, s), o in cells.items()
    )
    assert row["n_cells"] == len(cells)
    assert abs(row["g_stat"] - round(2.0 * t / 1e9, 6)) <= 1e-6


def test_runs_test_python_parity(spark):
    row = _q("ord_runs_test")(spark, SF).collect()[0]
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev"
            )
        )
        .collect()
    )
    daily = sorted((r["o_orderdate"], r["rev"]) for r in o)
    by_rev = sorted(daily, key=lambda t: (t[1], t[0]))
    n = len(by_rev)
    med = by_rev[(n + 1) // 2 - 1][1]
    labs = [1 if rev > med else 0 for _, rev in daily if rev != med]
    n1 = sum(labs)
    n2 = len(labs) - n1
    runs = sum(
        1 for i, v in enumerate(labs) if i == 0 or v != labs[i - 1]
    )
    assert (row["n1"], row["n2"], row["n_runs"]) == (n1, n2, runs)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    assert abs(row["z"] - round((runs - mu) / math.sqrt(var), 6)) <= 1e-6

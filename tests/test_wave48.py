"""Defining-property tests for wave 48."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_markov_stationary_matches_numpy_power_iteration(spark):
    rows = {r["event_type"]: r["pi"] for r in
            _q("ev_markov_stationary")(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    types = sorted({a for a, _ in trans} )
    idx = {t: i for i, t in enumerate(types)}
    import numpy as np

    p = np.zeros((len(types), len(types)))
    for (a, b), c in trans.items():
        p[idx[a], idx[b]] = c
    p = p / p.sum(axis=1, keepdims=True)
    x = np.full(len(types), 1.0 / len(types))
    for _ in range(12):
        x = x @ p
    assert set(rows) == set(types)
    for t in types:
        assert math.isclose(rows[t], x[idx[t]], abs_tol=2e-6)
    # a stationary-ish vector sums to ~1
    assert math.isclose(sum(rows.values()), 1.0, abs_tol=1e-4)


def test_friedman_matches_direct_python(spark):
    [row] = _q("stat_friedman")(spark, SF).collect()
    cells = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "v"
            )
        )
        .collect()
    )
    by_subj = defaultdict(dict)
    for r in cells:
        by_subj[r["n_name"]][r["yr"]] = r["v"]
    years = sorted({r["yr"] for r in cells})
    rj = Counter()
    nsub = Counter()
    for subj, vals in by_subj.items():
        order = sorted(vals.items(), key=lambda kv: kv[1])
        for rank0, (yr, _) in enumerate(order):
            rj[yr] += rank0 + 1  # cents: ties measure-zero at this SF
            nsub[yr] += 1
    k = len(years)
    n = max(nsub.values())
    chi = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rj.values()) - 3.0 * n * (
        k + 1
    )
    assert (row["n"], row["k"]) == (n, k)
    assert math.isclose(row["chi2_f"], chi, abs_tol=2e-6)


def test_little_law_structural_identity(spark):
    """Per-order open-days split across years must re-assemble to the
    orders' total residence (the conservation Little's law rests on);
    the per-year ratio itself legitimately deviates from 1 here
    because synthetic fulfillment windows span years (that deviation
    IS the query's point)."""
    rows = _q("ord_little_law")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["l_avg_open"] > 0
        assert r["w_mean_days"] >= 0
        assert r["little_ratio"] > 0
    # conservation: sum over years of order-days == sum of residences
    total_order_days = 0.0
    total_res_days = 0.0
    for r in rows:
        # years are all 365/366 days; recover integer sums from the
        # rounded averages with day-count from the calendar
        import datetime

        ydays = (
            datetime.date(r["yr"] + 1, 1, 1) - datetime.date(r["yr"], 1, 1)
        ).days
        total_order_days += r["l_avg_open"] * ydays
        total_res_days += r["w_mean_days"] * r["n_started"]
    assert abs(total_order_days - total_res_days) / total_res_days < 1e-4


def test_bigram_entropy_matches_direct_python(spark):
    rows = {r["source"]: r for r in
            _q("doc_bigram_entropy_rate")(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    big = defaultdict(Counter)
    for r in docs:
        ws = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        for a, b in zip(ws, ws[1:]):
            big[r["source"]][(a, b)] += 1
    for src, c in big.items():
        n = sum(c.values())
        left = Counter()
        for (a, _), k in c.items():
            left[a] += k
        h = -sum(k / n * math.log(k / left[a]) for (a, _), k in c.items())
        assert rows[src]["n_bigrams"] == n
        assert math.isclose(rows[src]["h_cond"], h, abs_tol=2e-6)
        assert rows[src]["h_cond"] >= -1e-9

"""Defining-property tests for wave 45."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_kl_matches_direct_python_and_is_nonnegative(spark):
    rows = {(r["src_a"], r["src_b"]): r["kl"] for r in
            _q("doc_kl_divergence_sources")(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    wc = defaultdict(Counter)
    for r in docs:
        for w in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if w:
                wc[r["source"]][w] += 1
    vocab = set()
    for c in wc.values():
        vocab |= set(c)
    v = len(vocab)
    srcs = sorted(wc)
    assert set(rows) == {(a, b) for a in srcs for b in srcs if a != b}
    for a in srcs[:5]:
        for b in srcs[:5]:
            if a == b:
                continue
            da = sum(wc[a].values()) + v
            db = sum(wc[b].values()) + v
            kl = 0.0
            for w in vocab:
                p = (wc[a].get(w, 0) + 1) / da
                q = (wc[b].get(w, 0) + 1) / db
                kl += p * math.log(p / q)
            assert math.isclose(rows[(a, b)], kl, abs_tol=5e-6), (a, b)
    assert all(k >= -1e-6 for k in rows.values())  # Gibbs' inequality


def test_ljung_box_matches_direct_python(spark):
    [row] = _q("ts_ljung_box")(spark, SF).collect()
    daily = sorted(
        (r["day"], r["cents"])
        for r in (
            spark.read.parquet(f"{SF}/orders.parquet")
            .groupBy(F.to_date("o_orderdate").alias("day"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .alias("cents")
            )
            .collect()
        )
    )
    xs = [c for _, c in daily]
    n = len(xs)
    assert row["n_days"] == n
    s = sum(xs)
    ys = [n * x - s for x in xs]
    d = sum(y * y for y in ys)
    q = 0.0
    for k in range(1, 11):
        num = sum(ys[t] * ys[t - k] for t in range(k, n))
        rk = num / d
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert math.isclose(row["q_stat"], q, abs_tol=2e-6)


def test_brier_decomposition_identity(spark):
    [row] = _q("ml_brier_decomposition")(spark, SF).collect()
    # Murphy identity, components' signs, and range
    assert row["uncertainty"] >= 0
    assert row["reliability"] >= 0
    assert row["resolution"] >= -1e-9
    assert math.isclose(
        row["brier"],
        row["reliability"] - row["resolution"] + row["uncertainty"],
        abs_tol=3e-6,
    )
    assert 0.0 <= row["brier"] <= 1.0
    # resolution can never exceed uncertainty
    assert row["resolution"] <= row["uncertainty"] + 1e-9


def test_cohort_half_life_matches_direct_python(spark):
    rows = {
        r["cohort_day"]: r
        for r in _q("ev_cohort_half_life")(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    )
    per_user = defaultdict(set)
    for r in ev:
        per_user[r["user_id"]].add(r["d"])
    cohorts = defaultdict(list)
    for uid, days in per_user.items():
        cohorts[min(days)].append(days)
    assert set(rows) == {str(c) for c in cohorts}
    for cd, members in cohorts.items():
        size = len(members)
        r = rows[str(cd)]
        assert r["size"] == size
        hl = None
        maxk = max((d - cd).days for m in members for d in m)
        for k in range(1, maxk + 1):
            retained = sum(
                1
                for m in members
                if any((d - cd).days == k for d in m)
            )
            if 2 * retained < size:
                hl = k
                break
        assert r["half_life_days"] == hl

"""Defining-property tests for wave 44."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_mann_kendall_matches_direct_python(spark):
    [row] = _q("ord_mann_kendall_trend")(spark, SF).collect()
    monthly = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        .collect()
    )
    strata = defaultdict(list)
    for r in monthly:
        strata[r["mo"]].append((r["yr"], r["cents"]))
    s_total = 0
    var_total = 0.0
    for mo, series in strata.items():
        series.sort()
        xs = [c for _, c in series]
        n = len(xs)
        s_total += sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_total += (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    assert row["s_total"] == s_total
    assert math.isclose(row["var_total"], var_total, abs_tol=1e-6)
    if s_total > 0:
        z = (s_total - 1.0) / math.sqrt(var_total)
    elif s_total < 0:
        z = (s_total + 1.0) / math.sqrt(var_total)
    else:
        z = 0.0
    assert math.isclose(row["z"], z, abs_tol=2e-6)


def test_theil_matches_direct_python(spark):
    rows = {r["nation"]: r for r in _q("li_theil_index")(spark, SF).collect()}
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{SF}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "cents")
        .collect()
    )
    by_nation = defaultdict(list)
    for r in rev:
        by_nation[r["nation"]].append(r["cents"])
    for nat, xs in by_nation.items():
        nn, tot = len(xs), sum(xs)
        t = sum((x * nn / tot) * math.log(x * nn / tot) for x in xs) / nn
        assert rows[nat]["n_cust"] == nn
        assert math.isclose(rows[nat]["theil_t"], t, abs_tol=2e-6)
    # Theil T is non-negative
    assert all(r["theil_t"] >= -1e-9 for r in rows.values())


def test_burstiness_matches_direct_python(spark):
    rows = {
        r["user_id"]: r
        for r in _q("ev_interarrival_burstiness")(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"]))
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    got_users = set()
    for uid, evs in per_user.items():
        evs.sort()
        micros = [
            (t - epoch).days * 86_400_000_000
            + (t - epoch).seconds * 1_000_000
            + (t - epoch).microseconds
            for t, _ in evs
        ]
        gaps = [b - a for a, b in zip(micros, micros[1:])]
        if len(gaps) < 9:
            assert uid not in rows
            continue
        got_users.add(uid)
        n, s, q = len(gaps), sum(gaps), sum(g * g for g in gaps)
        sd_num = math.sqrt(n * q - s * s)
        b = (sd_num - s) / (sd_num + s)
        r = rows[uid]
        assert r["n_gaps"] == n
        assert math.isclose(r["burstiness"], b, abs_tol=2e-6)
        assert -1.0 <= r["burstiness"] <= 1.0
    assert set(rows) == got_users

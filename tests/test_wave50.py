"""Defining-property tests for wave 50 (direct-Python re-derivations
at sf0.001, independent of both engines' SQL paths)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_gini_by_brand_matches_direct_python(spark):
    rows = {r["brand"]: r for r in _q("li_gini_by_brand")(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    ).collect()
    pt = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    rev = defaultdict(int)
    for r in li:
        rev[r["l_partkey"]] += r["c"]
    by_brand = defaultdict(list)
    for pk, rc in rev.items():
        by_brand[pt[pk]].append((rc, pk))
    for brand, vals in by_brand.items():
        vals.sort()
        n = len(vals)
        s = sum(rc for rc, _ in vals)
        si = sum((i + 1) * rc for i, (rc, _) in enumerate(vals))
        gini = 2.0 * si / (n * s) - (n + 1.0) / n
        r = rows[brand]
        assert r["n_parts"] == n
        assert math.isclose(r["revenue"], s / 100.0, rel_tol=1e-12)
        assert math.isclose(r["gini"], gini, abs_tol=2e-9)


def _embedding_shapes(spark):
    """Quantized per-label centroids + per-point own-centroid
    distances + pairwise centroid distances (numpy, exact ints)."""
    raw = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    pts = defaultdict(list)
    for r in raw:
        q = np.rint(np.array(r["embedding"], dtype=np.float64) * 1e6).astype(
            np.int64
        )
        pts[r["label"]].append(q)
    a_mean, cents = {}, {}
    for lab, vecs in pts.items():
        arr = np.stack(vecs)
        n = len(vecs)
        s = arr.sum(axis=0)
        cents[lab] = (s, n)
        dq = [
            round(
                math.sqrt(float(((v * n - s).astype(object) ** 2).sum()))
                / (n * 1e6)
                * 1e6
            )
            for v in arr
        ]
        a_mean[lab] = sum(dq) / n / 1e6
    return pts, cents, a_mean


def test_davies_bouldin_matches_direct_python(spark):
    rows = {r["label"]: r for r in _q("emb_davies_bouldin")(spark, SF).collect()}
    pts, cents, a_mean = _embedding_shapes(spark)
    r_max = {}
    for i in cents:
        best = 0.0
        for j in cents:
            if i == j:
                continue
            si, ni = cents[i]
            sj, nj = cents[j]
            diff = (si * nj - sj * ni).astype(object)
            d = math.sqrt(float((diff**2).sum())) / (ni * nj * 1e6)
            best = max(best, (a_mean[i] + a_mean[j]) / d)
        r_max[i] = best
    db = sum(round(v * 1e6) for v in r_max.values()) / len(r_max) / 1e6
    for lab, r in rows.items():
        assert r["n_points"] == len(pts[lab])
        assert math.isclose(r["a_mean"], a_mean[lab], abs_tol=2e-6)
        assert math.isclose(r["r_max"], r_max[lab], abs_tol=2e-5)
        assert math.isclose(r["db_index"], db, abs_tol=2e-6)


def test_entropy_rate_matches_direct_python(spark):
    rows = {
        r["event_type"]: r
        for r in _q("ev_entropy_rate_stationary")(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    trans = defaultdict(int)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r["event_type"])
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    states = sorted({a for a, _ in trans})
    rt = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(12):
        nxt = defaultdict(float)
        for (a, b), c in trans.items():
            nxt[b] += pi[a] * c / rt[a]
        pi = dict(nxt)
    h = {}
    for s in states:
        clnc = sum(
            c * round(math.log(c) * 1e6)
            for (a, _), c in trans.items()
            if a == s
        )
        h[s] = round((rt[s] * round(math.log(rt[s]) * 1e6) - clnc) / rt[s])
    hsum = sum(round(pi[s] * 1e6) * h[s] for s in states)
    for s in states:
        r = rows[s]
        assert math.isclose(r["pi"], pi[s], abs_tol=2e-6)
        assert math.isclose(r["h_cond"], h[s] / 1e6, abs_tol=2e-6)
        assert math.isclose(r["entropy_rate"], hsum / 1e12, abs_tol=2e-6)
    # sanity: entropy rate is bounded by log of the out-degree
    assert 0.0 <= hsum / 1e12 <= math.log(len(states)) + 1e-9


def test_hurst_rs_matches_direct_python(spark):
    [row] = _q("ts_hurst_rs")(spark, SF).collect()
    days = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("d")
        .collect()
    )
    c = [r["c"] for r in days]
    pts = []
    rs_by_w = {}
    for w in (8, 16, 32, 64):
        rs_qs = []
        for b in range(len(c) // w):
            blk = c[b * w : (b + 1) * w]
            tot = sum(blk)
            cum = np.cumsum(blk)
            wz = [w * cum[t] - (t + 1) * tot for t in range(w)]
            ssd = sum((w * x - tot) ** 2 for x in blk)
            if ssd == 0:
                continue
            rs = (max(wz) - min(wz)) / math.sqrt(ssd / w)
            rs_qs.append(round(rs * 1e6))
        mean_rs = sum(rs_qs) / len(rs_qs) / 1e6
        rs_by_w[w] = mean_rs
        pts.append(
            (round(math.log(w) * 1e6), round(math.log(mean_rs) * 1e6))
        )
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert row["n_scales"] == 4
    for w in (8, 16, 32, 64):
        assert math.isclose(row[f"rs{w}"], rs_by_w[w], abs_tol=2e-6)
    assert math.isclose(row["hurst"], slope, abs_tol=2e-6)
    # R/S grows with window size on any non-degenerate series
    assert rs_by_w[8] < rs_by_w[64]


def test_jonckheere_terpstra_matches_direct_python(spark):
    [row] = _q("stat_jonckheere_terpstra")(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("v")
    ).collect()
    od = {
        r["o_orderkey"]: int(r["o_orderpriority"][0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    groups = defaultdict(list)
    for r in li:
        groups[od[r["l_orderkey"]]].append(r["v"])
    gs = sorted(groups)
    # doubled U via per-group value counts (exact, half-tie convention)
    cnt = {g: defaultdict(int) for g in gs}
    for g in gs:
        for v in groups[g]:
            cnt[g][v] += 1
    vals = sorted({v for g in gs for v in cnt[g]})
    j2 = 0
    for ia in range(len(gs)):
        for jb in range(ia + 1, len(gs)):
            gi, gj = gs[ia], gs[jb]
            less = 0
            for v in vals:
                j2 += cnt[gj][v] * (2 * less + cnt[gi][v])
                less += cnt[gi][v]
    n_g = {g: len(groups[g]) for g in gs}
    N = sum(n_g.values())
    t_v = defaultdict(int)
    for g in gs:
        for v, k in cnt[g].items():
            t_v[v] += k
    e2j = (N * N - sum(n * n for n in n_g.values())) / 2.0
    g25 = sum(n * (n - 1) * (2 * n + 5) for n in n_g.values())
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in t_v.values())
    g2 = sum(n * (n - 1) * (n - 2) for n in n_g.values())
    t2 = sum(t * (t - 1) * (t - 2) for t in t_v.values())
    g1 = sum(n * (n - 1) for n in n_g.values())
    t1 = sum(t * (t - 1) for t in t_v.values())
    var = (
        (N * (N - 1.0) * (2.0 * N + 5.0) - g25 - t25) / 72.0
        + g2 * t2 / (36.0 * N * (N - 1.0) * (N - 2.0))
        + g1 * t1 / (8.0 * N * (N - 1.0))
    )
    z = (j2 - e2j) / (2.0 * math.sqrt(var))
    assert row["n_total"] == N
    assert row["j2"] == float(j2)
    assert math.isclose(row["e_j2"], e2j, rel_tol=1e-12)
    assert math.isclose(row["var_j"], var, rel_tol=1e-9)
    assert math.isclose(row["z"], z, abs_tol=2e-6)


def test_holt_winters_matches_direct_python(spark):
    rows = {
        r["h"]: r["forecast"]
        for r in _q("ts_holt_winters_additive")(spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    ).collect()
    monthly = defaultdict(int)
    for r in orders:
        monthly[r["y"] * 12 + r["mo"] - 1] += r["c"]
    maxm = max(monthly)
    # The plan's window is CALENDAR-anchored and NULLs every forecast
    # on a gap (round-11 ADVICE; see the plan docstring) — this
    # replica is only valid on a gap-free window, so assert that
    # instead of silently zero-filling a missing month (which would be
    # a third semantics neither engine implements).
    assert all(maxm - 35 + i in monthly for i in range(36))
    y = [float(monthly[maxm - 35 + i]) for i in range(36)]
    l = sum(y[:12]) / 12.0
    b = (sum(y[12:24]) - sum(y[:12])) / 144.0
    s = [y[i] - l for i in range(12)]
    for i in range(12, 36):
        slot = i % 12
        lnew = 0.25 * (y[i] - s[slot]) + 0.75 * (l + b)
        bnew = 0.125 * (lnew - l) + 0.875 * b
        s[slot] = 0.25 * (y[i] - lnew) + 0.75 * s[slot]
        l, b = lnew, bnew
    assert set(rows) == set(range(1, 13))
    for h in range(1, 13):
        f = (l + h * b + s[(h - 1) % 12]) / 100.0
        assert math.isclose(rows[h], f, abs_tol=1e-4), h


def test_holt_winters_gapped_spine_nulls_forecasts(spark, tmp_path):
    """Pin of the calendar-anchored gap semantics (round-11 ADVICE):
    a calendar month with NO orders inside the 36-month window leaves
    its y{i} NULL, and the recurrence propagates NULL into ALL 12
    forecasts — in Spark AND in the DuckDB oracle, identically.  A
    loud all-NULL answer, never a silent zero-fill."""
    import duckdb

    import __spark_entry__ as e

    src = spark.read.parquet(f"{SF}/orders.parquet")
    maxm = src.select(
        F.max(F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
    ).collect()[0][0]
    gap = maxm - 17  # a month strictly inside the last-36 window
    gapped = src.where(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1) != gap
    )
    d = tmp_path / "gapped"
    d.mkdir()
    gapped.coalesce(1).write.parquet(str(d / "orders.parquet"))

    rows = e.queries()["ts_holt_winters_additive"](spark, str(d)).collect()
    assert len(rows) == 12
    assert all(r["forecast"] is None for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    oracle = con.execute(e.oracle_sql()["ts_holt_winters_additive"]).fetchall()
    assert len(oracle) == 12
    assert all(r[1] is None for r in oracle)

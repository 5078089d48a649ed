"""Defining-property tests for wave 49 (direct-Python re-derivations
at sf0.001, independent of both engines' SQL paths)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_psi_matches_direct_python(spark):
    rows = {r["priority"]: r for r in _q("ml_psi_priority_shift")(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).collect()
    ca, cb = Counter(), Counter()
    for r in orders:
        (cb if r["yr"] >= 1998 else ca)[r["o_orderpriority"]] += 1
    na = sum(ca[p] for p in rows)
    nb = sum(cb[p] for p in rows)
    for p, r in rows.items():
        assert r["ca"] == ca[p] and r["cb"] == cb[p]
        pa, pb = ca[p] / na, cb[p] / nb
        assert math.isclose(
            r["psi_term"], (pa - pb) * math.log(pa / pb), abs_tol=2e-6
        )


def test_cr4_matches_direct_python(spark):
    rows = {r["nation"]: r for r in _q("sup_cr4_concentration")(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_suppkey").collect()
    sup = spark.read.parquet(f"{SF}/supplier.parquet").collect()
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    cnt = Counter(r["l_suppkey"] for r in li)
    by_nation = defaultdict(list)
    for s in sup:
        if cnt[s["s_suppkey"]]:
            by_nation[nat[s["s_nationkey"]]].append(
                (-cnt[s["s_suppkey"]], s["s_suppkey"])
            )
    for n, lst in by_nation.items():
        lst.sort()
        total = sum(-c for c, _ in lst)
        top4 = sum(-c for c, _ in lst[:4])
        r = rows[n]
        assert r["n_suppliers"] == len(lst)
        assert r["total_items"] == total and r["top4_items"] == top4
        assert r["cr4_ppm"] == (top4 * 2000000 + total) // (2 * total)


def test_mase_matches_direct_python(spark):
    [row] = _q("ord_mase_seasonal")(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).collect()
    monthly = defaultdict(int)
    for r in orders:
        monthly[r["y"] * 12 + r["mo"] - 1] += r["cents"]
    ms = sorted(monthly)
    snum = sden = nnum = nden = 0
    # POSITIONAL lags, exactly the plan/oracle definition: the row 1
    # (resp. 12) positions back in the observed-month sequence must BE
    # month m-1 (resp. m-12).  Membership (`m-12 in monthly`) only
    # coincides with this on a gap-free spine (round-10 ADVICE); the
    # gapped-series behavior is pinned by test_mase_positional_on_gaps.
    for i, m in enumerate(ms):
        if i >= 1 and ms[i - 1] == m - 1:
            nnum += abs(monthly[m] - monthly[ms[i - 1]])
            nden += 1
        if i >= 12 and ms[i - 12] == m - 12:
            snum += abs(monthly[m] - monthly[ms[i - 12]])
            sden += 1
    assert row["n_months"] == len(ms)
    assert row["seasonal_abs_err"] == snum and row["n_seasonal"] == sden
    assert row["naive_abs_err"] == nnum and row["n_naive"] == nden
    assert math.isclose(
        row["mase"], (snum / sden) / (nnum / nden), abs_tol=2e-6
    )


def test_mase_positional_on_gaps(spark):
    """On a GAPPED month spine the positional-lag definition (the
    plan's and oracle's) differs from naive membership; pin the
    positional one.  Months 1995-01..1997-01 minus 1995-06: for
    m = 1996-01..1996-05 the month m-12 EXISTS but the hole shifts it
    to 11 positions back (or the series is still shorter than 13), so
    positional excludes it while membership would accept — n_seasonal
    must be 7 (1996-07..1997-01), not membership's 12."""
    import datetime
    import tempfile

    from pyspark.sql import Row

    months = [(y, mo) for y in (1995, 1996) for mo in range(1, 13)]
    months.append((1997, 1))
    months.remove((1995, 6))
    rows = [
        Row(
            o_orderdate=datetime.date(y, mo, 1),
            o_totalprice=float(100 + 7 * i + (i * i) % 13),
        )
        for i, (y, mo) in enumerate(months)
    ]
    idx = {y * 12 + mo - 1: r.o_totalprice for r, (y, mo) in zip(rows, months)}
    ms = sorted(idx)
    cents = {m: round(idx[m] * 100) for m in ms}
    snum = sden = nnum = nden = 0
    for i, m in enumerate(ms):
        if i >= 1 and ms[i - 1] == m - 1:
            nnum += abs(cents[m] - cents[m - 1])
            nden += 1
        if i >= 12 and ms[i - 12] == m - 12:
            snum += abs(cents[m] - cents[m - 12])
            sden += 1
    membership_sden = sum(1 for m in ms if m - 12 in cents)
    assert sden == 7 and membership_sden == 12  # the gap distinguishes them
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows).write.parquet(f"{tmp}/orders.parquet")
        [row] = _q("ord_mase_seasonal")(spark, tmp).collect()
    assert row["n_months"] == len(ms)
    assert row["n_seasonal"] == sden and row["seasonal_abs_err"] == snum
    assert row["n_naive"] == nden and row["naive_abs_err"] == nnum
    assert math.isclose(
        row["mase"], (snum / sden) / (nnum / nden), abs_tol=2e-6
    )


def test_grubbs_and_bartlett_match_direct_python(spark):
    grows = {r["nation"]: r for r in _q("stat_grubbs_max")(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[nat[c["c_nationkey"]]].append(round(c["c_acctbal"] * 100))
    for n, xs in by_nation.items():
        a = np.array(xs, dtype=np.float64)
        g = np.abs(a - a.mean()).max() / a.std(ddof=1)
        assert math.isclose(grows[n]["grubbs_g"], g, abs_tol=2e-6), n

    [brow] = _q("stat_bartlett_qty")(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    ).collect()
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(r["q"])
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    sp2 = sum(
        (len(v) - 1) * np.var(v, ddof=1) for v in groups.values()
    ) / (nn - k)
    num = (nn - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(np.var(v, ddof=1)) for v in groups.values()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (nn - k)
    ) / (3 * (k - 1))
    assert brow["k"] == k and brow["n"] == nn
    assert math.isclose(brow["bartlett_b"], num / c, abs_tol=1e-4)


def test_kendall_w_properties_and_direct(spark):
    [row] = _q("rank_kendall_w_nations")(spark, SF).collect()
    assert 0.0 <= row["kendall_w"] <= 1.0
    # direct midrank recomputation
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nkeys = [
        r["n_nationkey"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    ]
    rev = defaultdict(int)
    years = set()
    for r in orders:
        rev[(cust[r["o_custkey"]], r["yr"])] += r["cents"]
        years.add(r["yr"])
    years = sorted(years)
    n, k = len(nkeys), len(years)
    r2sum = defaultdict(int)
    tsum = 0
    for y in years:
        vals = [(rev.get((nk, y), 0), nk) for nk in nkeys]
        cs = [v for v, _ in vals]
        cnt = Counter(cs)
        tsum += sum(t * t * t - t for t in cnt.values())
        for v, nk in vals:
            less = sum(1 for u in cs if u < v)
            r2sum[nk] += 2 * (less + 1) + cnt[v] - 1
    s4 = sum((r2sum[nk] - k * (n + 1)) ** 2 for nk in nkeys)
    w = 3 * s4 / (k * k * (n**3 - n) - k * tsum)
    assert row["n_subjects"] == n and row["k_years"] == k
    assert math.isclose(row["kendall_w"], w, abs_tol=2e-6)


def test_spectral_matches_direct_numpy(spark):
    rows = {
        r["period_days"]: r
        for r in _q("ts_spectral_peaks_daily")(spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d")
    ).collect()
    daily = Counter(r["d"] for r in orders)
    d0 = min(daily)
    for p, r in rows.items():
        a = sum(
            c * math.cos(2 * math.pi * ((d - d0).days) / p)
            for d, c in daily.items()
        )
        b = sum(
            c * math.sin(2 * math.pi * ((d - d0).days) / p)
            for d, c in daily.items()
        )
        assert abs(r["a_sum"] / 1e6 - a) < 1e-3
        assert abs(r["b_sum"] / 1e6 - b) < 1e-3
        assert math.isclose(r["power"], (a * a + b * b), rel_tol=1e-6, abs_tol=0.01)


def test_category_entropy_matches_direct_python(spark):
    rows = {
        r["nation"]: r for r in _q("cust_category_entropy")(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    per_cust = defaultdict(Counter)
    for r in li:
        per_cust[orders[r["l_orderkey"]]][brand[r["l_partkey"]]] += 1
    by_nation = defaultdict(list)
    for ck, cnts in per_cust.items():
        n = sum(cnts.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnts.values()) / n
        by_nation[nat[cust[ck]]].append(h)
    for nation, hs in by_nation.items():
        r = rows[nation]
        assert r["n_customers"] == len(hs)
        # integer micro-nat floor per customer -> mean within 2e-6 + floor slack
        assert abs(r["mean_brand_entropy"] - sum(hs) / len(hs)) < 2e-6 + 1e-6


def test_powerlaw_fit_matches_direct_numpy(spark):
    [row] = _q("graph_powerlaw_degree_fit")(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    partners = defaultdict(set)
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                partners[u].add(v)
                partners[v].add(u)
    hist = Counter(len(s) for s in partners.values())
    x = np.log(np.array(sorted(hist), dtype=np.float64))
    y = np.log(np.array([hist[d] for d in sorted(hist)], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_points"] == len(hist)
    assert math.isclose(row["slope"], slope, abs_tol=5e-5)
    assert math.isclose(row["intercept"], intercept, abs_tol=5e-4)


def test_silhouette_matches_direct_numpy(spark):
    rows = {
        r["label"]: r for r in _q("emb_silhouette_centroid")(spark, SF).collect()
    }
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r["label"]].append(
            np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
        )
    cents = {l: np.mean(v, axis=0) for l, v in by_label.items()}
    for l, vecs in by_label.items():
        a = float(
            np.mean([np.linalg.norm(v - cents[l]) for v in vecs])
        ) / 1e6
        b = min(
            float(np.linalg.norm(cents[l] - cents[m])) / 1e6
            for m in cents
            if m != l
        )
        r = rows[l]
        assert r["n_points"] == len(vecs)
        assert abs(r["a_mean"] - a) < 3e-6
        assert abs(r["b_near"] - b) < 3e-6
        sil = (b - a) / max(a, b)
        assert abs(r["silhouette"] - sil) < 1e-5


def test_markov_sink_guard_fires(spark):
    """The ev_markov_stationary irreducibility guard must actually
    RAISE on a chain with a sink type (a guard that never fires is an
    untested claim).  Build a tiny events parquet where type 'Z' is
    reachable as nxt but never appears as cur (one user, last event
    'Z'), plus a second user whose chain keeps 'A' live as a source."""
    import tempfile

    import pytest
    from pyspark.sql import Row

    rows = [
        Row(event_id=1, ts="2025-01-01 00:00:00", user_id=1,
            event_type="A", value=1.0, props="{}"),
        Row(event_id=2, ts="2025-01-01 00:01:00", user_id=1,
            event_type="Z", value=1.0, props="{}"),
        Row(event_id=3, ts="2025-01-01 00:00:00", user_id=2,
            event_type="A", value=1.0, props="{}"),
        Row(event_id=4, ts="2025-01-01 00:01:00", user_id=2,
            event_type="A", value=1.0, props="{}"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        with pytest.raises(Exception) as exc_info:
            _q("ev_markov_stationary")(spark, tmp).collect()
        assert "sink event types" in str(exc_info.value)


def test_jpeg_color_tiny_and_odd_sizes():
    """1x1 and odd color geometries must pad/crop cleanly through the
    4:2:0 MCU machinery (16x16 minimum coded unit)."""
    from planning_center_data_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(9)
    for shape in [(1, 1, 3), (3, 5, 3), (17, 15, 3), (16, 17, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for sub in ("420", "444"):
            d = decode_media(
                encode_jpeg_color(img, quality=90, subsampling=sub),
                "image/jpeg",
            )
            assert d["pixels"].shape == shape, (shape, sub)
            assert (d["width"], d["height"]) == (shape[1], shape[0])


def test_jpeg_color_wire_segment_structure():
    """Byte-level pin of the color stream's segment layout: two DQT
    tables (luma slot 0 verbatim Annex K.1 at quality 50, chroma slot
    1 verbatim K.2), four DHT tables (0x00/0x10 luma, 0x01/0x11
    chroma), SOF0 components (1, 2x2, q0), (2, 1x1, q1), (3, 1x1, q1)
    for 4:2:0, and a 3-component SOS — so a refactor can't silently
    change the wire format while the roundtrip still passes."""
    import struct

    from planning_center_data_pipeline_spark.operators import multimodal as M

    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    b = M.encode_jpeg_color(img, quality=50)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"

    zz = np.array(M._JPEG_ZZ)
    dqt = b.find(b"\xff\xdb")
    body = b[dqt + 4 :]
    assert body[0] == 0x00
    assert list(body[1:65]) == list(np.array(M._JPEG_STD_LUMA_Q)[zz])
    assert body[65] == 0x01
    assert list(body[66:130]) == list(np.array(M._JPEG_STD_CHROMA_Q)[zz])

    sof = b.find(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", b, sof + 4)
    assert (prec, h, w, nc) == (8, 16, 16, 3)
    comps = [tuple(b[sof + 10 + 3 * c : sof + 13 + 3 * c]) for c in range(3)]
    assert comps == [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]

    dht = b.find(b"\xff\xc4")
    dlen = struct.unpack_from(">H", b, dht + 2)[0]
    body = b[dht + 4 : dht + 2 + dlen]
    # walk the four tables: class/slot ids in order 00, 10, 01, 11
    ids = []
    i = 0
    while i < len(body):
        ids.append(body[i])
        nv = sum(body[i + 1 : i + 17])
        i += 17 + nv
    assert ids == [0x00, 0x10, 0x01, 0x11]

    sos = b.find(b"\xff\xda")
    assert b[sos + 4] == 3  # Ns
    assert [b[sos + 5], b[sos + 7], b[sos + 9]] == [1, 2, 3]

    # 4:4:4 variant: all components 1x1, sampling byte 0x11
    b444 = M.encode_jpeg_color(img, quality=50, subsampling="444")
    sof = b444.find(b"\xff\xc0")
    comps = [
        tuple(b444[sof + 10 + 3 * c : sof + 13 + 3 * c]) for c in range(3)
    ]
    assert comps == [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]

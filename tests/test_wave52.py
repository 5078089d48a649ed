"""Defining-property tests for wave 52 (direct-Python re-derivations
at sf0.001, independent of both engines' SQL paths)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_ansari_bradley_matches_direct_python(spark):
    [row] = _q("stat_ansari_bradley")(spark, SF).collect()
    rows = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("v"),
        )
        .collect()
    )
    vals = sorted(r["v"] for r in rows)
    nn = len(vals)

    def s2_of(v):
        rank = 1 + sum(1 for x in vals if x < v)
        t = sum(1 for x in vals if x == v)
        r2 = 2 * rank + t - 1
        return min(r2, 2 * (nn + 1) - r2)

    a = [r["v"] for r in rows if r["c_mktsegment"] == "BUILDING"]
    m, n = len(a), nn - len(a)
    w2 = sum(s2_of(v) for v in a)
    s1 = sum(s2_of(v) for v in vals)
    ssq = sum(s2_of(v) ** 2 for v in vals)
    e_w2 = m * s1 / nn
    var = m * n * (nn * ssq - s1 * s1) / (nn * nn * (nn - 1))
    z = (w2 - e_w2) / math.sqrt(var)
    assert row["n_a"] == m
    assert row["n_b"] == n
    assert row["w2"] == w2
    assert math.isclose(row["e_w2"], e_w2, abs_tol=1e-5)
    assert math.isclose(row["z"], z, abs_tol=2e-6)


def test_transfer_entropy_matches_direct_python(spark):
    [row] = _q("ev_transfer_entropy")(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("d"), "event_type")
        .collect()
    )
    types = sorted({r["event_type"] for r in ev})[:2]
    ta, tb = types[0], types[1]
    assert row["type_a"] == ta and row["type_b"] == tb
    daily = defaultdict(lambda: [0, 0])
    d0 = min(r["d"] for r in ev)
    d1 = max(r["d"] for r in ev)
    for r in ev:
        if r["event_type"] == ta:
            daily[r["d"]][0] += 1
        elif r["event_type"] == tb:
            daily[r["d"]][1] += 1
    spine = []
    d = d0
    while d <= d1:
        spine.append((daily[d][0], daily[d][1]))
        d += timedelta(days=1)
    dd = len(spine)
    sx = sum(cx for cx, _ in spine)
    sy = sum(cy for _, cy in spine)
    xs = [int(cx * dd > sx) for cx, _ in spine]
    ys = [int(cy * dd > sy) for _, cy in spine]
    cells = defaultdict(int)
    for t in range(dd - 1):
        cells[(xs[t + 1], xs[t], ys[t])] += 1
    T = dd - 1
    cx_ = defaultdict(int)
    cxy = defaultdict(int)
    cxnx = defaultdict(int)
    for (xn, x, y), c in cells.items():
        cx_[x] += c
        cxy[(x, y)] += c
        cxnx[(xn, x)] += c
    q = 0
    for (xn, x, y), c in cells.items():
        q += c * (
            round(math.log(c) * 1e6)
            + round(math.log(cx_[x]) * 1e6)
            - round(math.log(cxy[(x, y)]) * 1e6)
            - round(math.log(cxnx[(xn, x)]) * 1e6)
        )
    te = q / T / 1e6
    assert row["t_steps"] == T
    assert row["n_cells"] == len(cells)
    assert math.isclose(row["te_nats"], te, abs_tol=2e-6)


def _quant(spark):
    raw = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    out = {}
    for r in raw:
        out[r["vec_id"]] = (
            r["label"],
            np.rint(np.array(r["embedding"], dtype=np.float64) * 1e6).astype(
                np.int64
            ),
        )
    return out


def test_adjusted_rand_matches_direct_python(spark):
    [row] = _q("emb_adjusted_rand")(spark, SF).collect()
    vecs = _quant(spark)
    seeds = sorted(vecs)[:16]
    cells = {}
    for vid, (_, v) in vecs.items():
        nv = math.sqrt(float((v * v).sum()))
        best = None
        for cid in seeds:
            cv = vecs[cid][1]
            cos = float((v * cv).sum()) / nv / math.sqrt(
                float((cv * cv).sum())
            )
            # max cosine, centroid-id tie-break (smaller id wins ties)
            key = (cos, -cid)
            if best is None or key > best[0]:
                best = (key, cid)
        cells[vid] = best[1]
    cont = defaultdict(int)
    for vid, (lab, _) in vecs.items():
        cont[(lab, cells[vid])] += 1
    a = defaultdict(int)
    b = defaultdict(int)
    for (lab, cell), nij in cont.items():
        a[lab] += nij
        b[cell] += nij
    nn = len(vecs)
    sij2 = sum(n * (n - 1) for n in cont.values())
    a2 = sum(n * (n - 1) for n in a.values())
    b2 = sum(n * (n - 1) for n in b.values())
    c2 = nn * (nn - 1)
    ari = (2 * c2 * sij2 - 2 * a2 * b2) / (c2 * (a2 + b2) - 2 * a2 * b2)
    assert row["nn"] == nn
    assert row["k_labels"] == len(a)
    assert row["k_cells"] == len(b)
    assert row["nonzero_cells"] == len(cont)
    assert row["sij2_d"] == float(sij2)
    assert row["a2_d"] == float(a2)
    assert row["b2_d"] == float(b2)
    assert math.isclose(row["ari"], ari, abs_tol=2e-6)
    assert -1.0 <= row["ari"] <= 1.0


def test_dunn_centroid_matches_direct_python(spark):
    [row] = _q("emb_dunn_centroid")(spark, SF).collect()
    vecs = _quant(spark)
    pts = defaultdict(list)
    for _, (lab, v) in vecs.items():
        pts[lab].append(v)
    cents = {}
    diam_q = {}
    for lab, vs in pts.items():
        arr = np.stack(vs)
        n = len(vs)
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
        diam_q[lab] = round(2.0 * sum(dq) / n / 1e6 * 1e6)
    seps = []
    labs = sorted(cents)
    for i, la in enumerate(labs):
        for lb in labs[i + 1 :]:
            sa, na = cents[la]
            sb, nb = cents[lb]
            diff = (sa * nb - sb * na).astype(object)
            d = math.sqrt(float((diff**2).sum())) / (na * nb * 1e6)
            seps.append(round(d * 1e6))
    minsep, maxd = min(seps), max(diam_q.values())
    assert row["k_labels"] == len(labs)
    assert math.isclose(row["min_separation"], minsep / 1e6, abs_tol=2e-6)
    assert math.isclose(row["max_diameter"], maxd / 1e6, abs_tol=2e-6)
    assert math.isclose(row["dunn_index"], minsep / maxd, abs_tol=2e-6)
    assert row["dunn_index"] > 0

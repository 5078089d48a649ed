"""Defining-property tests for wave 42."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_dp_noise_is_inverse_cdf_laplace(spark):
    """released = true + noise, and noise reproduces the md5-seeded
    inverse-CDF Laplace(b=2) draw in pure Python."""
    import hashlib

    rows = _q("priv_dp_noisy_counts")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["released"] == r["true_count"] + r["noise"]
        x = int(
            hashlib.md5((r["nation"] + "#dpseed").encode()).hexdigest()[:13],
            16,
        )
        u = (x + 0.5) / float(1 << 52)
        want = round(-2.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        ))
        assert r["noise"] == want, (r["nation"], r["noise"], want)
    # the mechanism must actually perturb: not every noise is zero
    assert any(r["noise"] != 0 for r in rows)


def test_bollinger_matches_direct_python(spark):
    rows = {r["yr"]: r for r in _q("li_bollinger_outliers")(spark, SF).collect()}
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
    got = defaultdict(lambda: [0, 0])
    for i in range(19, len(daily)):
        win = [c for _, c in daily[i - 19 : i + 1]]
        n, s, q = 20, sum(win), sum(c * c for c in win)
        x = daily[i][1]
        out = (n * x - s) ** 2 > 4 * (n * q - s * s)
        yr = daily[i][0].year
        got[yr][0] += 1
        got[yr][1] += int(out)
    assert set(rows) == set(got)
    for yr, (nd, no) in got.items():
        assert (rows[yr]["n_days"], rows[yr]["n_outliers"]) == (nd, no)


def test_wma_crossover_matches_direct_python(spark):
    rows = {r["yr"]: r for r in _q("ts_wma_crossover")(spark, SF).collect()}
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
    cents = [c for _, c in daily]
    wf, ws = 28, 406  # 7*8/2, 28*29/2
    sig = []
    for i in range(27, len(cents)):
        fsum = sum((7 - j) * cents[i - j] for j in range(7))
        ssum = sum((28 - j) * cents[i - j] for j in range(28))
        sig.append((daily[i][0], int(fsum * ws > ssum * wf)))
    got = defaultdict(lambda: [0, 0, 0])
    for (d, s), (_, sp) in zip(sig[1:], sig[:-1]):
        yr = d.year
        got[yr][0] += 1
        got[yr][1] += s
        got[yr][2] += int(s != sp)
    assert set(rows) == set(got)
    for yr, (nd, fa, nc) in got.items():
        r = rows[yr]
        assert (r["n_days"], r["n_fast_above"], r["n_crossovers"]) == (
            nd,
            fa,
            nc,
        )


def test_mood_median_matches_direct_python(spark):
    [row] = _q("stat_mood_median")(spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", F.col("l_quantity").cast("bigint").alias("q"))
        .collect()
    )
    qs = sorted(r["q"] for r in li)
    n = len(qs)
    # lower median: smallest q with 2*cum >= n
    cum = 0
    med = None
    for v, t in sorted(Counter(qs).items()):
        cum += t
        if 2 * cum >= n:
            med = v
            break
    assert row["med_q"] == med
    grp = defaultdict(lambda: [0, 0])
    for r in li:
        grp[r["l_returnflag"]][0 if r["q"] <= med else 1] += 1
    tle = sum(v[0] for v in grp.values())
    tgt = sum(v[1] for v in grp.values())
    chi = 0.0
    for nle, ngt in grp.values():
        rt = nle + ngt
        for obs, colt in ((nle, tle), (ngt, tgt)):
            exp = rt * colt / (tle + tgt)
            chi += (obs - exp) ** 2 / exp
    assert math.isclose(row["chi2_stat"], chi, abs_tol=2e-6)


def test_yule_k_matches_direct_python(spark):
    import re

    rows = {r["source"]: r for r in _q("doc_yule_k")(spark, SF).collect()}
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
    for s, c in wc.items():
        n = sum(c.values())
        k = 10000.0 * (sum(v * v for v in c.values()) - n) / (n * n)
        assert rows[s]["n_tokens"] == n
        assert math.isclose(rows[s]["yule_k"], k, abs_tol=2e-6)

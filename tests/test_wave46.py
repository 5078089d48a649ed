"""Defining-property tests for wave 46."""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def _signs(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    return {
        r["vec_id"]: np.array([1 if v > 0 else 0 for v in r["embedding"]])
        for r in rows
    }


def test_bitpack_hamming_matches_direct_python(spark):
    rows = _q("emb_bitpack_hamming")(spark, SF).collect()
    signs = _signs(spark)
    by_probe = defaultdict(list)
    for r in rows:
        by_probe[r["probe_id"]].append(r)
    assert set(by_probe) == {v for v in signs if v < 20}
    for p, rs in by_probe.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == [
            1,
            2,
            3,
        ]
        # recompute all hamming distances
        want = sorted(
            (int(np.sum(signs[p] != signs[n])), n)
            for n in signs
            if n != p
        )[:3]
        got = sorted((r["hamming"], r["neighbor_id"]) for r in rs)
        assert got == want, (p, got, want)


def test_hamming_recall_in_range_and_consistent(spark):
    [row] = _q("emb_hamming_recall_at3")(spark, SF).collect()
    assert row["n_probes"] == 20
    assert 0 <= row["n_hits"] <= 3 * row["n_probes"]
    assert abs(row["recall_at3"] - row["n_hits"] / (3 * row["n_probes"])) < 1e-9
    # sign sketches of correlated vectors must do better than chance:
    # random top-3 of ~2000 would give recall ~ 0.0015
    assert row["recall_at3"] > 0.05


def test_regexp_extract_all_matches_direct_python(spark):
    rows = {r["segment"]: r for r in _q("fn_regexp_extract_all")(spark, SF).collect()}
    cust = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_mktsegment", "c_name")
        .collect()
    )
    agg = defaultdict(lambda: [0, set(), 0])
    for r in cust:
        for s in re.findall(r"[0-9]+", r["c_name"]):
            a = agg[r["c_mktsegment"]]
            a[0] += 1
            a[1].add(s)
            a[2] += int(s)
    assert set(rows) == set(agg)
    for seg, (n, ds, sv) in agg.items():
        r = rows[seg]
        assert (r["n_matches"], r["n_distinct"], r["sum_vals"]) == (
            n,
            len(ds),
            sv,
        )

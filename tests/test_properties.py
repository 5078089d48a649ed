"""Property-based tests (hypothesis) for the invariants the oracle
strategy rests on: scaled-int aggregation is partitioning-independent,
dedup keeps the deterministic survivor, the portable md5 hash family
matches its arithmetic definition, and shingling has the documented
cardinality.

Each property runs few examples with meaningful row counts — Spark
round-trips dominate, so breadth comes from the generated values, not
the example count.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.functions.exact import cents, money_sum
from planning_center_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    md5_hash60,
    shingles,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

money = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(vals=st.lists(money, min_size=1, max_size=200))
@settings(**_SETTINGS)
def test_money_sum_partitioning_independent(spark, vals):
    """The exact-cents sum must be identical at any parallelism — the
    property that makes results stable when AQE re-shapes plans."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    one = df.coalesce(1).agg(money_sum(cents("v")).alias("s")).collect()[0]["s"]
    many = df.repartition(7).agg(money_sum(cents("v")).alias("s")).collect()[0]["s"]
    assert one == many
    # and equals the Python-side mirror of the same integer arithmetic
    py = float(sum(int(round(v * 100)) for v in vals)) / 100.0
    assert one == py


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)),
        min_size=1,
        max_size=100,
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_keeps_lowest_id(spark, rows):
    df = spark.createDataFrame(rows, "k int, id int").distinct()
    out = exact_dedup(df, F.col("k"), "id").collect()
    want = {}
    for k, i in set(rows):
        want[k] = min(want.get(k, i), i)
    assert {(r["k"], r["id"]) for r in out} == set(want.items())


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_md5_hash60_matches_arithmetic_definition(spark, texts):
    """md5_hash60(x) must equal int(md5(x).hexdigest()[:15], 16) — the
    definition the DuckDB oracle mirrors with '0x'||substr cast."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {
        r["t"]: r["h"]
        for r in df.select("t", md5_hash60(F.col("t")).alias("h")).collect()
    }
    for t in set(texts):
        assert got[t] == int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


@given(
    toks=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_shingles_cardinality(spark, toks, k):
    """Distinct k-gram count == |{grams}| when n >= k, else exactly the
    whole-text singleton."""
    df = spark.createDataFrame([(toks,)], "tk array<string>")
    out = df.select(shingles(F.col("tk"), k).alias("sh")).collect()[0]["sh"]
    if len(toks) >= k:
        want = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        assert sorted(out) == sorted(want)
    else:
        assert out == [" ".join(toks)]


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 8), st.integers(0, 40)),  # (cust, month)
        min_size=1,
        max_size=120,
    )
)
@settings(**_SETTINGS)
def test_gaps_islands_matches_python_reference(spark, rows):
    """The row_number-difference islands decomposition must agree with
    a direct per-customer scan of the sorted distinct months."""
    from collections import defaultdict

    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "o_custkey int, mi long")
    w = Window.partitionBy("o_custkey").orderBy("mi")
    got = {
        r.o_custkey: (r.n_islands, r.max_run)
        for r in (
            df.dropDuplicates(["o_custkey", "mi"])
            .withColumn("grp", F.col("mi") - F.row_number().over(w))
            .groupBy("o_custkey", "grp")
            .agg(F.count("*").alias("run_len"))
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n_islands"),
                F.max("run_len").alias("max_run"),
            )
            .collect()
        )
    }
    by_cust = defaultdict(set)
    for c, m in rows:
        by_cust[c].add(m)
    for c, months in by_cust.items():
        runs, prev, cur = [], None, 0
        for m in sorted(months):
            cur = cur + 1 if prev is not None and m == prev + 1 else 1
            runs.append(cur)
            prev = m
        # run lengths at island ends = local maxima; islands = count of
        # run restarts
        n_islands = sum(
            1
            for i, m in enumerate(sorted(months))
            if i == 0 or m != sorted(months)[i - 1] + 1
        )
        assert got[c] == (n_islands, max(runs))


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), money),
        min_size=1,
        max_size=150,
    ),
    n_salts=st.sampled_from([2, 16, 64]),
)
@settings(**_SETTINGS)
def test_salted_agg_invariant_to_salt_count(spark, rows, n_salts):
    """Two-level salted aggregation must equal the plain groupBy for
    ANY salt fan-out — the re-association property cent-int sums
    guarantee and raw float sums would not."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "event_id long, k string, value double",
    )
    cents_v = F.round(F.col("value") * 100).cast("bigint")
    salted = {
        (r.k): (r.n, r.s)
        for r in (
            df.groupBy("k", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).alias("salt"))
            .agg(F.count("*").alias("pc"), F.sum(cents_v).alias("pv"))
            .groupBy("k")
            .agg(
                F.sum("pc").cast("bigint").alias("n"),
                (F.sum("pv").cast("double") / 100.0).alias("s"),
            )
            .collect()
        )
    }
    plain = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents_v).cast("double") / 100.0).alias("s"),
        )
        .collect()
    }
    assert salted == plain


# --- round-8 codec properties (no Spark needed: pure functions) -------------


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "event_id": st.one_of(
                    st.none(), st.integers(-(2**62), 2**62)
                ),
                "ts": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                "user_id": st.one_of(
                    st.none(), st.integers(-(2**31), 2**31)
                ),
                "event_type": st.one_of(st.none(), st.text(max_size=40)),
                "value": st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=True),
                ),
                "props": st.one_of(st.none(), st.text(max_size=80)),
            }
        ),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_avro_codec_roundtrips_any_record(recs):
    """Pure-Python Avro binary codec: encode/decode is the identity on
    arbitrary nullable field combinations — negative zigzags, unicode,
    infinities, nulls in every position."""
    from planning_center_data_pipeline_spark.functions.serde import (
        AvroRecordCodec,
        event_avro_schema,
    )

    codec = AvroRecordCodec(event_avro_schema())
    for rec in recs:
        back = codec.decode(codec.encode(rec))
        for k, v in rec.items():
            got = back[k]
            if isinstance(v, float):
                assert got == v or (got != got and v != v)
            else:
                assert got == v, (k, got, v)


@given(
    st.integers(1, 12),  # height
    st.integers(1, 12),  # width
    st.sampled_from([1, 3, 4]),  # channels
    st.integers(0, 4),  # filter type
    st.integers(0, 2**32 - 1),  # pixel seed
)
@settings(max_examples=120, deadline=None)
def test_png_codec_roundtrips_any_shape(h, w, ch, ftype, seed):
    """Stdlib PNG codec: pixel-exact round-trip on arbitrary shapes,
    channel layouts, and row filters."""
    import numpy as np

    from planning_center_data_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    d = decode_media(encode_png(px, filter_type=ftype), "image/png")
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["pixels"], px)

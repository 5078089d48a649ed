"""Round-6 operators: weighted reservoir sampling (A-ES) and exact
Jaro-Winkler — distribution/parity invariants beyond the driver's
hash check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_weighted_sample_partitioning_invariant(spark, sf_dir):
    """The sampled ID SET must be identical under any partitioning —
    per-row deterministic keys + TakeOrderedAndProject, no RNG state."""
    from planning_center_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = {
        r.doc_id
        for r in weighted_sample(d.repartition(1), "doc_id", "n_chars", 100)
        .select("doc_id")
        .collect()
    }
    many = {
        r.doc_id
        for r in weighted_sample(d.repartition(16), "doc_id", "n_chars", 100)
        .select("doc_id")
        .collect()
    }
    assert one == many and len(one) == 100


def test_weighted_sample_respects_weights(spark):
    """Planted distribution: half the items carry 20x weight; an A-ES
    sample of 400 of 4000 must be dominated by heavy items.  Expected
    heavy share = 20/(20+1) ~ 0.95 of inclusion mass early on; assert
    a loose lower bound (> 0.8) and that light items still appear in a
    sample this large relative to the light mass."""
    from planning_center_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 20 if i % 2 == 0 else 1) for i in range(4000)]
    df = spark.createDataFrame(rows, "item_id long, w long")
    got = weighted_sample(df, "item_id", "w", 400).collect()
    heavy = sum(1 for r in got if r.item_id % 2 == 0)
    assert len(got) == 400
    assert heavy / 400 > 0.8
    # uniform sampling would give ~200 heavy; weights must clearly beat it
    assert heavy > 300


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from planning_center_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, 7)], "item_id long, w long"
    )
    got = {r.item_id for r in weighted_sample(df, "item_id", "w", 10).collect()}
    assert got == {1, 4}


def test_jaro_winkler_literature_values():
    """Classic pairs with hand-checkable values (micro-units)."""
    from planning_center_data_pipeline_spark.functions.fuzzy import (
        jaro_winkler_micro,
    )

    assert jaro_winkler_micro("MARTHA", "MARHTA") == round(0.9611111111111111e6)
    assert jaro_winkler_micro("DIXON", "DICKSONX") == round(0.8133333333333332e6)
    assert jaro_winkler_micro("JELLYFISH", "SMELLYFISH") == round(
        0.8962962962962964e6
    )
    assert jaro_winkler_micro("abc", "abc") == 1_000_000
    assert jaro_winkler_micro("", "abc") == 0
    assert jaro_winkler_micro("", "") == 0  # DuckDB convention
    assert jaro_winkler_micro("a", "b") == 0
    # boost applies at jaro exactly 0.7 (DuckDB parity)
    assert jaro_winkler_micro("hot plate", "hot widget") == 820_000


def test_jaro_winkler_matches_duckdb_on_random_strings():
    """Property parity: the exact-rational implementation agrees with
    DuckDB's float jaro_winkler_similarity after 1e-6 quantization on
    arbitrary short strings."""
    duckdb = pytest.importorskip("duckdb")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from planning_center_data_pipeline_spark.functions.fuzzy import (
        jaro_winkler_micro,
    )

    con = duckdb.connect()
    word = st.text(alphabet="abcdexyz ", min_size=0, max_size=16)

    @settings(max_examples=300, deadline=None)
    @given(word, word)
    def agree(a, b):
        d = con.execute(
            "SELECT CAST(ROUND(jaro_winkler_similarity(?, ?) * 1000000)"
            " AS BIGINT)",
            [a, b],
        ).fetchone()[0]
        assert jaro_winkler_micro(a, b) == d

    agree()


def test_jaro_winkler_symmetry_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from planning_center_data_pipeline_spark.functions.fuzzy import (
        jaro_winkler_micro,
    )

    word = st.text(alphabet="abcdef", min_size=0, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(word, word)
    def sym(a, b):
        assert jaro_winkler_micro(a, b) == jaro_winkler_micro(b, a)
        assert 0 <= jaro_winkler_micro(a, b) <= 1_000_000

    sym()

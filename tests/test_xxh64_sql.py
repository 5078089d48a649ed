"""Pin functions/xxh64_sql against Spark's own xxhash64 and against
DuckDB execution (round-7 VERDICT item 6: the oracles for
bloom_prune_orders / doc_simhash / doc_simhash_near_dups stand on
this equivalence)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.functions.xxh64_sql import (
    hash_int,
    hash_long,
    str_hash_ctes,
    to_signed,
    xxh64_bytes,
)

LONGS = [0, 1, -1, 5, -5, 123456789, 2**62, -(2**62), 42]
INTS = [0, 1, -1, 77, 2**31 - 1, -(2**31)]
STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "hello_wo",
    "hello_world_x",
    "q" * 15,
    "r" * 16,
    "s" * 23,
    "t" * 24,
    "u" * 27,
    "x" * 31,
    "y" * 32,  # stripe path: python ref must still match Spark
    "z" * 45,
]


def test_python_ref_matches_spark(spark):
    """hash_int / hash_long / xxh64_bytes == Spark xxhash64 bit-for-bit
    on int, long, (int, long) multi-arg and string inputs."""
    exprs = []
    for i, v in enumerate(LONGS):
        exprs.append(F.expr(f"xxhash64({v}L)").alias(f"l{i}"))
    for i, v in enumerate(INTS):
        exprs.append(F.expr(f"xxhash64(cast({v} as int))").alias(f"i{i}"))
    for i, (s, k) in enumerate([(0, 7), (3, -9), (2, 123456789)]):
        exprs.append(F.expr(f"xxhash64({s}, {k}L)").alias(f"m{i}"))
    row = spark.range(1).select(*exprs).collect()[0].asDict()
    for i, v in enumerate(LONGS):
        assert row[f"l{i}"] == to_signed(hash_long(v))
    for i, v in enumerate(INTS):
        assert row[f"i{i}"] == to_signed(hash_int(v))
    for i, (s, k) in enumerate([(0, 7), (3, -9), (2, 123456789)]):
        assert row[f"m{i}"] == to_signed(hash_long(k, hash_int(s, 42)))

    sdf = spark.createDataFrame([(t,) for t in STRINGS], "tok string")
    got = {r["tok"]: r["h"] for r in sdf.select("tok", F.xxhash64("tok").alias("h")).collect()}
    for t in STRINGS:
        assert got[t] == to_signed(xxh64_bytes(t.encode())), repr(t)


def test_duckdb_sql_matches_python_ref():
    """str_hash_ctes == xxh64_bytes for ASCII < 32 bytes; NULL beyond
    (loud oracle failure instead of a silent wrong hash)."""
    vals = ",".join(f"('{t}')" for t in STRINGS)
    sql = (
        f"WITH vocab AS (SELECT tok FROM (VALUES {vals}) v(tok)),\n"
        f"{str_hash_ctes('vocab')}\nSELECT tok, hu FROM vh"
    )
    rows = duckdb.connect().execute(sql).fetchall()
    assert len(rows) == len(STRINGS)
    for tok, hu in rows:
        if len(tok) >= 32:
            assert hu is None
        else:
            assert int(hu) == xxh64_bytes(tok.encode()), repr(tok)


def test_duckdb_sql_non_ascii_guard():
    sql = (
        "WITH vocab AS (SELECT 'café' AS tok),\n"
        f"{str_hash_ctes('vocab')}\nSELECT hu FROM vh"
    )
    assert duckdb.connect().execute(sql).fetchone()[0] is None


def test_python_ref_every_small_length(spark):
    """Exhaustive small-path lengths 0..31 against Spark (one pass)."""
    toks = ["abcdefghijklmnopqrstuvwxyz012345"[:n] for n in range(32)]
    got = {
        r["tok"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .select("tok", F.xxhash64("tok").alias("h"))
        .collect()
    }
    for t in toks:
        assert got[t] == to_signed(xxh64_bytes(t.encode())), len(t)

"""Weighted reservoir sampling (Efraimidis-Spiliotopoulos A-ES) as a
distributed top-k (SURVEY.md §2.10: corpus curation sampling).

A-ES: draw u_i ~ Uniform(0,1) per item, give item i the key
u_i^(1/w_i); the weighted sample without replacement of size k is the
k largest keys.  Equivalently (monotone transform) the k largest
ln(u_i)/w_i — used here because it avoids pow's overflow corner at
tiny u.

Engine determinism: u_i is not random but md5-derived from the item id
(u = (md5_60bit(id) + 0.5) / 2^60), so the SAME sample comes out of
any engine and the query carries a full SQL oracle — the same
"deterministic pseudo-randomness" contract as the portable MinHash
twins (operators/dedup.py md5_hash60).

Scale shape: key computation is per-row expression work (no shuffle);
the top-k is orderBy+limit, which Spark executes as
TakeOrderedAndProject — per-partition top-k then a k-row merge on the
driver, never a global sort.  The sampled-id SET is partitioning-
independent (keys are per-row deterministic); only float ties at the
k-boundary could vary, and keys are 60-bit-hash-derived doubles, so
exact ties need colliding hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.operators.dedup import md5_hash60

TWO_60 = float(1 << 60)


def aes_key(id_col: Column, weight_col: Column) -> Column:
    """ln(u)/w with u = (md5_60(id)+0.5)/2^60 — A-ES sampling key
    (larger = more likely sampled; weight must be > 0)."""
    u = (md5_hash60(id_col.cast("string")).cast("double") + F.lit(0.5)) / F.lit(
        TWO_60
    )
    return F.log(u) / weight_col.cast("double")


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """The k-item A-ES weighted sample (without replacement) of `df`.
    Rows with non-positive weight are excluded (zero-weight items are
    never sampled; A-ES keys are undefined there)."""
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("aes_key", aes_key(F.col(id_col), F.col(weight_col)))
        .orderBy(F.desc("aes_key"), F.col(id_col))
        .limit(k)
    )


def aes_key_sql(id_expr: str, weight_expr: str) -> str:
    """DuckDB mirror of `aes_key` for oracles (same md5-60 u, same
    op order)."""
    h = f"CAST('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    return (
        f"ln((CAST({h} AS DOUBLE) + 0.5) / {TWO_60!r}) "
        f"/ CAST({weight_expr} AS DOUBLE)"
    )

"""Parquet table catalog for the driver-generated test data.

The engine's production sources are parquet/csv/json directories; the
test harness reads `/root/testdata/sf*/{table}.parquet`.  Explicit
schemas are NOT passed here on purpose: parquet footers carry the
authoritative schema and Spark's vectorized reader prunes columns and
pushes predicates into the scan (verify with `.explain("formatted")` —
look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Column pruning + predicate pushdown are
    handled by Catalyst; callers should select/filter early anyway so
    intent is visible in the plan.

    events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as long
    (see session.py) and we truncate ns->us here, matching how DuckDB
    reads the same file (verified: truncation, not rounding).

    The nanosAsLong conf is (re)set here at runtime, not only in our
    session factory, because callers (test harnesses, notebooks) may
    hand us a SparkSession built elsewhere without it — without the
    conf the scan fails with PARQUET_TYPE_ILLEGAL."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so plans can be written
    in SQL where that is clearer than the DataFrame API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

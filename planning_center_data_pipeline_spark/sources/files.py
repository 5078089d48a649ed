"""CSV / JSON-lines file sources with explicit schemas.

The reference ingests CSV-shaped data (dags/tasks/csv_operations.py)
and JSON documents (JSON:API payloads, dags/tasks/planning_center.py);
this module is the engine's file-format layer for both, plus writers
so round-trips are testable.  Production stance mirrors the
reference's fixed-schema discipline (SURVEY §1.3): **no inferSchema**
— inference costs an extra full scan at 100 TB and silently drifts
types between runs; every reader takes an explicit StructType or DDL
string.

Scale notes:
- CSV/JSON scans support column pruning but little predicate pushdown
  (text formats have no row-group stats) — they are LANDING formats;
  the first pipeline step rewrites them to parquet (to_parquet below).
- multiLine JSON forces a single-threaded parse per file; JSON-LINES
  splits by newline and parallelizes per HDFS block — always prefer
  it for bulk data.
- `columnNameOfCorruptRecord` + PERMISSIVE mode lands malformed rows
  in a quarantine column instead of failing the job: at 100 TB there
  WILL be bad rows, and dropping them silently (DROPMALFORMED) hides
  pipeline regressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    quarantine: bool = False,
) -> DataFrame:
    """CSV scan with an explicit schema (never inferSchema).  With
    `quarantine`, malformed rows survive with their raw text in
    `_corrupt_record` and NULLs elsewhere (PERMISSIVE mode)."""
    if quarantine:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        schema = schema.add(CORRUPT_COL, T.StringType())
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    quarantine: bool = False,
) -> DataFrame:
    """JSON-lines scan with an explicit schema.  One JSON document per
    line — the only JSON layout that parallelizes at scale."""
    if quarantine:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        schema = schema.add(CORRUPT_COL, T.StringType())
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    row_tag: str = "row",
    quarantine: bool = False,
) -> DataFrame:
    """XML scan (Spark 4 built-in format) with an explicit schema and
    the same quarantine contract as CSV/JSONL.  Row-tag splitting makes
    record extraction parallel per file split; like the other text
    formats it is a LANDING format — rewrite to parquet first thing."""
    if quarantine:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        schema = schema.add(CORRUPT_COL, T.StringType())
    reader = (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.load(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def to_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """The landing-format rewrite: text in, parquet (ZSTD) out, so
    every downstream scan gets stats, pruning, and pushdown."""
    w = df.write.mode("overwrite").option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar interchange format (Hive-lineage
    warehouses).  Same engine properties as parquet: schema in the
    footer, vectorized reader, column pruning, predicate pushdown into
    stripe/row-group stats — verify via PushedFilters in explain()."""
    return spark.read.orc(path)


def to_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite").option("compression", "zstd").format("orc")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)

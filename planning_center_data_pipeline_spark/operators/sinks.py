"""Partitioned sink operators (SURVEY.md §2.8 K1/K2).

The reference renders one in-memory CSV per list and puts each to
`s3://planningcenter/CSVs/{csv_name}.csv` (/root/reference/dags/tasks/
csv_operations.py:20-24, s3_operations.py:8-12) — single-threaded,
whole-dataset-in-memory.  The engine writes the same layout with
`partitionBy`, one prefix per partition value, parallel across
partitions, and exposes the two knobs that matter at 100 TB:

- `max_records_per_file` bounds file sizes (many uniform files beat
  few giant ones for downstream scan parallelism);
- `sort_within` makes file contents deterministic (the reference
  relies on arrival order, which Spark does not guarantee — SURVEY.md
  §2.6 W2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    out_dir: str,
    partition_by: list[str],
    fmt: str = "parquet",
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = None,
    header: bool = True,
) -> None:
    """Write one directory prefix per partition value:
    `{out_dir}/{col}={value}/part-*.{fmt}`.

    `repartition(*partition_by)` first so each output partition is
    produced by as few tasks as possible (fewer, larger files), then
    `sortWithinPartitions` for deterministic file contents."""
    shaped = df.repartition(*[df[c] for c in partition_by])
    if sort_within:
        shaped = shaped.sortWithinPartitions(*partition_by, *sort_within)
    writer = shaped.write.mode("overwrite").partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "csv":
        writer = writer.option("header", header)
    writer.format(fmt).save(out_dir)

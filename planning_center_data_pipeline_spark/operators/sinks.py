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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table in the
    session catalog: `spark.table(table)` scans then join/aggregate on
    the bucket columns WITHOUT a shuffle — the co-located-join strategy
    for repeated fact-fact joins at 100 TB (pay one clustered write,
    skip the Exchange on every subsequent join; with sortBy, skip the
    Sort too).  Bucket count is chosen once per table and must match on
    both sides of the join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A crashed previous run can leave the managed location behind with
    # no catalog entry; saveAsTable refuses to reuse it.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket columns; the plan
    contains no Exchange on either side (verify with .explain).

    The merge hint (on an input relation — hints on the join output
    don't reach the planner) keeps the sort-merge path even when one
    side is small enough to broadcast, because the point of bucketing
    is the shuffle-free sort-merge."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on
    )


def compact_partitioned(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    partition_by: list[str],
    target_rows_per_file: int,
) -> None:
    """Execute a small-files compaction: rewrite a partitioned parquet
    table so each partition lands in ceil(rows/target) files — the
    executor for the `compaction_plan_orders`-style planner
    (plans/lifecycle.py).

    Mechanism: per-partition row counts decide a file budget; every
    row gets a deterministic bucket `xxhash64(all columns) % budget`;
    one shuffle on (partition cols, bucket) clusters rows so each
    task emits at most one file per partition value it holds.  Hash
    collisions between buckets can only MERGE files (fewer, larger) —
    the budget is an upper bound, which is the compaction contract:
    never more files than planned, never a partition split finer.

    At 100 TB this is the maintenance job that keeps scan parallelism
    healthy: a fragmented table (10^6 tiny files) costs more in task
    scheduling + footer reads than the scan itself; one bounded
    shuffle fixes it, and the deterministic bucket keys make reruns
    byte-stable."""
    df = spark.read.parquet(src_dir)
    data_cols = [c for c in df.columns if c not in partition_by]
    counts = (
        df.groupBy(*partition_by)
        .agg(F.count(F.lit(1)).alias("__n_rows"))
        .withColumn(
            "__files",
            F.greatest(
                F.lit(1), F.ceil(F.col("__n_rows") / target_rows_per_file)
            ).cast("long"),
        )
        .drop("__n_rows")
    )
    planned = df.join(F.broadcast(counts), partition_by)
    bucketed = planned.withColumn(
        "__bucket", F.pmod(F.xxhash64(*data_cols), F.col("__files"))
    ).drop("__files")
    total_files = max(
        32,
        int(counts.agg(F.sum("__files")).collect()[0][0] or 1),
    )
    (
        bucketed.repartition(total_files, *partition_by, "__bucket")
        .drop("__bucket")
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(dst_dir)
    )


def write_observed(
    df: DataFrame,
    metrics: dict,
    out_dir: str | None = None,
    fmt: str = "noop",
) -> dict:
    """Write a DataFrame while collecting dataset metrics IN the same
    pass via the Observation API — the zero-extra-scan version of the
    reference's post-hoc count reconciliation
    (/root/reference/dags/tasks/webscraper.py:88-96 re-reads data to
    validate counts).

    `metrics` maps name -> aggregate Column (count/sum/min/max...);
    returns the observed values after the write action completes.  At
    100 TB this is the difference between one pass and two: the
    metrics ride the write job's tasks as accumulator-style partial
    aggregates — no second scan, no extra shuffle.

    Use for ingest row counts, null tallies, byte totals, watermark
    columns — anything a dq gate checks after a load."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    writer = observed.write.mode("overwrite")
    if fmt == "noop":
        writer.format("noop").save()
    else:
        writer.format(fmt).save(out_dir)
    return obs.get


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

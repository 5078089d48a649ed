"""SparkSession factory.

One place to set every engine-level knob so tests, bench, and the driver
contract all run the same configuration.  Scale notes (100 TB design
point): everything here is config, not code — on a real cluster the same
builder takes master/executor settings from spark-submit, AQE re-plans
shuffle partition counts at runtime, and the explicit UTC timezone keeps
timestamp semantics identical between engines and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "planning_center_data_pipeline_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Defaults follow the local test topology (`local[N]`, N from
    SPARK_GRAFT_CPUS, shuffle partitions ~= cores).  On a cluster the
    caller overrides master via spark-submit; AQE coalescing makes the
    shuffle-partition default safe at any scale.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Read TIMESTAMP(NANOS) parquet (events.ts) as long; the table
        # loader converts to a microsecond timestamp by truncation,
        # matching DuckDB's ns->us read behavior.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Named end-to-end query plans exposed through __spark_entry__.py.

Each module contributes `QUERIES: dict[name -> fn(spark, sf_dir) -> DataFrame]`
and `ORACLES: dict[name -> ANSI SQL str]` (DuckDB-runnable over the
pre-registered test-table views).  Column names are aliased identically
on both sides — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Aggregate queries + oracles from every plan module."""
    from planning_center_data_pipeline_spark.plans import (
        analytic,
        arrays,
        corpus,
        extensions,
        pandas_ops,
        reference,
        relational,
        scalars_extra,
        streaming_batch,
        tpch_extra,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        tpch_extra,
        analytic,
        arrays,
        scalars_extra,
        pandas_ops,
        reference,
        streaming_batch,
        extensions,
        corpus,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = set(oracles) - set(queries)
    assert not missing, f"oracle without query: {missing}"
    return queries, oracles

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
        advanced,
        analytic,
        arrays,
        corpus,
        extensions,
        lifecycle,
        pandas_ops,
        reference,
        relational,
        scalars_extra,
        streaming_batch,
        tpch_extra,
        wave4,
        wave4b,
        wave4c,
        wave4d,
        wave5,
    )

    modules = (
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
        lifecycle,
        advanced,
        wave4,
        wave4b,
        wave4c,
        wave4d,
        wave5,
    )
    # duplicate names across modules would silently shadow each other
    # in the dict merges below — fail loudly instead
    seen: dict[str, str] = {}
    for mod in modules:
        for n in mod.QUERIES:
            if n in seen:  # not assert: must survive python -O
                raise ValueError(
                    f"duplicate query name {n!r} in {mod.__name__} and {seen[n]}"
                )
            seen[n] = mod.__name__

    oracles: dict[str, str] = {}
    for mod in modules:
        oracles.update(mod.ORACLES)

    # The harness hash-checks a prefix of this dict's iteration order.
    # Interleave modules round-robin (oracle-backed entries first within
    # each module) so any prefix spans every operator family and spends
    # no checked slot on a rows-only (no-oracle) query before it must.
    per_mod = []
    for mod in modules:
        names = list(mod.QUERIES)
        per_mod.append(
            [n for n in names if n in oracles] + [n for n in names if n not in oracles]
        )
    queries: dict[str, QueryFn] = {}
    deferred: list[tuple[str, QueryFn]] = []
    for wave in range(max(len(m) for m in per_mod)):
        for mod, names in zip(modules, per_mod):
            if wave < len(names):
                name = names[wave]
                if name in oracles:
                    queries[name] = mod.QUERIES[name]
                else:
                    deferred.append((name, mod.QUERIES[name]))
    queries.update(deferred)
    missing = set(oracles) - set(queries)
    if missing:  # not assert: must survive python -O
        raise ValueError(f"oracle without query: {missing}")
    return queries, oracles

"""Fast (Spark-free) guards over the oracle registry: every oracle SQL
string must parse and plan in DuckDB against the fixture schemas, and
the registry must stay internally consistent. Catches SQL typos and
schema drift in seconds instead of a full crosscheck run."""

from __future__ import annotations

import duckdb
import pytest

from planning_center_data_pipeline_spark.plans import collect_all
from planning_center_data_pipeline_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_plans_in_duckdb(con):
    _, oracles = collect_all()
    bad = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


def test_registry_consistency():
    queries, oracles = collect_all()
    # oracle keys must be a subset of query names (collect_all asserts
    # this too — keep the guarantee visible in the test suite)
    assert set(oracles) <= set(queries)
    # every callable takes (spark, sf_dir)
    import inspect

    for name, fn in queries.items():
        assert len(inspect.signature(fn).parameters) == 2, name

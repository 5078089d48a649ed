"""Python Data Source tests: paginated JSON:API directory -> DataFrame
with one partition per page, nested extraction via JSON functions."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.sources import jsonapi


def _write_pages(tmp_path, n_pages=4, per_page=25):
    for p in range(n_pages):
        data = []
        for i in range(per_page):
            pid = p * per_page + i
            data.append(
                {
                    "type": "Person",
                    "id": str(pid),
                    "attributes": {
                        "name": f"Person {pid}",
                        "birthdate": "2010-03-15" if pid % 3 else None,
                        "grade": pid % 13,
                    },
                    "relationships": {
                        "primary_campus": {"data": {"type": "Campus", "id": str(pid % 2)}}
                    },
                    "links": {"self": f"https://api.example.test/people/{pid}"},
                }
            )
        (tmp_path / f"page-{p:03d}.json").write_text(
            json.dumps({"data": data, "meta": {"total_count": n_pages * per_page}})
        )
    return str(tmp_path)


def test_jsonapi_source_partitions_and_rows(spark, tmp_path):
    path = _write_pages(tmp_path)
    jsonapi.register(spark)
    df = spark.read.format("pco_jsonapi").option("path", path).load()
    assert df.rdd.getNumPartitions() == 4  # one partition per page
    assert df.count() == 100
    assert set(df.columns) == {
        "id", "type", "attributes", "relationships", "link_self", "page"
    }


def test_jsonapi_nested_extraction(spark, tmp_path):
    path = _write_pages(tmp_path)
    jsonapi.register(spark)
    df = spark.read.format("pco_jsonapi").option("path", path).load()
    people = df.select(
        F.col("id").cast("long").alias("person_id"),
        F.get_json_object("attributes", "$.name").alias("name"),
        F.get_json_object("attributes", "$.grade").cast("int").alias("grade"),
        F.get_json_object(
            "relationships", "$.primary_campus.data.id"
        ).cast("int").alias("campus_id"),
        "page",
    )
    rows = {r["person_id"]: r for r in people.collect()}
    assert rows[7]["name"] == "Person 7"
    assert rows[7]["grade"] == 7
    assert rows[7]["campus_id"] == 1
    assert rows[26]["page"] == 1
    # executor-side parse is lazy/distributed: a pushed filter only
    # touches matching rows
    assert people.filter(F.col("person_id") < 25).count() == 25


def test_jsonapi_simple_stream_reader(spark, tmp_path):
    from planning_center_data_pipeline_spark.sources.jsonapi import (
        JsonApiDataSource,
    )

    src = _write_pages(tmp_path, n_pages=3, per_page=10)
    spark.dataSource.register(JsonApiDataSource)
    q = (
        spark.readStream.format("pco_jsonapi")
        .option("path", src)
        .load()
        .writeStream.format("memory")
        .queryName("jsonapi_stream_t")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.table("jsonapi_stream_t").count()
        assert first == 30
        # two more pages arrive; only they are read in later batches
        import json as _json
        import pathlib

        for p in (3, 4):
            rows = {
                "data": [
                    {
                        "id": f"p{p}-{i}",
                        "type": "Person",
                        "attributes": {"name": f"n{i}"},
                        "relationships": {},
                        "links": {"self": f"u/{p}/{i}"},
                    }
                    for i in range(10)
                ]
            }
            pathlib.Path(src, f"page-{p:03d}.json").write_text(_json.dumps(rows))
        q.processAllAvailable()
        assert spark.table("jsonapi_stream_t").count() == 50
    finally:
        q.stop()

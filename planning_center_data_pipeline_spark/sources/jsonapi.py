"""Paginated JSON:API source as a Spark 4 Python Data Source.

The reference walks the Planning Center REST API page by page in a
single-threaded driver loop (`pco.iterate`, /root/reference/dags/tasks/
planning_center.py:17,28-32) and then issues three more HTTP calls per
person (the N+1 anti-pattern, :34,42-43).  The Spark-native answer is a
DataSource whose partitions ARE page ranges: the driver lists (or
probes) the page space once, then every executor fetches and parses its
own pages in parallel — 1000 executors = 1000 concurrent page readers,
and everything downstream (filter/join/derive) is ordinary Catalyst.

This implementation reads JSON:API documents from a directory of page
files (`page-*.json`), which is both the offline/test representation
and the on-disk cache layout a production fetcher would write.  The
HTTP fetch itself is the only piece that would change for a live API
(swap `_read_page_file` for a GET with the page offset); the partition
planning, parsing, and schema contract stay identical.

Rows are emitted in the generic JSON:API envelope shape — nested
payloads stay JSON strings so the engine's own extraction operators
(get_json_object / from_json dot-paths, SURVEY.md §2.2 P4) do the
typed extraction declaratively:

    id STRING, type STRING, attributes STRING (json),
    relationships STRING (json), link_self STRING, page INT
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

JSONAPI_SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("type", StringType(), True),
        StructField("attributes", StringType(), True),
        StructField("relationships", StringType(), True),
        StructField("link_self", StringType(), True),
        StructField("page", IntegerType(), False),
    ]
)


class JsonApiPagePartition(InputPartition):
    def __init__(self, page_no: int, path: str):
        self.page_no = page_no
        self.path = path


class JsonApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pco_jsonapi: 'path' option is required")

    def partitions(self):
        """One partition per page file — the unit of parallel fetch.
        A live-API variant lists the page count from the first page's
        `meta.total_count` and emits page-range partitions the same
        way."""
        pages = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("page-") and f.endswith(".json")
        )
        return [
            JsonApiPagePartition(i, os.path.join(self.path, f))
            for i, f in enumerate(pages)
        ]

    def read(self, partition: JsonApiPagePartition):
        """Executor-side: parse one page's JSON:API envelope."""
        yield from _read_page_rows(partition.path, partition.page_no)


def _list_pages(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path)
        if f.startswith("page-") and f.endswith(".json")
    )


def _read_page_rows(path: str, page_no: int):
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    data = doc.get("data", [])
    if isinstance(data, dict):
        data = [data]
    for res in data:
        yield (
            res.get("id"),
            res.get("type"),
            json.dumps(res.get("attributes", {}), sort_keys=True),
            json.dumps(res.get("relationships", {}), sort_keys=True),
            (res.get("links") or {}).get("self"),
            page_no,
        )


class JsonApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: pages-on-arrival. The offset is the count of
    consumed page files over the sorted listing, so each micro-batch
    reads exactly the pages that appeared since the last one —
    the incremental analogue of the reference's poll-the-API-weekly
    batch (a live variant would track the API's `meta.next` cursor in
    the offset dict instead of a file index).

    Offsets are plain dicts checkpointed by Spark; readBetweenOffsets
    replays a committed range deterministically on recovery."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pco_jsonapi: 'path' option is required")

    def initialOffset(self) -> dict:
        return {"next_idx": 0}

    def read(self, start: dict):
        pages = _list_pages(self.path)
        end = {"next_idx": len(pages)}
        # iter(list), not a generator: the prefetch cache calls next()
        # on it (empty-batch validation) and pickles the remainder to
        # ship rows into the micro-batch plan — list iterators support
        # both, generators don't pickle.
        rows = [
            row
            for i in range(start["next_idx"], len(pages))
            for row in _read_page_rows(os.path.join(self.path, pages[i]), i)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        pages = _list_pages(self.path)
        for i in range(start["next_idx"], end["next_idx"]):
            yield from _read_page_rows(os.path.join(self.path, pages[i]), i)


class JsonApiDataSource(DataSource):
    """`spark.read.format("pco_jsonapi").option("path", dir)` after
    `spark.dataSource.register(JsonApiDataSource)`; streaming via
    `spark.readStream.format("pco_jsonapi")...` picks up new page
    files per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "pco_jsonapi"

    def schema(self) -> StructType:
        return JSONAPI_SCHEMA

    def reader(self, schema: StructType) -> JsonApiReader:
        return JsonApiReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> JsonApiStreamReader:
        return JsonApiStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonApiDataSource)

"""Whole-object CSV sink as a Python DataSource WRITER (SURVEY.md
§2.8 K2) — the Spark-native re-expression of the reference's
put-object upload.

The reference renders each list to ONE in-memory CSV string
(/root/reference/dags/tasks/csv_operations.py:20-24, csv.DictWriter
with a fixed field order + header) and uploads it as a single object
(s3_operations.py:8-12, boto3 put_object to `CSVs/{csv_name}.csv`) —
single-threaded and whole-dataset-in-memory.

This writer keeps the single-object CONTRACT (downstream consumers
expect exactly one `{base}/{key}` object with one header) but
produces it with the multipart-upload protocol shape that actually
works at scale:

- every task streams its partition to a part object
  (`.parts/{key}/part-{NNNNN}`) — nothing is held in memory, tasks
  run in parallel, a retried task idempotently overwrites its own
  part;
- `commit()` on the driver concatenates the parts REPORTED BY
  SPARK'S COMMIT MESSAGES (not whatever is on disk — orphaned parts
  from dead tasks are ignored, exactly like uncommitted multipart
  parts) in partition order behind the single header, then removes
  the staging prefix;
- `abort()` removes the staging prefix, leaving no partial object.

On a real object store the same three roles map onto
CreateMultipartUpload / UploadPart / CompleteMultipartUpload; the
local filesystem stands in for the bucket here (no S3 in the
sandbox), with `objectstore.sink_uri` supplying the key layout.

Determinism: output row order is the (partition, within-partition)
order of the input DataFrame — pair with repartitionByRange +
sortWithinPartitions for byte-stable objects (SURVEY.md §2.6 W2: the
reference relies on arrival order, which Spark does not guarantee).

Usage:
    spark.dataSource.register(CsvPutDataSource)
    (df.write.format("csv_putobject")
       .option("path", "/tmp/bucket").option("key", "CSVs/people.csv")
       .mode("overwrite").save())
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


def _csv_cell(v) -> str:
    """Minimal-quoting CSV cell, csv.DictWriter-compatible: quote only
    when the value contains a delimiter/quote/newline, escape quotes
    by doubling.  None renders as '' (the reference's null->'' F3
    coalesce happens upstream, but the sink must not crash on nulls)."""
    s = "" if v is None else str(v)
    if any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


@dataclass
class _PartMessage(WriterCommitMessage):
    part_path: str
    n_rows: int
    partition_id: int = -1


class _CsvPutWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.base = options.get("path")
        self.key = options.get("key", "object.csv")
        if not self.base:
            raise ValueError("csv_putobject requires option 'path' (the bucket dir)")
        self.columns = [f.name for f in schema.fields]
        self.staging = os.path.join(self.base, ".parts", self.key.replace("/", "_"))
        self.final = os.path.join(self.base, self.key)

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt-unique part name: concurrent speculative or zombie
        # attempts of the same partition each write their OWN object, so
        # a loser can never interleave with or clobber the winner's part
        # between task commit and driver commit.  The commit message
        # (which carries part_path) selects the winning attempt; losers
        # become orphans swept with the staging prefix.
        attempt = ctx.taskAttemptId()
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(self.staging, f"part-{pid:05d}-{attempt}")
        n = 0
        # stream rows straight to the part object — per-task memory is
        # O(1) rows, unlike the reference's whole-list StringIO
        with open(part + ".tmp", "w", encoding="utf-8") as fh:
            for row in iterator:
                line = ",".join(_csv_cell(row[c]) for c in self.columns)
                if not line:  # lone empty field: '""' so the row parses
                    line = '""'  # as one field, not an empty line
                fh.write(line + "\n")
                n += 1
        os.replace(part + ".tmp", part)  # atomic: retries never expose half a part
        return _PartMessage(part_path=part, n_rows=n, partition_id=pid)

    def commit(self, messages):
        os.makedirs(os.path.dirname(self.final) or ".", exist_ok=True)
        tmp = self.final + ".tmp"
        with open(tmp, "w", encoding="utf-8") as out:
            out.write(",".join(self.columns) + "\n")
            # only parts Spark confirmed — orphans from dead/speculative
            # tasks (attempt-unique paths, never colliding with winners)
            # are ignored, like uncommitted multipart parts.  Order by
            # partition id, NOT path: attempt ids are not zero-padded.
            for m in sorted(messages, key=lambda m: m.partition_id):
                with open(m.part_path, "r", encoding="utf-8") as fh:
                    shutil.copyfileobj(fh, out)
        os.replace(tmp, self.final)
        shutil.rmtree(self.staging, ignore_errors=True)
        try:  # drop the .parts parent when this was its last upload
            os.rmdir(os.path.dirname(self.staging))
        except OSError:
            pass

    def abort(self, messages):
        shutil.rmtree(self.staging, ignore_errors=True)


class CsvPutDataSource(DataSource):
    """`df.write.format("csv_putobject")` after
    `spark.dataSource.register(CsvPutDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "csv_putobject"

    def writer(self, schema, overwrite: bool):
        return _CsvPutWriter(self.options, schema)

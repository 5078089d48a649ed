"""Object-store sink/source configuration seam (SURVEY.md §2.8 K2).

The reference uploads each rendered CSV to a hard-coded bucket key,
`s3://planningcenter/CSVs/{csv_name}.csv`
(/root/reference/dags/tasks/s3_operations.py:8-12, boto3 put_object of
a whole in-memory string).  The engine's equivalent is a *URI-scheme
parameterized* write path: the same `write_partitioned` layout runs
against `file://`, `hdfs://`, or `s3a://` destinations, with the
Hadoop S3A connector settings that make cloud writes correct and fast
collected here rather than scattered per-job.

Why a seam and not a live S3 test: this container has no network and
no hadoop-aws jars, so S3A cannot be exercised end-to-end.  Everything
below is plain public Hadoop/Spark configuration; the layout contract
itself is tested through the `file://` scheme in
tests/test_operators.py::test_write_partitioned_layout_uri_scheme.

Key facts encoded (all from public Hadoop S3A / Spark docs):

- **Never use the default FileOutputCommitter on S3A.**  Its v1/v2
  algorithms rely on directory rename being atomic and O(1); on an
  object store rename is a COPY of every byte, and v2 is additionally
  incorrect under task retry.  The S3A "magic" committer (or a staging
  committer) commits via multipart-upload completion — atomic, no
  copies.  That is the difference between a 100 TB write finishing in
  minutes vs hours, and between correct and silently-corrupt output
  under speculative execution.
- Credentials come from the provider chain (env, instance profile),
  never literals in code.
- `fs.s3a.block.size` / multipart sizing and connection pool bounds
  are the throughput knobs for 1000-executor writes.
"""

from __future__ import annotations

from urllib.parse import urlparse

# Spark-side committer wiring (public: spark-hadoop-cloud module docs).
# These make df.write.parquet("s3a://...") go through the S3A committer
# factory instead of rename-based FileOutputCommitter.
S3A_COMMITTER_CONFS: dict[str, str] = {
    "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
        "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    ),
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
}

# Connector throughput/robustness settings for large-cluster IO.
# Provider names are Hadoop's own S3A auth classes (present on both
# hadoop-aws 3.3/SDK-v1 and 3.4+/SDK-v2) — NOT com.amazonaws.* SDK-v1
# classes, which are absent under SDK v2 and would fail filesystem init.
# fs.s3a.fast.upload is likewise removed on 3.4+ (always-on) — omitted.
S3A_IO_CONFS: dict[str, str] = {
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    ),
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    "spark.hadoop.fs.s3a.multipart.size": "128M",
    "spark.hadoop.fs.s3a.block.size": "128M",
    # directory listings are eventually consistent caches; vectored
    # reads speed up parquet footer+column chunk fetches
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
}


def objectstore_confs(scheme: str = "s3a") -> dict[str, str]:
    """All session confs needed to read/write `scheme://` URIs.
    `file` and `hdfs` need nothing; `s3a` needs committer + IO tuning.
    Apply at session build time (committer classes are read per-write,
    but hadoop confs are cheapest set once)."""
    if scheme in ("file", "hdfs", ""):
        return {}
    if scheme == "s3a":
        return {**S3A_COMMITTER_CONFS, **S3A_IO_CONFS}
    raise ValueError(f"unsupported object-store scheme: {scheme!r}")


def apply_objectstore_confs(spark, scheme: str = "s3a") -> None:
    """Set the scheme's confs on a live session (hadoop confs apply via
    the runtime conf bridge; the SQL committer protocol confs are
    session-mutable)."""
    for k, v in objectstore_confs(scheme).items():
        spark.conf.set(k, v)


def sink_uri(base_uri: str, dataset: str) -> str:
    """The reference's key layout, scheme-parameterized:
    `{base_uri}/CSVs/{dataset}` for any URI scheme.  With
    `base_uri='s3a://planningcenter'` this is byte-identical to the
    reference's `Bucket='planningcenter', Key='CSVs/{csv_name}.csv'`
    (s3_operations.py:11) modulo the s3a scheme; with `file:///tmp/x`
    the same layout lands locally for tests.

    Validates the scheme is one the engine knows how to configure."""
    parsed = urlparse(base_uri)
    objectstore_confs(parsed.scheme)  # raises on unknown scheme
    return f"{base_uri.rstrip('/')}/CSVs/{dataset}"

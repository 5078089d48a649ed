"""Failure-path tests: the put-object writer's attempt/orphan/abort
protocol, the idempotent sink's manifest crash-recovery, and the
stateful sessionizer's cross-batch late-event semantics — the cases a
task retry, speculative attempt, or driver crash exercises in
production but a green-path test never does."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)


# --- put-object writer protocol ---------------------------------------------

def _writer(base: str):
    from pyspark.sql.types import StructField, StructType, StringType, LongType

    from planning_center_data_pipeline_spark.sources.putobject import (
        _CsvPutWriter,
    )

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    return _CsvPutWriter({"path": base, "key": "CSVs/out.csv"}, schema)


def test_putobject_commit_ignores_orphan_attempts(tmp_path):
    """Two attempts of the same partition write attempt-unique parts;
    commit() must assemble ONLY the parts named by Spark's commit
    messages (the winning attempts), in partition order — the zombie
    attempt's bytes never reach the final object."""
    import os

    from planning_center_data_pipeline_spark.sources.putobject import (
        _PartMessage,
    )

    base = str(tmp_path / "bucket")
    w = _writer(base)
    os.makedirs(w.staging, exist_ok=True)

    def plant(name: str, rows: list[str]) -> str:
        p = os.path.join(w.staging, name)
        with open(p, "w") as fh:
            fh.writelines(r + "\n" for r in rows)
        return p

    win0 = plant("part-00000-4", ["1,winner-a", "2,winner-b"])
    plant("part-00000-9", ["1,ZOMBIE", "2,ZOMBIE"])  # speculative attempt
    win1 = plant("part-00001-17", ["3,winner-c"])
    plant("part-00001-2", ["3,STALE"])  # failed first attempt

    w.commit(
        [
            # driver receives messages out of order; attempt ids are NOT
            # zero-padded, so path-sorting would misorder 17 vs 4
            _PartMessage(part_path=win1, n_rows=1, partition_id=1),
            _PartMessage(part_path=win0, n_rows=2, partition_id=0),
        ]
    )
    text = (tmp_path / "bucket" / "CSVs" / "out.csv").read_text()
    assert text == "id,name\n1,winner-a\n2,winner-b\n3,winner-c\n"
    assert "ZOMBIE" not in text and "STALE" not in text
    assert not (tmp_path / "bucket" / ".parts").exists()


def test_putobject_abort_leaves_no_partial_object(tmp_path):
    base = str(tmp_path / "bucket")
    w = _writer(base)
    import os

    os.makedirs(w.staging, exist_ok=True)
    with open(os.path.join(w.staging, "part-00000-1"), "w") as fh:
        fh.write("1,x\n")
    w.abort([])
    assert not (tmp_path / "bucket" / "CSVs" / "out.csv").exists()
    assert not (tmp_path / "bucket" / ".parts" / "CSVs_out.csv").exists()


def test_putobject_stale_orphan_swept_end_to_end(spark, tmp_path):
    """A part file orphaned by a previously-crashed job sits in the
    staging prefix; a fresh write must exclude it from the object and
    sweep the prefix — the filesystem analogue of an uncommitted
    multipart upload being ignored by CompleteMultipartUpload."""
    import os

    from planning_center_data_pipeline_spark.sources.putobject import (
        CsvPutDataSource,
    )

    spark.dataSource.register(CsvPutDataSource)
    base = str(tmp_path / "bucket")
    staging = os.path.join(base, ".parts", "CSVs_out.csv")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-00000-99999"), "w") as fh:
        fh.write("666,GHOST\n")

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    (
        df.repartitionByRange(2, "id")
        .sortWithinPartitions("id")
        .write.format("csv_putobject")
        .option("path", base)
        .option("key", "CSVs/out.csv")
        .mode("append")
        .save()
    )
    text = (tmp_path / "bucket" / "CSVs" / "out.csv").read_text()
    assert text == "id,name\n1,a\n2,b\n"
    assert not (tmp_path / "bucket" / ".parts").exists()


# --- idempotent-sink manifest crash recovery --------------------------------

def test_manifest_truncated_by_crash_recovers(tmp_path):
    """A driver crash mid-write used to leave a truncated batch-N.json
    that wedged every later micro-batch in json.loads.  Now manifests
    are written atomically AND an unparsable sidecar is treated as
    absent (its batch will be replayed), so the stream self-heals."""
    from planning_center_data_pipeline_spark.streaming.jobs import (
        _check_and_record_partition_ownership as check,
    )

    target = str(tmp_path / "table")
    check(target, 1, ["d1", "d2"])
    mdir = tmp_path / "table" / "_partition_manifest"
    assert json.loads((mdir / "batch-1.json").read_text()) == ["d1", "d2"]

    # simulate a pre-atomic-write crash artifact
    (mdir / "batch-2.json").write_text('["d3", "d')
    check(target, 3, ["d4"])  # must not raise
    assert not (mdir / "batch-2.json").exists()  # swept
    assert json.loads((mdir / "batch-3.json").read_text()) == ["d4"]
    # no temp files left behind by the atomic publish
    assert not list(mdir.glob("*.tmp"))

    # the guard itself still guards: batch 4 touching batch-1's value
    with pytest.raises(ValueError, match="split across batches"):
        check(target, 4, ["d1"])
    # replaying batch 1 over its own values stays legitimate
    check(target, 1, ["d1", "d2"])


# --- sessionizer cross-batch late events ------------------------------------

def test_session_late_event_extends_backward(spark, tmp_path):
    """A late-but-within-watermark event arriving in a LATER batch that
    predates an open session's start must extend the session backward
    (session_window semantics); a late event more than `gap` before the
    start must become its own, separately-closed session."""
    from planning_center_data_pipeline_spark.functions.temporal import epoch_us
    from planning_center_data_pipeline_spark.streaming.jobs import (
        read_event_stream,
        stateful_sessions_timeout,
    )

    def ev(eid, ts, uid):
        return (eid, ts, uid, "click", 0.0, "{}")

    b1 = [
        ev(1, "2024-01-01 10:00:00", 1),
        ev(2, "2024-01-01 10:10:00", 1),
        ev(3, "2024-01-01 10:00:00", 2),
    ]
    b2 = [
        # user 1: 09:55 is within gap(30m) of the open session's start
        # -> extend backward
        ev(4, "2024-01-01 09:55:00", 1),
        # user 2: 08:00 is > gap before 10:00 -> its own closed session
        ev(5, "2024-01-01 08:00:00", 2),
    ]
    b3 = [ev(99, "2034-01-01 00:00:00", -1)]  # watermark flush sentinel

    src = tmp_path / "src"
    src.mkdir()
    for name, rows in (("a", b1), ("b", b2), ("c", b3)):
        spark.createDataFrame(
            [(e, F_ts, u, t, v, p) for e, F_ts, u, t, v, p in rows],
            EVENTS_DDL.replace("ts timestamp_ntz", "ts string"),
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).coalesce(
            1
        ).write.parquet(str(src / name))
    import os
    import shutil
    import time as _time
    from pathlib import Path

    replay = tmp_path / "replay"
    replay.mkdir()
    now = _time.time()
    for i, name in enumerate(("a", "b", "c")):
        for p in Path(src / name).glob("part-*.parquet"):
            dst = replay / f"{name}_{p.name}"
            shutil.copy(p, dst)
            # strictly increasing mtimes: the file source must trigger
            # the batches in this order (tied mtimes are unstable)
            os.utime(dst, (now + i, now + i))

    out = str(tmp_path / "out")
    q = (
        stateful_sessions_timeout(
            read_event_stream(spark, str(replay)),
            gap_minutes=30,
            watermark="6 hours",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["s"], r["n_events"])
        for r in spark.read.parquet(out)
        .select(
            "user_id",
            epoch_us(F.col("session_start").cast("timestamp_ntz")).alias("s"),
            "n_events",
        )
        .collect()
        if r["user_id"] > 0
    }

    def us(s):
        import datetime as dt

        return int(
            dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
            * 1_000_000
        )

    assert (1, us("2024-01-01 09:55:00"), 3) in got  # extended backward
    assert (2, us("2024-01-01 08:00:00"), 1) in got  # disjoint prefix session
    assert (2, us("2024-01-01 10:00:00"), 1) in got  # original session kept


def test_jsonapi_http_4xx_fails_fast_without_retry():
    """A non-429 4xx (bad credential) must raise on the FIRST attempt —
    burning the retry budget on auth errors would turn one typo into
    max_retries * partitions requests against a rate-limited API."""
    import http.server
    import threading

    import pytest
    import urllib.error

    from planning_center_data_pipeline_spark.sources.jsonapi import (
        _http_get_json,
    )

    hits = {"n": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits["n"] += 1
            self.send_response(401)
            self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError):
            _http_get_json(
                f"http://127.0.0.1:{srv.server_address[1]}/x",
                {},
                max_retries=5,
                backoff_s=0.01,
            )
        assert hits["n"] == 1  # no retries on 401
    finally:
        srv.shutdown()
        srv.server_close()


# --- round-8 codec failure paths ---------------------------------------------


def test_png_decode_rejects_corruption():
    """Corrupted PNG bytes must fail LOUDLY (bad magic, flipped CRC,
    truncated IDAT, bad filter type) — a codec that limps through
    corruption poisons every downstream feature."""
    import struct
    import zlib

    import numpy as np

    from planning_center_data_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = encode_png(px)

    with pytest.raises(ValueError, match="not a PNG"):
        decode_media(b"JUNK" + good[4:], "image/png")

    # flip one IDAT payload byte -> chunk CRC must catch it
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_media(bytes(bad), "image/png")

    # valid chunk framing but truncated pixel stream
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    sig = good[:8]
    ihdr_data = good[16 : 16 + 13]
    short = zlib.compress(b"\x00" + b"\x01" * 5)  # one short row
    trunc = sig + chunk(b"IHDR", ihdr_data) + chunk(b"IDAT", short) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        decode_media(trunc, "image/png")

    # bad filter type byte inside an otherwise valid stream
    stride = 4 * 3
    rows = b"".join(b"\x07" + bytes(stride) for _ in range(4))
    badf = sig + chunk(b"IHDR", ihdr_data) + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="filter type"):
        decode_media(badf, "image/png")


def test_avro_codec_rejects_corruption():
    """Trailing garbage and truncation must raise, not return partial
    records."""
    from planning_center_data_pipeline_spark.functions.serde import (
        AvroRecordCodec,
        event_avro_schema,
    )

    codec = AvroRecordCodec(event_avro_schema())
    rec = {
        "event_id": 1, "ts": 2, "user_id": 3,
        "event_type": "x", "value": 1.5, "props": None,
    }
    good = codec.encode(rec)
    with pytest.raises(ValueError, match="trailing"):
        codec.decode(good + b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        codec.decode(good[:-3])
    # non-nullable enforcement is schema-driven: every event field is
    # nullable, so an all-None record round-trips instead
    assert codec.decode(codec.encode({k: None for k in rec})) == {
        k: None for k in rec
    }


def test_next_link_guard_tricky_urls():
    """URL shapes attackers actually use: userinfo@host confusion,
    IPv6 literals, explicit non-default ports, scheme-relative
    lookalikes."""
    import pytest as _pytest

    from planning_center_data_pipeline_spark.sources.jsonapi import (
        _safe_next_url,
    )

    hdrs = {"Authorization": "Basic abc"}
    base = "https://api.example.test/people"
    # userinfo trick: hostname is evil.test, not api.example.test
    _, h = _safe_next_url(base, "https://api.example.test@evil.test/x", hdrs)
    assert "Authorization" not in h
    # explicit non-default port = different origin
    _, h = _safe_next_url(base, "https://api.example.test:8443/people", hdrs)
    assert "Authorization" not in h
    # IPv6 literal host, cross-origin
    _, h = _safe_next_url(base, "https://[::1]:443/people", hdrs)
    assert "Authorization" not in h
    # same origin spelled with default port and userinfo stripped-less
    _, h = _safe_next_url(base, "https://api.example.test/people?offset=5", hdrs)
    assert h["Authorization"] == "Basic abc"
    # scheme-relative / protocol-less strings are refused
    for bad in ("//evil.test/people", "javascript:alert(1)", ""):
        with _pytest.raises(ValueError):
            _safe_next_url(base, bad, hdrs)

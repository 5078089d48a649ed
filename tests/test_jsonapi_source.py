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


# --- live-HTTP mode ----------------------------------------------------------


class _PagedApi:
    """stdlib http.server serving a paginated JSON:API collection:
    honors per_page/offset, reports meta.total_count (unless told not
    to), emits links.next, records Authorization headers, and can
    rate-limit (429 + Retry-After) the first hit to each offset."""

    def __init__(self, records, with_total=True, flaky_429=False):
        import http.server
        import threading

        self.records = records
        self.auth_seen = []
        self.hits_per_offset = {}
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                per_page = int(q.get("per_page", ["100"])[0])
                offset = int(q.get("offset", ["0"])[0])
                outer.auth_seen.append(self.headers.get("Authorization"))
                n = outer.hits_per_offset.get(offset, 0)
                outer.hits_per_offset[offset] = n + 1
                if flaky_429 and n == 0 and offset > 0:
                    self.send_response(429)
                    self.send_header("Retry-After", "0")
                    self.end_headers()
                    return
                chunk = outer.records[offset : offset + per_page]
                doc = {"data": chunk, "meta": {"count": len(chunk)}}
                if with_total:
                    doc["meta"]["total_count"] = len(outer.records)
                nxt = offset + per_page
                if nxt < len(outer.records):
                    doc["links"] = {
                        "next": f"http://127.0.0.1:{outer.port}/people"
                        f"?per_page={per_page}&offset={nxt}"
                    }
                body = json.dumps(doc).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}/people"

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def _records(n=100):
    return [
        {
            "type": "Person",
            "id": str(i),
            "attributes": {"name": f"Person {i}", "grade": i % 13},
            "relationships": {
                "primary_campus": {"data": {"type": "Campus", "id": str(i % 2)}}
            },
            "links": {"self": f"https://api.example.test/people/{i}"},
        }
        for i in range(n)
    ]


def test_jsonapi_http_mode_parity_with_file_mode(spark, tmp_path):
    """Live mode: one partition per page offset, row-for-row equal to
    the file mode over the same records, Basic auth header sent."""
    api = _PagedApi(_records(100))
    try:
        jsonapi.register(spark)
        live = (
            spark.read.format("pco_jsonapi")
            .option("url", api.url)
            .option("per_page", "25")
            .option("auth", "app_id:secret")
            .load()
        )
        assert live.rdd.getNumPartitions() == 4  # ceil(100/25) offset parts
        files = _write_pages(tmp_path, n_pages=4, per_page=25)
        file_df = spark.read.format("pco_jsonapi").option("path", files).load()
        live_rows = sorted(live.collect())
        # file fixture has extra attrs; compare the shared projection
        assert {(r["id"], r["type"], r["page"]) for r in live_rows} == {
            (r["id"], r["type"], r["page"]) for r in file_df.collect()
        }
        assert len(live_rows) == 100
        a = json.loads(live_rows[0]["attributes"])
        assert set(a) == {"name", "grade"}
        import base64

        expect = "Basic " + base64.b64encode(b"app_id:secret").decode()
        assert set(api.auth_seen) == {expect}
    finally:
        api.close()


def test_jsonapi_http_retries_on_429(spark):
    """Every non-probe offset 429s once (Retry-After: 0); the per-page
    readers retry and the full result still arrives."""
    api = _PagedApi(_records(60), flaky_429=True)
    try:
        jsonapi.register(spark)
        df = (
            spark.read.format("pco_jsonapi")
            .option("url", api.url)
            .option("per_page", "20")
            .option("backoff_s", "0.01")
            .load()
        )
        assert df.count() == 60
        # offsets 20 and 40 were rate-limited once then retried
        assert api.hits_per_offset[20] >= 2
        assert api.hits_per_offset[40] >= 2
    finally:
        api.close()


def test_jsonapi_http_serial_next_walk_without_total(spark):
    """API without meta.total_count: single partition walking
    links.next — the reference's pco.iterate shape, page numbers
    assigned in walk order."""
    api = _PagedApi(_records(45), with_total=False)
    try:
        jsonapi.register(spark)
        df = (
            spark.read.format("pco_jsonapi")
            .option("url", api.url)
            .option("per_page", "20")
            .load()
        )
        assert df.rdd.getNumPartitions() == 1
        rows = df.collect()
        assert len(rows) == 45
        assert {r["page"] for r in rows} == {0, 1, 2}
    finally:
        api.close()


def test_jsonapi_http_streaming_poll(spark):
    """LIVE streaming: the record-offset cursor drains the collection,
    then a later micro-batch picks up exactly the records appended
    since (the reference's poll-weekly batch, incremental)."""
    api = _PagedApi(_records(45))
    try:
        jsonapi.register(spark)
        q = (
            spark.readStream.format("pco_jsonapi")
            .option("url", api.url)
            .option("per_page", "20")
            .load()
            .writeStream.format("memory")
            .queryName("jsonapi_http_stream_t")
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.table("jsonapi_http_stream_t").count() == 45
            # 25 more records appear on the API side
            api.records.extend(
                {
                    "type": "Person",
                    "id": str(1000 + i),
                    "attributes": {"name": f"Late {i}"},
                    "relationships": {},
                    "links": {"self": f"u/late/{i}"},
                }
                for i in range(25)
            )
            q.processAllAvailable()
            got = spark.table("jsonapi_http_stream_t")
            assert got.count() == 70
            ids = {r["id"] for r in got.collect()}
            assert "1024" in ids and "0" in ids  # old + appended both present
        finally:
            q.stop()
    finally:
        api.close()


# --- hardening: next-link validation, Retry-After dates, short replay --------


def test_retry_after_parsing():
    """RFC 7231 allows delta-seconds OR an HTTP-date; garbage must fall
    back to the caller's exponential backoff instead of raising."""
    from email.utils import format_datetime
    import datetime as dt

    from planning_center_data_pipeline_spark.sources.jsonapi import (
        _retry_after_seconds,
    )

    assert _retry_after_seconds("7", 99.0) == 7.0
    assert _retry_after_seconds(None, 99.0) == 99.0
    assert _retry_after_seconds("not-a-number", 99.0) == 99.0
    # HTTP-date 10s in the future -> ~10s wait (never negative)
    future = dt.datetime.now(dt.timezone.utc) + dt.timedelta(seconds=10)
    got = _retry_after_seconds(format_datetime(future, usegmt=True), 99.0)
    assert 0.0 <= got <= 11.0
    past = dt.datetime.now(dt.timezone.utc) - dt.timedelta(seconds=60)
    assert _retry_after_seconds(format_datetime(past, usegmt=True), 99.0) == 0.0


def test_next_link_origin_guard():
    """links.next is server-controlled: non-http schemes are refused and
    the Authorization header is never forwarded cross-origin."""
    import pytest

    from planning_center_data_pipeline_spark.sources.jsonapi import (
        _safe_next_url,
    )

    hdrs = {"Authorization": "Basic abc", "Accept": "application/json"}
    base = "https://api.example.test/people"
    # same origin (default port vs explicit default port): auth kept
    url, h = _safe_next_url(base, "https://api.example.test:443/people?offset=25", hdrs)
    assert h["Authorization"] == "Basic abc"
    # different host: auth stripped, other headers kept
    url, h = _safe_next_url(base, "https://evil.example.test/people", hdrs)
    assert "Authorization" not in h and h["Accept"] == "application/json"
    # different scheme (https -> http downgrade counts as cross-origin)
    url, h = _safe_next_url(base, "http://api.example.test/people", hdrs)
    assert "Authorization" not in h
    # non-http schemes refused outright
    for bad in ("file:///etc/passwd", "ftp://x/y", "gopher://x"):
        with pytest.raises(ValueError):
            _safe_next_url(base, bad, hdrs)


def test_jsonapi_serial_walk_strips_auth_cross_origin(spark, monkeypatch):
    """A serial next-link walk that gets redirected to another host must
    not forward the credential there (end-to-end through read())."""
    from planning_center_data_pipeline_spark.sources import jsonapi as mod

    calls = []

    def fake_get(url, headers, *a, **k):
        calls.append((url, dict(headers)))
        if "evil" in url:
            return {"data": [{"id": "x", "type": "T"}]}
        return {
            "data": [{"id": "0", "type": "T"}],
            "links": {"next": "http://evil.example.test/people?offset=1"},
        }

    monkeypatch.setattr(mod, "_http_get_json", fake_get)
    reader = mod.JsonApiReader(
        {"url": "http://api.example.test/people", "auth": "id:secret"}
    )
    part = mod.JsonApiHttpPartition(0, 0, serial=True)
    rows = list(reader.read(part))
    assert len(rows) == 2
    first, second = calls
    assert "Authorization" in first[1]           # base origin: auth sent
    assert "evil" in second[0]
    assert "Authorization" not in second[1]      # cross-origin: stripped


def test_jsonapi_replay_short_range_raises(spark):
    """Checkpoint replay of a committed record range must fail loudly if
    the collection shrank (append-only assumption violated) instead of
    silently yielding fewer rows."""
    import pytest

    from planning_center_data_pipeline_spark.sources.jsonapi import (
        JsonApiStreamReader,
    )

    api = _PagedApi(_records(40))
    try:
        rdr = JsonApiStreamReader({"url": api.url, "per_page": "20"})
        rows, end = rdr.read({"consumed": 0})
        assert end == {"consumed": 40}
        # replay of the committed range works while the data is intact
        assert len(list(rdr.readBetweenOffsets({"consumed": 0}, end))) == 40
        # upstream deletion: the same replay now comes up short -> raise
        del api.records[25:]
        with pytest.raises(RuntimeError, match="not append-only"):
            list(rdr.readBetweenOffsets({"consumed": 0}, end))
    finally:
        api.close()


def test_jsonapi_http_crash_resume_from_checkpoint(spark, tmp_path):
    """Round-7 VERDICT item 7: kill a LIVE-mode streaming query MID-
    BATCH (offsets logged, batch uncommitted), restart from the same
    checkpoint, and prove no record is lost or duplicated.

    The kill is a poisoned foreachBatch that raises the first time it
    sees the batch — a real crash with checkpoint state exactly as a
    process death would leave it: offsets/<n> written, commits/<n>
    absent.  On restart Spark must reconstruct that batch through
    readBetweenOffsets (the deterministic capped-per_page re-fetch of
    the committed record range), then continue polling for appended
    records.  The sink writes per-batch directories with overwrite, so
    a replayed batch id is idempotent — the dedup burden stays on the
    source's offset contract, which is what this test pins."""
    import pytest

    api = _PagedApi(_records(60))
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    poison = tmp_path / "poison_armed"
    poison.write_text("1")
    jsonapi.register(spark)

    def sink(df, bid):
        rows = df.collect()
        if poison.exists() and any(r["id"] == "45" for r in rows):
            poison.unlink()  # one-shot: the replay must succeed
            raise RuntimeError("injected crash mid-batch")
        df.write.mode("overwrite").parquet(str(out / f"batch_{bid}"))

    def start():
        return (
            spark.readStream.format("pco_jsonapi")
            .option("url", api.url)
            .option("per_page", "20")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    try:
        q = start()
        with pytest.raises(Exception):
            q.processAllAvailable()  # dies on the batch holding id 45
        q.stop()
        # offset log must already hold the crashed batch's range
        import os

        assert os.listdir(os.path.join(ckpt, "offsets"))
        # restart: replay [0, 60) via readBetweenOffsets, then new data
        q2 = start()
        q2.processAllAvailable()
        api.records.extend(
            {
                "type": "Person",
                "id": str(2000 + i),
                "attributes": {"name": f"Late {i}"},
                "relationships": {},
                "links": {"self": f"u/late/{i}"},
            }
            for i in range(20)
        )
        q2.processAllAvailable()
        q2.stop()
        got = spark.read.parquet(str(out / "batch_*")).select("id").collect()
        ids = [r["id"] for r in got]
        expect = {str(i) for i in range(60)} | {str(2000 + i) for i in range(20)}
        assert len(ids) == 80, "lost or duplicated records across the restart"
        assert set(ids) == expect
    finally:
        api.close()

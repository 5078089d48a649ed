"""CSV / JSON-lines source round-trips with explicit schemas and
quarantine semantics (sources/files.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.sources.files import (
    read_xml,
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    to_parquet,
    write_csv,
    write_jsonl,
)

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderpriority string"
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    write_csv(o, path)
    back = read_csv(spark, path, ORDERS_DDL)
    assert back.schema.simpleString() == o.schema.simpleString()
    a = sorted(map(tuple, o.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(o, path)
    back = read_jsonl(spark, path, ORDERS_DDL).select(*o.columns)
    assert sorted(map(tuple, o.collect())) == sorted(map(tuple, back.collect()))


def test_csv_quarantine_captures_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "k,n\n"
        "a,1\n"
        "b,not_a_number\n"
        "c,3\n"
    )
    df = read_csv(
        spark, str(p), "k string, n bigint", header=True, quarantine=True
    )
    rows = {r["k"]: r for r in df.collect()}
    assert rows["a"]["n"] == 1 and rows["a"][CORRUPT_COL] is None
    assert rows["b"]["n"] is None
    assert rows["b"][CORRUPT_COL] == "b,not_a_number"
    assert len(rows) == 3  # malformed row survived, not dropped


def test_jsonl_quarantine_and_landing_rewrite(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "beta"}\n'
    )
    df = read_jsonl(
        spark, str(p), "doc_id bigint, text string", quarantine=True
    )
    # Spark requires materialization before predicates that reference
    # only the corrupt-record column (AnalysisException otherwise)
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull())
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    assert good.count() == 2 and bad.count() == 1
    # landing rewrite: text -> parquet; downstream scans read parquet
    out = str(tmp_path / "docs_parquet")
    to_parquet(good.drop(CORRUPT_COL), out)
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.collect()} == {1, 2}


def test_xml_read_and_quarantine(spark, tmp_path):
    p = tmp_path / "people.xml"
    p.write_text(
        "<people>"
        "<person><person_id>1</person_id><name>Ada</name></person>"
        "<person><person_id>oops</person_id><name>Bad</name></person>"
        "<person><person_id>2</person_id><name>Grace</name></person>"
        "</people>"
    )
    df = read_xml(
        spark,
        str(p),
        "person_id bigint, name string",
        row_tag="person",
        quarantine=True,
    ).cache()
    good = {r["name"]: r for r in df.filter(F.col(CORRUPT_COL).isNull()).collect()}
    assert set(good) == {"Ada", "Grace"}
    assert good["Ada"]["person_id"] == 1
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["person_id"] is None


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from planning_center_data_pipeline_spark.sources.files import read_orc, to_orc

    o = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    to_orc(o, path)
    back = read_orc(spark, path)
    assert back.schema.simpleString() == o.schema.simpleString()
    a = sorted(map(tuple, o.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # Predicate must reach the ORC scan (stripe-level skipping).
    plan = (
        back.filter(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic replaces ONLY the partitions
    present in the incoming batch — the idempotent daily-backfill
    write.  Static mode (the default) would wipe every partition."""
    path = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id long, part string"
    )
    base.write.partitionBy("part").parquet(path)

    patch = spark.createDataFrame([(99, "b")], "id long, part string")
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part")
        .parquet(path)
    )
    got = {
        (r.id, r.part)
        for r in spark.read.parquet(path).collect()
    }
    # partition b fully replaced; a and c untouched
    assert got == {(1, "a"), (2, "a"), (99, "b"), (4, "c")}


def test_csv_putobject_single_object_contract(spark, tmp_path):
    """The put-object writer reproduces the reference's single-object
    CSV contract (one {base}/{key} object, one header, fixed column
    order) via the multipart-shaped protocol: parallel per-task parts
    + driver commit.  Determinism comes from range partitioning +
    within-partition sort upstream."""
    from planning_center_data_pipeline_spark.objectstore import sink_uri
    from planning_center_data_pipeline_spark.sources.putobject import (
        CsvPutDataSource,
    )

    spark.dataSource.register(CsvPutDataSource)
    df = spark.createDataFrame(
        [
            (2, "b, with comma", None),
            (1, 'quote " inside', "x"),
            (3, "plain", "y"),
            (4, "line\nbreak", "z"),
        ],
        "id long, name string, note string",
    )
    base = str(tmp_path / "bucket")
    uri = sink_uri(f"file://{base}", "people.csv")
    assert uri == f"file://{base}/CSVs/people.csv"
    (
        df.repartitionByRange(2, "id")
        .sortWithinPartitions("id")
        .write.format("csv_putobject")
        .option("path", base)
        .option("key", "CSVs/people.csv")
        .mode("append")
        .save()
    )
    obj = tmp_path / "bucket" / "CSVs" / "people.csv"
    assert obj.is_file()
    # no leftover staging parts
    assert not (tmp_path / "bucket" / ".parts").exists()
    text = obj.read_text()
    lines = text.splitlines()
    assert lines[0] == "id,name,note"  # exactly one header, field order kept
    assert sum(1 for ln in lines if ln == "id,name,note") == 1
    # round-trip through Spark's own CSV reader: quoting is standard
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')  # RFC doubled-quote escaping (csv module style)
        .csv(str(obj))
        .withColumn("id", F.col("id").cast("long"))
    )
    got = {r.id: (r.name, r.note) for r in back.collect()}
    assert got == {
        1: ('quote " inside', "x"),
        2: ("b, with comma", None),
        3: ("plain", "y"),
        4: ("line\nbreak", "z"),
    }
    # range-partitioned + sorted => globally ordered rows in the object
    ids = [int(ln.split(",")[0]) for ln in lines[1:] if ln and ln[0].isdigit()]
    assert ids == sorted(ids)


def test_csv_cell_quoting_roundtrip_property():
    """Property: any row of arbitrary strings rendered by the
    put-object writer's minimal-quoting cells parses back identically
    through Python's RFC-4180 csv reader (the same dialect the
    reference's csv.DictWriter emits)."""
    import csv
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from planning_center_data_pipeline_spark.sources.putobject import _csv_cell

    cell = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(cell, min_size=1, max_size=5))
    def roundtrip(row):
        # \r\n inside cells is normalized by csv.reader to \n only in
        # universal-newline file modes; keep the writer's contract by
        # parsing with newline='' semantics (io.StringIO preserves)
        line = ",".join(_csv_cell(v) for v in row)
        if not line:  # writer quotes a lone empty field ('""')
            line = '""'
        parsed = next(csv.reader(io.StringIO(line + "\n")))
        assert parsed == row

    roundtrip()

"""End-to-end reference-pipeline tests over PCO-shaped fixtures
(SURVEY.md §5): extract→derive→validate→sink, including the exact CSV
header/field order and the silent-drop semantics of unmapped lists."""

from __future__ import annotations

import csv
import glob

from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.operators.pipeline import (
    PRESENTATION_COLUMNS,
    build_people_presentation,
    list_counts,
    render_csv_outputs,
    validate_pipeline,
)
from tests.fixtures_pco import pco_tables

AS_OF = "2024-06-15"


def _presentation(spark):
    t = pco_tables(spark)
    return build_people_presentation(
        t["lists"], t["list_results"], t["people"], t["emails"], t["phones"], AS_OF
    )


def test_presentation_rows(spark):
    rows = {
        (r["person_list"], r["person_id"]): r
        for r in _presentation(spark).collect()
    }
    # "Adults" list filtered out by the Youth predicate (P1).
    assert all(k[0] != "Adults" for k in rows)
    # p1 in two Youth lists.
    assert ("Youth Group A", "p1") in rows and ("Youth Choir", "p1") in rows
    a = rows[("Youth Group A", "p1")]
    assert a["primary_email"] == "ada@x.io"  # primary picked, not the old one
    assert a["primary_phone_number"] == "555-0100"
    assert a["grade"] == "Grade 8"
    assert a["age"] == "14 years"  # birthday exactly on as_of
    b = rows[("Youth Group A", "p2")]
    assert b["grade"] == ""  # falsy-0 quirk
    assert b["age"] == "12 years"  # 2012-02-29 at 2024-06-15
    assert b["primary_phone_number"] == ""  # no primary phone
    c = rows[("Youth Group A", "p3")]
    assert c["age"] == "" and c["grade"] == "" and c["primary_email"] == ""


def test_counts_and_validation(spark):
    t = pco_tables(spark)
    pres = _presentation(spark)
    counts = {r["list_name"]: r["actual_count"] for r in list_counts(pres).collect()}
    assert counts == {"Youth Group A": 3, "Youth Group B": 2, "Youth Choir": 1}
    verdicts = {
        r["list_name"]: r["valid"]
        for r in validate_pipeline(pres, t["expected_counts"]).collect()
    }
    # match / mismatch / missing-name -> invalid (webscraper.py:88-96)
    assert verdicts == {
        "Youth Group A": True,
        "Youth Group B": False,
        "Youth Choir": False,
    }


def test_csv_sink_layout(spark, tmp_path):
    t = pco_tables(spark)
    pres = _presentation(spark)
    out = str(tmp_path / "csvs")
    render_csv_outputs(pres, t["csv_fmt"], out)
    dirs = sorted(
        p.split("csv_name=")[1] for p in glob.glob(f"{out}/csv_name=*")
    )
    # "Youth Choir" unmapped -> silently dropped (J5); "Adults" mapped
    # but filtered upstream -> absent.
    assert dirs == ["youth_a", "youth_b"]
    files = glob.glob(f"{out}/csv_name=youth_a/*.csv")
    assert len(files) == 1
    with open(files[0]) as f:
        rows = list(csv.reader(f))
    # exact header and field order (csv_operations.py:10)
    assert rows[0] == PRESENTATION_COLUMNS
    names = [r[0] for r in rows[1:]]
    assert names == sorted(names)  # stable in-file ordering by name


def test_attach_primary_no_duplication(spark):
    # A person with two primary-flagged emails must still yield one row.
    t = pco_tables(spark)
    emails = t["emails"].union(
        spark.createDataFrame(
            [("p1", "ada2@x.io", True)],
            "person_id string, address string, primary boolean",
        )
    )
    pres = build_people_presentation(
        t["lists"], t["list_results"], t["people"], emails, t["phones"], AS_OF
    )
    rows = pres.filter(
        (F.col("person_id") == "p1") & (F.col("person_list") == "Youth Group A")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["primary_email"] == "ada2@x.io"  # deterministic: sorted

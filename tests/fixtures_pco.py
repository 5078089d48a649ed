"""Synthetic PCO-domain fixtures (FIXTURES.md §A) for the
reference-pipeline unit tests. Shapes mirror the reference's data
model: lists, membership edges, person documents, emails/phones with
primary flags, scraped expected counts, csv_fmt mapping."""

from __future__ import annotations


def pco_tables(spark):
    lists = spark.createDataFrame(
        [
            ("l1", "Youth Group A", "/lists/l1"),
            ("l2", "Youth Group B", "/lists/l2"),
            ("l3", "Adults", "/lists/l3"),  # filtered out (no "Youth")
            ("l4", "Youth Choir", "/lists/l4"),  # not in csv_fmt -> dropped at sink
        ],
        "list_id string, list_name string, list_path string",
    )
    list_results = spark.createDataFrame(
        [
            ("l1", "p1"),
            ("l1", "p2"),
            ("l1", "p3"),
            ("l2", "p2"),
            ("l2", "p4"),
            ("l3", "p5"),
            ("l4", "p1"),
        ],
        "list_id string, person_id string",
    )
    people = spark.createDataFrame(
        [
            # person_id, name, birthdate, grade
            ("p1", "Ada", "2010-06-15", 8),
            ("p2", "Ben", "2012-02-29", 0),  # leap-day birth + falsy-0 grade
            ("p3", "Cam", None, None),  # null birthdate/grade
            ("p4", "Dee", "2009-12-31", 9),
            ("p5", "Eli", "1980-01-01", None),
        ],
        "person_id string, name string, birthdate string, grade int",
    )
    emails = spark.createDataFrame(
        [
            ("p1", "ada@x.io", True),
            ("p1", "ada@old.io", False),
            ("p2", "ben@x.io", True),
            # p3: no email at all -> ''
            ("p4", "dee@x.io", False),  # no primary -> ''
            ("p5", "eli@x.io", True),
        ],
        "person_id string, address string, primary boolean",
    )
    phones = spark.createDataFrame(
        [
            ("p1", "555-0100", True),
            ("p2", "555-0101", False),  # no primary -> ''
            ("p4", "555-0103", True),
            ("p5", "555-0104", True),
        ],
        "person_id string, national string, primary boolean",
    )
    expected_counts = spark.createDataFrame(
        [
            ("Youth Group A", 3),  # matches
            ("Youth Group B", 5),  # mismatch -> invalid
            # "Youth Choir" absent -> invalid (unmatched name)
        ],
        "list_name string, expected_count int",
    )
    csv_fmt = spark.createDataFrame(
        [
            ("Youth Group A", "youth_a"),
            ("Youth Group B", "youth_b"),
            ("Adults", "adults"),
        ],
        "list_name string, csv_name string",
    )
    return {
        "lists": lists,
        "list_results": list_results,
        "people": people,
        "emails": emails,
        "phones": phones,
        "expected_counts": expected_counts,
        "csv_fmt": csv_fmt,
    }

"""Reference scalar semantics (SURVEY.md §2.3 F1-F4) as native Column
expressions — NOT UDFs, so Catalyst sees and codegens them.

Reference provenance (do-not-copy; semantics only):
  F1 calc_age          /root/reference/dags/tasks/planning_center.py:73-78
  F2 stringify_grade   /root/reference/dags/tasks/planning_center.py:81-82
  F3 null->''          /root/reference/dags/tasks/planning_center.py:65,70,78,82
  F4 date parse        /root/reference/dags/tasks/planning_center.py:75
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_iso_date(c: Column | str) -> Column:
    """F4: strict ISO yyyy-MM-dd parse (strptime('%Y-%m-%d') analogue)."""
    return F.to_date(F.col(c) if isinstance(c, str) else c, "yyyy-MM-dd")


def calc_age(birthdate: Column, as_of: Column) -> Column:
    """F1: exact calendar age string "N years", '' when birthdate is null.

    The reference computes ``year_diff - ((as_of.month, as_of.day) <
    (birth.month, birth.day))`` — a tuple compare, which handles Feb-29
    birthdays by treating them as *after* Feb-28 of a non-leap year.
    `months_between` does NOT reproduce that (it equates last-days of
    months), so we replicate the tuple compare with a struct comparison.
    Determinism: the reference uses wall-clock `date.today()`; the engine
    takes `as_of` explicitly so results are reproducible.
    """
    not_yet = F.struct(F.month(as_of), F.dayofmonth(as_of)) < F.struct(
        F.month(birthdate), F.dayofmonth(birthdate)
    )
    years = F.year(as_of) - F.year(birthdate) - not_yet.cast("int")
    return F.when(
        birthdate.isNotNull(), F.concat(years.cast("string"), F.lit(" years"))
    ).otherwise(F.lit(""))


def stringify_grade(grade: Column) -> Column:
    """F2: "Grade N" or ''.

    Deliberately preserves the reference's falsy-0 quirk: grade 0
    renders as '' (Python ``if grade`` treats 0 as missing). Flagged as
    a quirk, kept for parity.
    """
    return F.when(
        grade.isNotNull() & (grade != 0),
        F.concat(F.lit("Grade "), grade.cast("string")),
    ).otherwise(F.lit(""))


def null_to_empty(c: Column) -> Column:
    """F3: presentation-layer null convention — missing values become ''."""
    return F.coalesce(c.cast("string"), F.lit(""))

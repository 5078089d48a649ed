"""Window/sort/limit operators (SURVEY.md §2.6).

The reference's only window-shaped behavior is the Sheets range copy
(google_sheets.py:64-94): skip header rows, take a bounded slice, in
positional order. DataFrames have no positional order, so the engine
makes ordering explicit via a sort key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_copy(
    df: DataFrame,
    order_by: list[Column | str],
    start_row: int,
    end_row: int,
    columns: list[str],
) -> DataFrame:
    """W1+P5: positional slice [start_row, end_row] (1-indexed,
    inclusive) of the first N columns, under an explicit total order —
    the engine equivalent of the sheet copyPaste of rows 2-500, cols
    A-E (google_sheets.py:76-87).

    Scale note: a global row_number needs a total order; Spark computes
    it with a single-partition window, fine for bounded presentation
    slices (<= thousands of rows) which is this operator's contract.
    For unbounded offset/limit at scale use key-range predicates
    instead (filter on the sort key), which stays fully parallel.
    """
    w = Window.orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") >= start_row) & (F.col("__rn") <= end_row))
        .select(*columns)
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-K per group — rank within each group and keep k rows.
    Shuffles once on the group key; per-group sort only (no global
    sort), so it scales to arbitrary group counts."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )

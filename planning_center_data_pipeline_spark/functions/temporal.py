"""Timezone-proof temporal helpers.

The driver test tables store timestamps as parquet TIMESTAMP(MICROS)
*without* timezone, which Spark 4 reads as TIMESTAMP_NTZ
(`spark.sql.parquet.inferTimestampNTZ.enabled` defaults true).  NTZ is
the right model here — the data is wall-clock, and the DuckDB oracle
reads the same file as a naive TIMESTAMP — but `unix_micros` & friends
only accept the instant type TIMESTAMP, and casting NTZ->TIMESTAMP
makes the result depend on `spark.sql.session.timeZone` (a correctness
bug the moment a caller's session isn't UTC).

`epoch_us` instead measures wall-clock microseconds since the epoch
*as an NTZ subtraction* (timestamp_diff on two NTZ values), which is
deterministic under ANY session timezone and matches DuckDB's
`epoch_us(ts)` on naive timestamps exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def epoch_us(c: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 of a TIMESTAMP_NTZ column,
    computed wall-clock (session-timezone independent).  Mirrors DuckDB
    `epoch_us(ts)`."""
    col = F.col(c) if isinstance(c, str) else c
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, col.cast("timestamp_ntz"))

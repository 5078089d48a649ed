"""Row-serde seams: Avro (and the protobuf note) for wire formats a
Kafka/stream deployment typically carries (SURVEY.md §2.9 edge).

`to_avro`/`from_avro` are public PySpark APIs backed by the
`spark-avro` module, which ships with Spark distributions but is NOT
on this container's default classpath (submit with
--packages org.apache.spark:spark-avro_2.13:<ver>).  The functions
below pin the exact seam — schema construction and the encode/decode
expression pair — so swapping a JSON `value` for an Avro `value` in
`parse_kafka_events` is a two-line change; `avro_usable()` gates the
test the same way the protobuf-dependent transformWithState test is
gated.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame


def event_avro_schema() -> str:
    """Avro record schema for the event wire format — the Avro twin of
    streaming.jobs.KAFKA_EVENT_SCHEMA (timestamps as micros logical
    type, everything nullable like the relational schema)."""
    return json.dumps(
        {
            "type": "record",
            "name": "Event",
            "fields": [
                {"name": "event_id", "type": ["null", "long"], "default": None},
                {
                    "name": "ts",
                    "type": [
                        "null",
                        {"type": "long", "logicalType": "timestamp-micros"},
                    ],
                    "default": None,
                },
                {"name": "user_id", "type": ["null", "long"], "default": None},
                {"name": "event_type", "type": ["null", "string"], "default": None},
                {"name": "value", "type": ["null", "double"], "default": None},
                {"name": "props", "type": ["null", "string"], "default": None},
            ],
        }
    )


def encode_events_avro(df: DataFrame) -> DataFrame:
    """(all event columns) -> single binary `value` column."""
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import to_avro

    payload = F.struct(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    return df.select(to_avro(payload, event_avro_schema()).alias("value"))


def decode_events_avro(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """binary `value` -> event columns (the Avro drop-in for
    streaming.jobs.parse_kafka_events)."""
    from pyspark.sql.avro.functions import from_avro

    return raw.select(
        from_avro(value_col, event_avro_schema()).alias("e")
    ).select("e.*")


def avro_usable(spark) -> bool:
    """True when the spark-avro module is on the classpath (the
    functions exist in pyspark regardless; execution needs the jar)."""
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False

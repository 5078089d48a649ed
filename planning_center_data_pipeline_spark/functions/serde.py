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


# --- pure-Python Avro binary codec ------------------------------------------
#
# The spark-avro CONNECTOR jar is not in this container, but the Avro
# wire format itself is a public spec (https://avro.apache.org/docs/
# current/specification/): zigzag-varint longs, union-branch index
# prefix, length-prefixed UTF-8 strings, IEEE-754 LE doubles.  The
# codec below implements it for record schemas of (nullable unions of)
# primitives — enough for the event wire format — so the Avro serde
# path EXECUTES with no jar: Arrow-batched pandas round-trips in Spark,
# and the test suite cross-checks the bytes against the authoritative
# Java implementation (avro-1.12.1.jar IS on Spark's classpath) via
# py4j.  Executor-side it is a per-row map — linear, partition-
# parallel, no shuffle — so the 100 TB story is unchanged; a real
# cluster deployment would swap in the connector via --packages and
# keep the same schema/contract (encode/decode pairs above).


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


class AvroRecordCodec:
    """Binary encoder/decoder for one Avro record schema.

    Supports fields typed as a primitive or a ``["null", primitive]``
    union (logical types ride on their underlying primitive — e.g.
    timestamp-micros is just a long here, exactly how GenericDatumWriter
    treats an unconverted value).  Raises on anything fancier, loudly:
    this is a wire codec for the event schema, not a full Avro."""

    _PRIMS = {"long", "int", "double", "float", "string", "boolean", "bytes"}

    def __init__(self, schema_json: str):
        import struct as _struct

        self._struct = _struct
        sch = json.loads(schema_json)
        if sch.get("type") != "record":
            raise NotImplementedError("AvroRecordCodec: record schemas only")
        self.fields: list[tuple[str, str, bool]] = []  # (name, prim, nullable)
        for f in sch["fields"]:
            t = f["type"]
            nullable = False
            if isinstance(t, list):
                if len(t) != 2 or t[0] != "null":
                    raise NotImplementedError(
                        f"field {f['name']}: only ['null', T] unions"
                    )
                t = t[1]
                nullable = True
            if isinstance(t, dict):  # logical type annotation
                t = t["type"]
            if t not in self._PRIMS:
                raise NotImplementedError(f"field {f['name']}: type {t!r}")
            self.fields.append((f["name"], t, nullable))

    def encode(self, rec: dict) -> bytes:
        pack = self._struct.pack
        out = bytearray()
        for name, prim, nullable in self.fields:
            v = rec.get(name)
            if nullable:
                if v is None:
                    out += _zigzag_encode(0)  # union branch 0 = null
                    continue
                out += _zigzag_encode(1)  # union branch 1 = value
            elif v is None:
                raise ValueError(f"field {name} is not nullable")
            if prim in ("long", "int"):
                out += _zigzag_encode(int(v))
            elif prim == "double":
                out += pack("<d", float(v))
            elif prim == "float":
                out += pack("<f", float(v))
            elif prim == "string":
                b = str(v).encode("utf-8")
                out += _zigzag_encode(len(b)) + b
            elif prim == "bytes":
                out += _zigzag_encode(len(v)) + bytes(v)
            else:  # boolean
                out.append(1 if v else 0)
        return bytes(out)

    def decode(self, buf: bytes) -> dict:
        try:
            return self._decode(buf)
        except (IndexError, self._struct.error) as exc:
            raise ValueError(f"truncated Avro record: {exc}") from exc

    def _decode(self, buf: bytes) -> dict:
        unpack = self._struct.unpack_from
        rec: dict = {}
        pos = 0
        for name, prim, nullable in self.fields:
            if nullable:
                branch, pos = _zigzag_decode(buf, pos)
                if branch == 0:
                    rec[name] = None
                    continue
            if prim in ("long", "int"):
                rec[name], pos = _zigzag_decode(buf, pos)
            elif prim == "double":
                rec[name] = unpack("<d", buf, pos)[0]
                pos += 8
            elif prim == "float":
                rec[name] = unpack("<f", buf, pos)[0]
                pos += 4
            elif prim in ("string", "bytes"):
                n, pos = _zigzag_decode(buf, pos)
                raw = buf[pos : pos + n]
                rec[name] = raw.decode("utf-8") if prim == "string" else raw
                pos += n
            else:  # boolean
                rec[name] = buf[pos] == 1
                pos += 1
        if pos != len(buf):
            raise ValueError(f"trailing {len(buf) - pos} bytes after record")
        return rec


_EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def encode_events_avro_py(df: DataFrame) -> DataFrame:
    """(event columns) -> binary `value` column, jar-free: Arrow-batched
    mapInPandas running the pure-Python Avro binary encoder.  Timestamps
    are converted to micros (the schema's timestamp-micros logical
    type) before encoding."""
    schema_json = event_avro_schema()

    def enc(batches):
        import pandas as pd

        codec = AvroRecordCodec(schema_json)
        for pdf in batches:
            ts_us = pd.Series(
                pdf["ts"].values.astype("datetime64[us]").astype("int64"),
                index=pdf.index,
            ).where(pdf["ts"].notna(), None)
            vals = []
            for i in range(len(pdf)):
                # Arrow hands null long columns to pandas as float64 NaN
                # and null doubles as NaN — every nullable field must map
                # NaN/NaT back to the Avro null branch, not int(NaN)
                # (ValueError) or an encoded NaN (silent NULL→NaN
                # corruption on decode).  pd.isna covers NaN/None/NaT.
                rec = {}
                for c in _EVENT_COLS:
                    v = pdf[c].iloc[i]
                    rec[c] = None if pd.isna(v) else v
                # .where(cond, None) on int64 upcasts to float64 NaN, so
                # the null check must be pd.isna, not `is None`
                rec["ts"] = None if pd.isna(ts_us.iloc[i]) else int(ts_us.iloc[i])
                for k in ("event_id", "user_id"):
                    if rec[k] is not None:
                        rec[k] = int(rec[k])
                if rec["value"] is not None:
                    rec["value"] = float(rec["value"])
                vals.append(codec.encode(rec))
            yield pd.DataFrame({"value": vals})

    return df.select(*_EVENT_COLS).mapInPandas(enc, "value binary")


def decode_events_avro_py(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """binary `value` -> typed event columns (jar-free from_avro)."""

    def dec(batches):
        import pandas as pd

        codec = AvroRecordCodec(event_avro_schema())
        for pdf in batches:
            recs = [codec.decode(bytes(b)) for b in pdf[value_col]]
            out = pd.DataFrame.from_records(recs, columns=list(_EVENT_COLS))
            out["ts"] = pd.to_datetime(out["ts"], unit="us")
            yield out

    return raw.mapInPandas(
        dec,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )

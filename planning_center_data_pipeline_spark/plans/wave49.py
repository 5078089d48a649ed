"""Round-10 wave 49: color JPEG in-plan.

- mm_jpeg_color_roundtrip_agg: the 3-component 4:2:0 YCbCr JPEG path
  (encode_jpeg_color + the decoder's color branch) executed in-plan.
  Two images per document: (a) a flat COLOR card (r, g, b) from
  md5(doc_id) pushed through the full chroma pipeline with a banded
  max-error check (flat color at quality 50 measures <= 3; band 6 —
  any codec break blows the band), and (b) a gray-in-RGB card whose
  round-trip is EXACT (Cb/Cr are flat 128 because the BT.601 row sums
  are exactly 0.5, so every chroma coefficient quantizes to zero and
  the Y path is the flat-block closed form), giving a data-dependent
  value (768 * v4) both engines derive independently.

Reference parity: the reference repo has no analytics or media
surface (SURVEY.md §2); this extends the multimodal family the
100 TB training-data pipeline needs (most real-corpus JPEGs are
color 4:2:0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planning_center_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def mm_jpeg_color_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Color JPEG codec plumbing executed in-plan: md5(doc_id) hex
    chars 1-8 become four EVEN values v_k = (ord(c_{2k-1}) *
    ord(c_{2k})) % 128 * 2.  Card A is a flat (v1, v2, v3) RGB 16x16
    encoded 4:2:0 quality 50 and decoded back — ok_color pins the max
    channel error inside the measured band (<= 6; DC-only chroma
    quantization error, see wave module docstring).  Card B is flat
    gray R = G = B = v4, which round-trips EXACTLY through the color
    pipeline, so gray_sum = 16*16*3*v4 comes from REAL decoded pixels
    on the Spark side and from the closed form in the oracle.

    Scale shape: per-row Arrow-batched map (no shuffle); one row per
    document."""
    import pandas as pd

    from planning_center_data_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_jpeg_color,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            oks, sums = [], []
            for h in pdf["h"]:
                v = [
                    (ord(h[2 * k]) * ord(h[2 * k + 1])) % 128 * 2
                    for k in range(4)
                ]
                card = np.empty((16, 16, 3), dtype=np.uint8)
                card[..., 0], card[..., 1], card[..., 2] = v[0], v[1], v[2]
                back = decode_media(
                    encode_jpeg_color(card, quality=50), "image/jpeg"
                )["pixels"]
                assert back.shape == (16, 16, 3)
                err = int(
                    np.abs(back.astype(np.int64) - card.astype(np.int64)).max()
                )
                oks.append(1 if err <= 6 else 0)
                gray = np.full((16, 16, 3), v[3], dtype=np.uint8)
                gback = decode_media(
                    encode_jpeg_color(gray, quality=50), "image/jpeg"
                )["pixels"]
                sums.append(int(gback.astype(np.int64).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ok_color": oks, "gray_sum": sums}
            )

    return d.mapInPandas(
        run, "doc_id bigint, ok_color int, gray_sum bigint"
    ).orderBy("doc_id")


def _v(k: int) -> str:
    c1, c2 = 2 * k + 1, 2 * k + 2
    return f"(ord(substr(h, {c1}, 1)) * ord(substr(h, {c2}, 1))) % 128 * 2"


_COLOR_SQL = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id,
       CAST(1 AS INT) AS ok_color,
       CAST(16 * 16 * 3 * ({_v(3)}) AS BIGINT) AS gray_sum
FROM d ORDER BY doc_id
"""


QUERIES = {
    "mm_jpeg_color_roundtrip_agg": mm_jpeg_color_roundtrip_agg,
}

ORACLES = {
    "mm_jpeg_color_roundtrip_agg": _COLOR_SQL,
}

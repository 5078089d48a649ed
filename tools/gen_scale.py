"""Generate a scale-probe dataset by replicating an existing SF dir
REPL times with consistent key shifting — for PERFORMANCE scaling
measurements only (correctness stays pinned to the driver's testdata).

Replication rules (replica r in 0..REPL-1, r=0 is the original):
- dims `region`/`nation` are fixed (real TPC-H scaling keeps them
  constant too);
- every entity key shifts by r*stride (stride = max(key)+1 computed
  from the source), so FK joins keep exactly the same per-key fan-out
  and the join/shuffle volume scales linearly like real growth;
- `documents.text` gets a per-replica salt token appended, so
  cross-replica EXACT/near duplicates don't explode the dedup
  workload beyond its real density;
- `embeddings.embedding` goes through a per-replica signed
  permutation of dimensions: inner products WITHIN a replica are
  preserved exactly (same near-dup structure per replica), while
  cross-replica cosines decorrelate like fresh draws; labels shift so
  label-blocked operators keep their designed block granularity.

Usage: python tools/gen_scale.py [src_sf_dir] [dst_dir] [repl]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402

# table -> columns that shift by the named entity's stride
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid", "label": "label"},
}

# entity -> (table, column) the stride is measured from
STRIDE_FROM = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
    "label": ("embeddings", "label"),
}


def _signed_perm(r: int, dims: int) -> tuple[list[int], list[int]]:
    """Deterministic signed permutation for replica r: a permutation of
    dims and +-1 signs, both sha256-derived.  r=0 is identity."""
    if r == 0:
        return list(range(dims)), [1] * dims
    idx = sorted(
        range(dims),
        key=lambda i: hashlib.sha256(f"perm:{r}:{i}".encode()).digest(),
    )
    signs = [
        1 if hashlib.sha256(f"sign:{r}:{i}".encode()).digest()[0] & 1 else -1
        for i in range(dims)
    ]
    return idx, signs


def replicate(df: DataFrame, table: str, repl: int, strides: dict[str, int]) -> DataFrame:
    parts = []
    for r in range(repl):
        p = df
        for col, ent in SHIFTS.get(table, {}).items():
            p = p.withColumn(col, F.col(col) + F.lit(r * strides[ent]))
        if table == "documents" and r > 0:
            p = p.withColumn("text", F.concat(F.col("text"), F.lit(f" zqsalt{r}")))
        if table == "embeddings" and r > 0:
            idx, signs = _signed_perm(r, 64)
            p = p.withColumn(
                "embedding",
                F.array(
                    *[
                        (F.element_at("embedding", idx[i] + 1) * F.lit(float(signs[i]))).cast("float")
                        for i in range(64)
                    ]
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="gen_scale")
    Path(dst).mkdir(parents=True, exist_ok=True)

    strides = {}
    for ent, (tbl, col) in STRIDE_FROM.items():
        m = (
            spark.read.parquet(f"{src}/{tbl}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        strides[ent] = int(m) + 1
    print(f"strides: {strides}", file=sys.stderr)

    for tbl in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        out = df if tbl in ("region", "nation") else replicate(df, tbl, repl, strides)
        out.repartition(8).write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {out.count()} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

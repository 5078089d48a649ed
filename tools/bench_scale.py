"""Scale probe: time the most expensive queries at two SF dirs and
record the scaling ratio + exponent.

With a 10x row-count step, exponent = log10(t_big / t_small).  ~1.0 is
linear, <1 means fixed overheads still dominate, >1.3 is super-linear
and gets a ticket.  Timings are min-of-2 per (query, sf).

Usage: python tools/bench_scale.py [small_dir] [big_dir] [top_n]
       python tools/bench_scale.py --only q1 q2 ...   # probe just these
                                                      # and merge into the
                                                      # existing JSON
       python tools/bench_scale.py --pair SMALL BIG FACTOR LABEL \
           --only q1 q2 ...   # probe an extra decade (e.g. sf1->sf4)
                              # and record under queries@LABEL
Writes BENCH_SCALE.json; summary table to stdout for SCALE.md.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    only: list[str] | None = None
    label: str | None = None
    argv = sys.argv[1:]
    small, big, factor = "/root/testdata/sf0.1", "/tmp/sf1", 10.0
    if argv and argv[0] == "--pair":
        # an extra scaling decade (e.g. sf1 -> sf4) recorded under its
        # own label so the canonical sf0.1 -> sf1 rows stay intact
        small, big, factor, label = (
            argv[1], argv[2], float(argv[3]), argv[4]
        )
        argv = argv[5:]
    if argv and argv[0] == "--only":
        only = argv[1:]
        argv = []
    if argv:
        small = argv[0]
        big = argv[1] if len(argv) > 1 else big
    top_n = int(argv[2]) if len(argv) > 2 else 20

    qs = entrymod.queries()
    detail_path = REPO / "BENCH_DETAIL.json"
    prev = json.loads(detail_path.read_text())["queries"] if detail_path.exists() else {}
    ranked = [n for n in sorted(prev, key=prev.get, reverse=True) if n in qs]
    targets = ranked[:top_n]
    # always probe the new scale-path and flagship queries
    for extra in ("emb_near_dup_lsh", "q1_pricing_summary", "doc_minhash_lsh",
                  "graph_triangle_count", "emb_near_dup_pairs",
                  # twin pairs: keep the expression primary and the
                  # pandas/GEMM twin side by side in the scale record
                  "asof_purchase_last_click", "asof_cogrouped_pandas",
                  "emb_knn_classify", "ev_user_share_pandas",
                  "doc_jaccard_prefix_filter", "doc_jaccard_rare_prefix", "li_scd2_pit_revenue",
                  "jw_best_match_parts", "doc_weighted_sample",
                  # wave-7: spatial grid join and iterative BFS
                  "geo_radius_pairs", "graph_bfs_hops", "ev_cusum_shift",
                  "emb_hard_negatives", "stat_bootstrap_ci",
                  "attr_linear_touch", "ev_capped_sessions",
                  "doc_common_substring_pairs", "rec_training_set_e2e",
                  "ts_rolling_median", "data_diff_report",
                  # wave-8: sketch heavy hitters, sampling, IVF-PQ, survival
                  "freq_heavy_hitters", "rec_negative_sampling",
                  "emb_ivfpq_adc", "surv_hazard_curve",
                  # wave-9: apriori triples, k-anon, SLA percentiles
                  "ev_basket_triples", "priv_k_anonymity",
                  "li_ship_sla_percentiles", "emb_dim_trunc_recall",
                  # wave-10: basket self-join CF, rank-sum AUC, journeys
                  "cf_item_item_cosine", "ml_auc_rank", "ml_decile_lift",
                  "ev_markov_transitions", "ev_top_journeys",
                  "ev_retention_triangle",
                  # wave-11: iterative integer PageRank, bucketed
                  # prefix sums, tokenizer stats
                  "graph_pagerank_parts", "cust_abc_pareto",
                  "cust_rfm_global_quintiles", "doc_zipf_rankfreq",
                  "doc_tokenizer_fertility", "ml_threshold_metrics",
                  # wave-12: backlog curve, HHI, U test, OLS, heatmap
                  "ord_open_backlog_daily", "sup_part_hhi",
                  "stat_mann_whitney", "li_discount_elasticity",
                  "ev_dow_hour_heatmap",
                  # wave-13: incremental dedup, rate anomalies
                  "doc_incremental_dedup_merge", "ord_reorder_intervals",
                  "ev_daily_poisson_outliers", "doc_boilerplate_prefixes",
                  "ev_user_lifespan_days",
                  # wave-14: KS, change-point, decile migration
                  "ml_calibration_bins", "stat_ks_two_sample",
                  "ts_changepoint_daily", "cust_decile_migration",
                  # wave-15: filter funnel, bounce rate
                  "doc_filter_funnel", "ev_bounce_rate",
                  # wave-16/17: threshold sweep, chunker, Welch, skew
                  "emb_dup_threshold_sweep", "doc_rag_chunks",
                  "stat_welch_t", "li_margin_waterfall",
                  "priv_l_diversity", "data_skew_report",
                  # wave-18: drift, probe-set neighbors, profiler
                  "emb_label_centroid_drift", "graph_common_neighbors",
                  "data_profile_orders",
                  # wave-19: ACF, price-volume mix, dedup savings
                  "ts_autocorrelation", "li_price_volume_mix",
                  "doc_dedup_savings",
                  # wave-20: FK audit, boxplot
                  "rel_integrity_audit", "ev_type_value_boxplot",
                  # wave-21: skip-grams, stopword leakage
                  "ev_skipgram_pairs", "doc_stopword_leakage"):
        if extra in qs and extra not in targets:
            targets.append(extra)
    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        targets = only

    # Auto disk-health preflight (round-11 verdict item 2): below 200
    # MB/s sustained the probe would measure the throttled disk, not
    # the plan — switch shuffle to tmpfs and stamp the artifact.
    from diskguard import cleanup_tmpfs, shuffle_conf_for_probe

    extra, medium, mb_s = shuffle_conf_for_probe()
    print(f"# shuffle medium: {medium} (disk {mb_s} MB/s)", file=sys.stderr)
    import atexit

    atexit.register(cleanup_tmpfs, extra)  # fires on ANY exit path
    spark = get_spark(app_name="bench_scale", extra_conf=extra)
    # warmup
    try:
        qs[targets[-1]](spark, small).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    def time_one(name: str, sf_dir: str, n: int = 2) -> tuple[float | None, str | None]:
        best, err = None, None
        for _ in range(n):
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception as exc:
                err = f"{type(exc).__name__}: {exc}"[:200]
                break
        return best, err

    def fill(row: dict) -> None:
        if row.get("small") and row.get("big"):
            row["ratio"] = round(row["big"] / row["small"], 2)
            row["exponent"] = round(math.log(row["ratio"]) / math.log(factor), 2)

    results = {}
    for name in targets:
        row = {}
        for key, sf_dir in (("small", small), ("big", big)):
            best, err = time_one(name, sf_dir)
            row[key] = round(best, 3) if best is not None else None
            if err:
                row[f"{key}_err"] = err
        fill(row)
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    # Outlier re-measurement (bench.py's lesson): an exponent below
    # -0.05 means the SMALL run was contended (10x data cannot be
    # faster); above 1.1 often means the BIG run was.  Re-time both
    # sides and keep the mins before anyone reads the number.
    for name, row in results.items():
        e = row.get("exponent")
        if e is None or -0.05 <= e <= 1.1:
            continue
        for key, sf_dir in (("small", small), ("big", big)):
            best, _ = time_one(name, sf_dir)
            if best is not None and row.get(key):
                row[key] = round(min(row[key], best), 3)
        fill(row)
        print(f"# remeasured {name}: {row}", file=sys.stderr)

    path = REPO / "BENCH_SCALE.json"
    if label is not None:
        out = json.loads(path.read_text()) if path.exists() else {}
        key = f"queries@{label}"
        out.setdefault(key, {})
        out[key].update(results)
        out[f"pair@{label}"] = {
            "small_dir": small, "big_dir": big, "factor": factor,
            "shuffle_medium": medium, "disk_mb_s": mb_s,
        }
    elif only is not None and path.exists():
        out = json.loads(path.read_text())
        out["queries"].update(results)
        out["shuffle_medium"] = medium
        out["disk_mb_s"] = mb_s
    else:
        out = {"small_dir": small, "big_dir": big, "factor": factor,
               "shuffle_medium": medium, "disk_mb_s": mb_s,
               "queries": results}
    path.write_text(json.dumps(out, indent=1))
    flagged = {n: r for n, r in results.items() if r.get("exponent", 0) > 1.3}
    print(json.dumps({"n": len(results), "superlinear": list(flagged)}))
    for n, r in sorted(results.items(), key=lambda kv: -(kv[1].get("exponent") or -9)):
        print(f"| {n} | {r.get('small')} | {r.get('big')} | {r.get('ratio')} | {r.get('exponent')} |")
    spark.stop()


if __name__ == "__main__":
    main()

"""Streaming scale probe driver: replay sf1 events through the two
heaviest stateful streaming operators and record throughput + state
boundedness to STREAM_SCALE.json.

Usage: python tools/stream_scale.py [events_src] [n_chunks]
Default events_src: /tmp/sf1/events.parquet (tools/gen_scale.py output).

Pass criteria (asserted here, mirrored as a pytest in
tests/test_streaming.py at sf0.1):
- sessions: max state rows <= distinct users (keyed state), i.e. state
  scales with key cardinality, not input size.
- interval join: max state rows << total input rows (watermark horizon
  eviction), and final state doesn't equal cumulative input.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402
from planning_center_data_pipeline_spark.streaming import jobs  # noqa: E402
from planning_center_data_pipeline_spark.streaming.scale_probe import (  # noqa: E402
    prepare_time_ordered_replay,
    run_metered,
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1/events.parquet"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    replay = "/tmp/stream_replay"

    spark = get_spark(app_name="stream_scale")
    spark.sparkContext.setLogLevel("ERROR")
    n_rows = prepare_time_ordered_replay(spark, src, replay, n_chunks)
    n_users = spark.read.parquet(src).select("user_id").distinct().count()

    results: dict[str, dict] = {"rows_total": n_rows, "n_users": n_users}

    stream = jobs.read_event_stream(spark, replay)
    sess = jobs.stateful_sessions_timeout(
        stream, gap_minutes=30, watermark="1 hour"
    )
    r = run_metered(sess, "scale_sessions", "append")
    r["bounded"] = r["max_state_rows"] <= n_users
    results["stateful_sessions_timeout"] = r
    print("sessions:", json.dumps(r), flush=True)

    stream2 = jobs.read_event_stream(spark, replay)
    ij = jobs.interval_join_clicks_purchases(stream2, watermark="2 hours")
    r2 = run_metered(ij, "scale_interval_join", "append")
    # horizon = watermark (2h) + interval (1h) + slack; rate = rows/sec
    # of EVENT TIME.  30 days of data -> horizon holds ~rows * 4h/720h.
    r2["bounded"] = r2["max_state_rows"] < n_rows * 0.2
    results["interval_join_clicks_purchases"] = r2
    print("interval_join:", json.dumps(r2), flush=True)

    # dedup state = one row per event_id inside the watermark horizon —
    # rate x horizon, never total input
    dd = jobs.dedup_events(
        jobs.read_event_stream(spark, replay), watermark="2 hours"
    )
    r3 = run_metered(dd, "scale_dedup", "append")
    r3["bounded"] = r3["max_state_rows"] < n_rows * 0.2
    results["dedup_events"] = r3
    print("dedup:", json.dumps(r3), flush=True)

    # native session_window aggregation (JVM state store) next to the
    # applyInPandasWithState sessionizer above.  NOTE the different
    # state model: session_window keeps one state row per BUFFERED
    # EVENT until the watermark finalizes its session (state ~ rate x
    # (watermark + trigger granularity) — here dominated by the 2-day
    # replay chunks, ~66k rows), while the pandas sessionizer merges
    # into 3 ints per user as events arrive (~15k rows).  Both are
    # bounded by the moving horizon, NOT by total input — that is the
    # assertion; the constant-per-key contrast is the reason the
    # custom operator exists.
    sw = jobs.session_counts(
        jobs.read_event_stream(spark, replay), gap="30 minutes"
    )
    r4 = run_metered(sw, "scale_session_window", "append")
    r4["bounded"] = r4["max_state_rows"] < n_rows * 0.2
    results["session_window_native"] = r4
    print("session_window:", json.dumps(r4), flush=True)

    # stratified A-ES reservoir: the most extreme state model — O(k)
    # per stratum (k=20, 5 strata -> ~100 state rows vs 1M input),
    # constant forever by construction
    rv = jobs.streaming_weighted_reservoir(
        jobs.read_event_stream(spark, replay), k=20
    )
    r5 = run_metered(rv, "scale_reservoir", "update")
    r5["bounded"] = r5["max_state_rows"] <= 20 * 8  # k x |event types| slack
    results["weighted_reservoir"] = r5
    print("reservoir:", json.dumps(r5), flush=True)

    # Markov transition counter: O(1) state per user (last event's
    # timestamp + type), so state rows == key cardinality like the
    # pandas sessionizer — never input size
    tc = jobs.stateful_transition_counts(
        jobs.read_event_stream(spark, replay)
    )
    r6 = run_metered(tc, "scale_transitions", "append")
    r6["bounded"] = r6["max_state_rows"] <= n_users
    results["stateful_transition_counts"] = r6
    print("transitions:", json.dumps(r6), flush=True)

    ok = all(
        results[k]["bounded"]
        for k in (
            "stateful_sessions_timeout",
            "interval_join_clicks_purchases",
            "dedup_events",
            "session_window_native",
            "weighted_reservoir",
            "stateful_transition_counts",
        )
    )
    results["all_bounded"] = ok
    (REPO / "STREAM_SCALE.json").write_text(json.dumps(results, indent=1))
    print(json.dumps({"all_bounded": ok, "file": "STREAM_SCALE.json"}))
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

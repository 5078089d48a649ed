"""One-config-per-JVM scale probe with an explicit shuffle-partition knob.

Round-10's verdict flagged graph_triangle_count's sf1->sf4 exponent of
1.16 with SCALE.md blaming fixed ``spark.sql.shuffle.partitions=32``
(256 MB -> 1 GB partitions) — an *asserted* excuse.  This script is the
measurement: run ONE (query, sf_dir, partitions) configuration per JVM
(the round-10 GC-thrash lesson: mixing heavy graph probes in a shared
128 GiB JVM poisons later probes), min-of-N inside the JVM, and print a
single JSON line.  The orchestrating shell loops over configurations.

Usage:
    python tools/probe_scaled_partitions.py QUERY SF_DIR PARTITIONS [REPS]

Prints: {"query":…, "sf_dir":…, "partitions":…, "times":[…], "min":…}

Set PROBE_SHM_SHUFFLE=1 to put spark.local.dir on /dev/shm (tmpfs):
on a box whose virtual disk is throttled (round-11 measured 20-40
MB/s — two orders of magnitude below normal), shuffle-heavy probes
measure the DISK, not the plan; tmpfs shuffle isolates the plan's
CPU/memory cost, which is what the partition-scaling question asks.
The honest record keeps both numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    query, sf_dir, partitions = sys.argv[1], sys.argv[2], int(sys.argv[3])
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    qs = entrymod.queries()
    # Auto disk-health preflight (round-11 verdict item 2): on a
    # throttled disk the probe silently measured I/O, not the plan;
    # diskguard switches shuffle to tmpfs below 200 MB/s sustained and
    # the artifact records which medium actually ran.
    from diskguard import cleanup_tmpfs, shuffle_conf_for_probe

    extra, medium, mb_s = shuffle_conf_for_probe()
    try:
        spark = get_spark(
            app_name=f"probe_{query}_{partitions}p",
            shuffle_partitions=partitions,
            extra_conf=extra,
        )
        times = []
        for _ in range(reps):
            t0 = time.time()
            qs[query](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        print(json.dumps({
            "query": query, "sf_dir": sf_dir, "partitions": partitions,
            "times": times, "min": min(times),
            "median": sorted(times)[len(times) // 2],
            "shuffle_medium": medium, "disk_mb_s": mb_s,
        }))
        spark.stop()
    finally:
        # round-11 ADVICE: success-path-only rmtree leaked RAM-backed
        # shuffle data into /dev/shm when a rep crashed
        cleanup_tmpfs(extra)


if __name__ == "__main__":
    main()

"""Time individual queries at a given sf dir (bench.py methodology:
noop sink, warm session). Usage: python tools/timeq.py [sf_dir] q1 q2 ...
With no query names, times everything."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = [a for a in args if "/" not in a]
    spark = get_spark(app_name="timeq")
    qs = entrymod.queries()
    picked = {n: qs[n] for n in names} if names else qs
    # warmup
    next(iter(qs.values()))(spark, sf_dir).collect()
    for name, fn in picked.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for named queries into plans/<round>/
as <query>_<tag>.txt — the optimization round's before/after plan
evidence (the judge reads these files instead of running Spark).

Usage: python tools/explain_q.py <tag> q1 q2 ...  [sf_dir via env]
Round dir via PLANS_ROUND (default r13).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / os.environ.get("PLANS_ROUND", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain_q")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: wrote {path.name} (Exchange x{n_exch})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""BENCH_SF1: measured (not extrapolated) sf1 timings for the top-50
most expensive queries (round-7 VERDICT item 9).

BENCH_SCALE.json already carries sf0.1->sf1 scaling exponents per
query; this artifact turns the "survives 100x" argument into a direct
measurement for the queries where it matters most — the cost heads.
Selection: top 50 by min-of-samples in BENCH_DETAIL.json.  Protocol:
min-of-3 per query at /tmp/sf1 (same replicated dataset the exponent
sweep used), one warm session, pandas query first to absorb the
Python-worker spawn.

Verdict rule recorded per query: FLAG if the measured sf1 min exceeds
BOTH 10x its sf0.1 min AND 2x the exponent-predicted cost
(small * factor^exponent) — i.e. slower than linear AND the exponent
model can't explain it.

Usage: python tools/bench_sf1.py [n_top] [samples]
Writes BENCH_SF1.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402

SF1_DIR = "/tmp/sf1"
FACTOR = 10.0


def main() -> int:
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    mins01 = {q: min(v) for q, v in detail["samples"].items()}
    top = sorted(mins01, key=lambda q: -mins01[q])[:n_top]

    scale = json.loads((REPO / "BENCH_SCALE.json").read_text())["queries"]

    spark = get_spark(app_name="bench_sf1")
    qs = entrymod.queries()
    # absorb the Python-worker spawn outside any measured window
    qs["emb_topk_pandas"](spark, SF1_DIR).count()

    out: dict = {
        "sf": 1.0,
        "dir": SF1_DIR,
        "n_queries": len(top),
        "samples_per_query": samples,
        "queries": {},
        "flags": [],
    }
    total = 0.0
    for name in top:
        times = []
        try:
            for _ in range(samples):
                t0 = time.monotonic()
                qs[name](spark, SF1_DIR).count()
                times.append(round(time.monotonic() - t0, 3))
        except Exception as exc:
            out["queries"][name] = {"error": f"{type(exc).__name__}: {exc}"}
            out["flags"].append(f"{name}: ERROR")
            continue
        m = min(times)
        total += m
        entry = {
            "sf1_min": m,
            "sf1_samples": times,
            "sf01_min": mins01[name],
            "ratio": round(m / mins01[name], 2) if mins01[name] else None,
        }
        exp = scale.get(name, {}).get("exponent")
        if exp is not None:
            pred = mins01[name] * (FACTOR ** exp)
            entry["exponent"] = exp
            entry["predicted_sf1"] = round(pred, 3)
            if m > 10 * mins01[name] and m > 2 * pred:
                out["flags"].append(
                    f"{name}: {m}s > 10x sf0.1 ({mins01[name]}s) and "
                    f"> 2x exponent prediction ({pred:.2f}s)"
                )
        else:
            entry["exponent"] = None
            if m > 10 * mins01[name]:
                out["flags"].append(
                    f"{name}: {m}s > 10x sf0.1 ({mins01[name]}s), no exponent"
                )
        out["queries"][name] = entry
        print(f"{name:42s} sf1={m:8.3f}s  sf0.1={mins01[name]:7.3f}s  "
              f"x{entry['ratio']}")
    out["sum_min_seconds"] = round(total, 3)
    (REPO / "BENCH_SF1.json").write_text(json.dumps(out, indent=1))
    print(f"total {total:.1f}s over {len(top)} queries; "
          f"{len(out['flags'])} flags")
    spark.stop()
    return 1 if out["flags"] else 0


if __name__ == "__main__":
    sys.exit(main())

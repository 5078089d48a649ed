"""End-of-round snapshot gate (round-8 VERDICT items 1 + "what's
wrong" 1): every committed gate artifact must describe the tree that
SHIPS — i.e. be newer than the last plan/source edit and cover every
registered query.  Run this as the LAST act of a round, after the last
plan edit and after regenerating the gates; a non-zero exit means the
snapshot would commit stale evidence.

Checks:
  1. mtime: each artifact is newer than the newest source .py under
     planning_center_data_pipeline_spark/ (and __spark_entry__.py).
  2. coverage: CROSSCHECK_SF01.json and BENCH_DETAIL.json cover exactly
     len(queries()) names; BENCH_SCALE.json covers every query named in
     its own probe policy that exists in the registry.
  3. honesty: BENCH_DETAIL.json is not a contended window
     (contended == true refuses the gate; see bench.py).

Usage: python tools/snapshot_gate.py          # check, exit 0/1
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_GLOBS = ["planning_center_data_pipeline_spark/**/*.py", "__spark_entry__.py"]
ARTIFACTS = ["CROSSCHECK_SF01.json", "BENCH_DETAIL.json", "BENCH_SCALE.json"]


def newest_source_mtime() -> tuple[float, str]:
    best, who = 0.0, ""
    for pat in SRC_GLOBS:
        for p in REPO.glob(pat):
            m = p.stat().st_mtime
            if m > best:
                best, who = m, str(p.relative_to(REPO))
    return best, who


def main() -> int:
    import __spark_entry__ as entrymod

    n_queries = len(entrymod.queries())
    src_mtime, src_who = newest_source_mtime()
    failures: list[str] = []

    for name in ARTIFACTS:
        path = REPO / name
        if not path.exists():
            failures.append(f"{name}: MISSING")
            continue
        if path.stat().st_mtime < src_mtime:
            failures.append(
                f"{name}: STALE — older than {src_who}; regenerate after the "
                "last plan edit"
            )
        data = json.loads(path.read_text())
        if name == "CROSSCHECK_SF01.json":
            # single-SF record ({"queries": {...}, "n_failures": N}) or
            # the round-9+ both-SF shape ({"sf0.01": rec, "sf0.1": rec})
            recs = (
                {"": data}
                if "queries" in data
                else {k: v for k, v in data.items() if isinstance(v, dict)}
            )
            if "queries" not in data and set(recs) < {"sf0.01", "sf0.1"}:
                failures.append(f"{name}: missing an SF leg (has {sorted(recs)})")
            for sf_key, rec in recs.items():
                per = rec.get("queries", {})
                if len(per) != n_queries:
                    failures.append(
                        f"{name}[{sf_key}]: covers {len(per)} of "
                        f"{n_queries} registered queries"
                    )
                if rec.get("n_failures"):
                    failures.append(
                        f"{name}[{sf_key}]: {rec['n_failures']} failures"
                    )
        elif name == "BENCH_DETAIL.json":
            covered = len(data.get("queries", {})) + len(data.get("errors", {}))
            if covered != n_queries:
                failures.append(
                    f"{name}: covers {covered} of {n_queries} registered queries"
                )
            if data.get("contended"):
                failures.append(
                    f"{name}: contended window (noise_best2="
                    f"{data.get('noise_best2')}, min_samples="
                    f"{data.get('min_samples_per_query')}) — rerun on an "
                    "idle box"
                )
            if data.get("n_errors"):
                failures.append(f"{name}: {data['n_errors']} query errors")

    if failures:
        print("SNAPSHOT GATE: FAIL")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(
        f"SNAPSHOT GATE: OK — {len(ARTIFACTS)} artifacts fresh "
        f"(>= {src_who}) and covering {n_queries} queries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

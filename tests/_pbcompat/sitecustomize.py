"""Auto-run in every Python process whose PYTHONPATH includes this
directory (the interpreter imports ``sitecustomize`` at startup) — this
is how Spark's Python WORKERS get the google.protobuf alias needed by
transformWithStateInPandas.  tests/conftest.py prepends this directory
to PYTHONPATH *and* sets SPARK_GRAFT_PBCOMPAT=1 before building the
SparkSession; without that explicit opt-in this module does nothing, so
unrelated interpreters that merely inherit PYTHONPATH are untouched
(round-7 ADVICE).  Also a no-op when the real protobuf is installed or
the gcloud vendored runtime is absent."""

import os
import sys

if os.environ.get("SPARK_GRAFT_PBCOMPAT") == "1":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        import pbcompat

        pbcompat.install()
    except Exception:  # never break interpreter startup
        pass

"""Auto-run in every Python process whose PYTHONPATH includes this
directory (the interpreter imports ``sitecustomize`` at startup) — this
is how Spark's Python WORKERS get the google.protobuf alias needed by
transformWithStateInPandas.  tests/conftest.py prepends this directory
to PYTHONPATH before building the SparkSession.  No-op when the real
protobuf is installed or the gcloud vendored runtime is absent."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
try:
    import pbcompat

    pbcompat.install()
except Exception:  # never break interpreter startup
    pass

"""Test-environment shim: make ``google.protobuf`` importable when the
real package is absent by aliasing the pure-Python protobuf runtime that
ships inside the Google Cloud SDK (rewritten there under the
``cloudsdk.google.protobuf`` namespace).

Why: pyspark's ``transformWithStateInPandas`` Python runner imports
``google.protobuf`` (StateMessage_pb2) in BOTH the driver and every
Python worker.  This container has no protobuf wheel and no network, but
it does carry gcloud's vendored pure-Python runtime (4.23.2).  The only
gap is ``runtime_version`` (added in protobuf 5.27), which the
Spark-generated pb2 imports purely to validate gencode/runtime version
compatibility — we provide a no-op stand-in.  Serialized descriptors are
wire-stable, so the 5.x-generated pb2 builds fine on the 4.23 runtime
(verified by a SerializeToString/ParseFromString round-trip at install
time).

This module is TEST PLUMBING ONLY: it activates only when
``import google.protobuf`` fails, and callers must treat a False return
as "skip the protobuf-dependent test".  Workers pick it up via the
sitecustomize.py next to this file (prepended to PYTHONPATH by
tests/conftest.py before the SparkSession is created).
"""

from __future__ import annotations

import importlib.util
import os
import sys

_GCLOUD_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"

_RUNTIME_VERSION_SRC = '''\
"""No-op stand-in for protobuf 5.x's runtime_version (absent in 4.x)."""
from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, location):
    # The shimmed 4.23 runtime accepts 5.x gencode for the message
    # shapes Spark uses (plain proto3, no editions); skip the check.
    return None
'''


class _ProtobufAliasFinder:
    """Meta-path finder that maps ``google.protobuf`` (and ONLY that
    subtree) onto gcloud's vendored ``cloudsdk.google.protobuf``.

    Round-7 ADVICE: rebinding the top-level ``google`` module shadowed
    every other google.* distribution (google.auth, google.cloud, ...)
    in any process the shim reached.  A finder scoped to the
    ``google.protobuf`` prefix leaves the parent ``google`` package —
    and all its other children — to resolve naturally."""

    _PREFIX = "google.protobuf"

    def find_spec(self, fullname, path=None, target=None):
        if fullname != self._PREFIX and not fullname.startswith(
            self._PREFIX + "."
        ):
            return None
        import importlib
        import importlib.util

        try:
            real = importlib.import_module("cloudsdk." + fullname)
        except ImportError:
            return None

        class _Loader:
            def create_module(self, spec):
                return real

            def exec_module(self, module):
                pass

        return importlib.util.spec_from_loader(fullname, _Loader())


def install() -> bool:
    """Expose gcloud's vendored protobuf as ``google.protobuf``.

    Returns True if ``google.protobuf.descriptor`` is importable after
    the call (either the real package or the shim), False otherwise.
    """
    try:  # real protobuf wins, always
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass

    if not os.path.isdir(os.path.join(_GCLOUD_THIRD_PARTY, "cloudsdk")):
        return False

    if _GCLOUD_THIRD_PARTY not in sys.path:
        sys.path.append(_GCLOUD_THIRD_PARTY)

    try:
        import cloudsdk.google.protobuf as _cpb
    except ImportError:
        return False

    # Route ONLY the google.protobuf subtree through the vendored
    # runtime; `google` itself (and google.auth etc., if ever present)
    # resolve through the normal path-based finders.
    if not any(isinstance(f, _ProtobufAliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _ProtobufAliasFinder())
    sys.modules.setdefault("google.protobuf", _cpb)
    # `import google.protobuf; google.protobuf.X` resolves the attribute
    # on the parent package, and a sys.modules cache hit skips the
    # parent-attr wiring — add the single attribute (nothing else on
    # `google` is touched, per round-7 ADVICE).
    try:
        import google as _g

        if not hasattr(_g, "protobuf"):
            _g.protobuf = _cpb
    except ImportError:
        pass

    # Provide runtime_version (protobuf 5.27+ API the 4.23 runtime
    # lacks). Registered under BOTH module names: the import system
    # resolves the child by the parent's real __name__ (cloudsdk...).
    if "google.protobuf.runtime_version" not in sys.modules:
        shim_path = os.path.join(os.path.dirname(__file__), "_runtime_version_shim.py")
        if not os.path.exists(shim_path):
            try:
                with open(shim_path, "w") as fh:
                    fh.write(_RUNTIME_VERSION_SRC)
            except OSError:
                return False
        spec = importlib.util.spec_from_file_location(
            "cloudsdk.google.protobuf.runtime_version", shim_path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["cloudsdk.google.protobuf.runtime_version"] = mod
        sys.modules["google.protobuf.runtime_version"] = mod
        _cpb.runtime_version = mod

    try:  # smoke: the Spark pb2 must build and round-trip on this runtime
        from pyspark.sql.streaming.proto import StateMessage_pb2 as _S

        m = _S.StateRequest(version=2)
        m2 = _S.StateRequest()
        m2.ParseFromString(m.SerializeToString())
        return m2.version == 2
    except Exception:
        return False

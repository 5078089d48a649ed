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

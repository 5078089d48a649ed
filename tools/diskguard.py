"""Disk-health preflight for scale probes (round-11 verdict item 2).

Round 11 diagnosed this box's virtual disk as burst-throttled: ~330
MB/s for the first few hundred MB, then 20-40 MB/s sustained (70-93%
kernel time).  On such a device a shuffle-heavy probe measures the
DISK, not the plan, so the round-11 exponent experiments moved
spark.local.dir to /dev/shm (tmpfs) by hand.  This module automates
that call so the gate tooling cannot forget it:

    conf, medium, mb_s = shuffle_conf_for_probe()

- probes the sustained write throughput of the default shuffle dir
  (1 GiB by default — large enough to exhaust the burst window; the
  round-11 256 MB probe could read 330 MB/s on a throttled disk),
- below THRESHOLD_MB_S returns a tmpfs spark.local.dir conf and
  medium="tmpfs"; above it returns ({}, "disk", mb_s),
- honors the explicit overrides PROBE_SHM_SHUFFLE=1 (force tmpfs,
  skip the probe) and PROBE_SHM_SHUFFLE=0 (force disk).

Every artifact a probe writes should stamp `shuffle_medium` and
`disk_mb_s` next to its timings; cleanup_tmpfs() must run in a
finally block (round-11 ADVICE: the success-path-only rmtree leaked
RAM-backed shuffle data into /dev/shm on probe crashes).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

# A healthy local NVMe sustains GB/s; this box's throttled virtual
# disk reads 20-40 MB/s sustained but can flash 300-400 MB/s for a
# single 1 GiB probe when its burst credits have refilled (observed
# round 12: 391 MB/s on probe 1, 7-30 MB/s on the next four).  500
# keeps such ambiguous readings on the safe (tmpfs) side; only a
# genuinely healthy disk clears it.
THRESHOLD_MB_S = 500.0


def disk_mb_s(path: str = "/tmp", size_mb: int = 1024) -> float | None:
    """Sustained buffered sequential-write throughput of `path`."""
    try:
        os.makedirs(path, exist_ok=True)
        with tempfile.NamedTemporaryFile(dir=path, delete=True) as f:
            buf = b"\0" * (1 << 20)
            t0 = time.time()
            for _ in range(size_mb):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
            return round(size_mb / (time.time() - t0), 1)
    except OSError:
        return None


def shuffle_conf_for_probe(
    threshold: float = THRESHOLD_MB_S,
) -> tuple[dict[str, str], str, float | None]:
    """(extra_conf, medium, measured_mb_s) for a probe SparkSession."""
    override = os.environ.get("PROBE_SHM_SHUFFLE")
    if override == "0":
        return {}, "disk", None
    if override:  # explicit force, skip the 1 GiB probe
        return {"spark.local.dir": _tmpfs_dir()}, "tmpfs", None
    # min of TWO consecutive probes: a single probe can land entirely
    # inside a refilled burst window and read 10x the sustained rate
    probes = [disk_mb_s(), disk_mb_s()]
    vals = [p for p in probes if p is not None]
    mb_s = min(vals) if vals else None
    if mb_s is not None and mb_s < threshold:
        return {"spark.local.dir": _tmpfs_dir()}, "tmpfs", mb_s
    return {}, "disk", mb_s


def _tmpfs_dir() -> str:
    return f"/dev/shm/spark-probe-{os.getpid()}"


def cleanup_tmpfs(conf: dict[str, str]) -> None:
    """Remove the probe's tmpfs shuffle dir; call from a finally block."""
    d = conf.get("spark.local.dir", "")
    if d.startswith("/dev/shm/"):
        shutil.rmtree(d, ignore_errors=True)

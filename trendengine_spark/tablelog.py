"""Manifest-versioned parquet tables: snapshot isolation + time travel.

The swap-based sinks (:mod:`.sinks`) are crash-safe but not
READER-safe: an in-flight scan of a directory being swapped can see a
mix of old and new files. The transaction-log answer (what
Delta/Iceberg do) is to never mutate visible state — every write
lands new immutable files and commits by publishing a MANIFEST that
names the table's exact file set; readers pin one manifest and are
immune to concurrent writers; old manifests remain readable (time
travel) until vacuumed.

This module is that mechanism reduced to its engine-portable core:

- data files live under ``<path>/data/`` with unique names (never
  overwritten, never deleted by writers);
- ``<path>/_manifests/vNNNNNN.json`` lists the file names of one
  version; the commit is a single atomic ``os.replace`` of the
  manifest (readable version = the manifest exists, entirely);
- ``read_versioned`` loads the newest (or a pinned) manifest and
  scans exactly those files;
- ``vacuum_versioned`` removes data files referenced only by
  dropped manifests.

Single-writer by contract (like the rest of the plain-parquet sinks);
at 100 TB the same layout is fronted by a catalog/lock service for
multi-writer commits — the read path is unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_paths(path: str) -> list[str]:
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def current_version(path: str) -> int:
    """Newest committed version number, or -1 for an empty table."""
    ms = _manifest_paths(path)
    if not ms:
        return -1
    return int(os.path.basename(ms[-1])[1:-5])


def write_versioned(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Commit ``df`` as the table's next version; returns the version.

    The data lands in a staging directory, its part files move into
    the immutable ``data/`` pool under unique names, and the commit
    point is one atomic manifest rename — a crash before it leaves
    the previous version intact and the stragglers invisible (cleaned
    by :func:`vacuum_versioned`). Readers pinned to any OTHER version
    are unaffected: no visible file is ever mutated."""
    os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.parquet(staging)
    names = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        unique = f"{uuid.uuid4().hex}.parquet"
        os.replace(
            os.path.join(staging, f),
            os.path.join(path, _DATA_DIR, unique),
        )
        names.append(unique)
    for f in os.listdir(staging):  # _SUCCESS, .crc droppings
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)
    version = current_version(path) + 1
    manifest = {"version": version, "files": names}
    final = os.path.join(path, _MANIFEST_DIR, f"v{version:06d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, final)  # THE commit point
    return version


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Scan exactly one committed version (newest by default) — a
    pinned snapshot, immune to later writes until vacuumed."""
    v = current_version(path) if version is None else version
    manifest = os.path.join(path, _MANIFEST_DIR, f"v{v:06d}.json")
    with open(manifest) as fh:
        files = json.load(fh)["files"]
    if not files:
        raise ValueError(f"version {v} of {path} is empty")
    return spark.read.parquet(
        *[os.path.join(path, _DATA_DIR, f) for f in files]
    )


def vacuum_versioned(path: str, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete data
    files no surviving manifest references (incl. crash stragglers
    that were never committed). Run only when no reader can still be
    pinned older than the horizon — the retention contract every
    log-structured table format has."""
    ms = _manifest_paths(path)
    keep, drop = ms[-keep_last:], ms[:-keep_last]
    referenced: set[str] = set()
    for m in keep:
        with open(m) as fh:
            referenced.update(json.load(fh)["files"])
    removed = 0
    data_dir = os.path.join(path, _DATA_DIR)
    for f in os.listdir(data_dir):
        if f not in referenced:
            os.remove(os.path.join(data_dir, f))
            removed += 1
    for m in drop:
        os.remove(m)
    return {"dropped_manifests": len(drop), "removed_files": removed}

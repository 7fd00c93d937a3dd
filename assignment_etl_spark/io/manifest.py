"""Snapshot-manifest table layout: atomic commits, time travel, and
vacuum over plain parquet — the structural core of an Iceberg/Delta
table without the format dependency.

The problem with a bare parquet directory at 100 TB: readers list the
filesystem (slow, eventually consistent) and see half-written data;
writers cannot append atomically; history is gone the moment files are
rewritten. The manifest layout fixes all three with metadata only:

- data files are immutable, written once under ``data/`` with unique
  names and NEVER listed — readers plan from the manifest's file list;
- a commit is: write data files → write ``manifest-N.json`` (file list
  + row/byte stats + parent pointer) → atomically swap the ``_latest``
  pointer (``os.replace``). A crash before the pointer swap leaves the
  previous snapshot fully intact — readers can never observe a partial
  commit;
- every manifest is retained, so any historical version re-reads
  exactly its file set (time travel), and appends reuse the parent's
  files by reference — an append commit costs the NEW data only;
- ``vacuum`` deletes files referenced by no retained manifest.

Single-writer by design (the pointer swap is last-writer-wins, not a
compare-and-swap); production multi-writer needs the lock/CAS service
real table formats bring — documented, out of scope.

Reference parity note: the reference overwrites its parquet outputs in
place (etl.py final to_parquet); this is the versioned-store upgrade a
long-lived pipeline needs for reproducibility (training-data snapshots
pinned by manifest version).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_PREFIX = "manifest-"
LATEST = "_latest"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"{MANIFEST_PREFIX}{version}.json")


def latest_version(path: str) -> int | None:
    p = os.path.join(path, LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def write_snapshot(
    df: DataFrame, path: str, *, mode: str = "append"
) -> dict:
    """Commit ``df`` as a new snapshot; returns the manifest dict.

    ``append`` carries the parent snapshot's files forward by reference
    (the commit writes only the new data); ``overwrite`` starts the file
    list fresh (old files stay on disk for time travel until vacuum).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode}")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.parquet(staging)
    new_files = []
    for f in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
        dst = os.path.join(
            path, "data", f"part-{uuid.uuid4().hex[:12]}-{os.path.basename(f)}"
        )
        os.rename(f, dst)
        new_files.append(os.path.relpath(dst, path))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    parent = latest_version(path)
    files = list(new_files)
    if mode == "append" and parent is not None:
        files = read_manifest(path, parent)["files"] + files
    version = 0 if parent is None else parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "files": files,
        "n_files": len(files),
        "total_bytes": sum(
            os.path.getsize(os.path.join(path, f)) for f in files
        ),
    }
    with open(_manifest_path(path, version), "w") as f:
        json.dump(manifest, f)
    # atomic pointer swap — readers see the old or the new snapshot,
    # never a partial commit
    tmp = os.path.join(path, f".{LATEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, LATEST))
    return manifest


def read_snapshot(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Plan the snapshot's exact file set from its manifest — no
    filesystem listing. ``version=None`` follows the latest pointer;
    any retained version time-travels."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshot committed at {path}")
    m = read_manifest(path, v)
    if not m["files"]:
        return spark.createDataFrame([], schema="`__empty` int").limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in m["files"]])


def snapshots(path: str) -> list[dict]:
    """All retained manifests, oldest first."""
    out = []
    for f in sorted(
        glob.glob(os.path.join(path, f"{MANIFEST_PREFIX}*.json")),
        key=lambda p: int(
            os.path.basename(p)[len(MANIFEST_PREFIX) : -len(".json")]
        ),
    ):
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def vacuum(path: str, *, keep_versions: int = 2) -> dict:
    """Drop manifests older than the newest ``keep_versions`` and delete
    data files no retained manifest references. Metadata-only planning;
    returns {"n_manifests_dropped", "n_files_deleted", "bytes_freed"}."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    all_m = snapshots(path)
    keep, drop = all_m[-keep_versions:], all_m[:-keep_versions]
    referenced = {f for m in keep for f in m["files"]}
    freed = n_deleted = 0
    for f in glob.glob(os.path.join(path, "data", "*.parquet")):
        rel = os.path.relpath(f, path)
        if rel not in referenced:
            freed += os.path.getsize(f)
            os.remove(f)
            n_deleted += 1
    for m in drop:
        os.remove(_manifest_path(path, m["version"]))
    return {
        "n_manifests_dropped": len(drop),
        "n_files_deleted": n_deleted,
        "bytes_freed": freed,
    }

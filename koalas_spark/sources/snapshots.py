"""Minimal snapshot/time-travel table layout (the Delta/Iceberg core
idea with none of the format lock-in): every commit writes its data
files into an immutable version directory and records a JSON manifest
listing ALL directories visible at that version. Readers resolve a
manifest — never the directory tree — so a reader pinned to version N
is immune to concurrent appends (snapshot isolation), and `version=`
gives as-of reads for reproducing yesterday's training set.

Scale notes: the manifest holds directory paths, not per-file lists —
listing stays on the distributed reader (Spark's parquet scan), so a
million-file table costs the manifest nothing. Appends never rewrite
data; commit cost is one tiny JSON PUT. This mirrors how the real
lakehouse formats make time travel O(1): name the snapshot, don't
copy it. (Reference has no versioned storage — this extends its
toCsv/fromTable surface, reference source/koalas/dataframe.d:108-128.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"_v{version}.json")


def latest_version(path: str) -> int:
    versions = [
        int(f[2:-5])
        for f in os.listdir(path)
        if f.startswith("_v") and f.endswith(".json")
    ]
    if not versions:
        raise FileNotFoundError(f"no snapshot manifests under {path}")
    return max(versions)


def write_snapshot(df: DataFrame, path: str) -> int:
    """Commit ``df`` as a new version: data into ``v{N}/``, manifest
    ``_v{N}.json`` = previous manifest's dirs + the new one. Returns
    the committed version number. The data write completes before the
    manifest appears, so a crash mid-commit leaves an orphan data dir
    but never a manifest pointing at missing files (write-audit-
    publish ordering)."""
    os.makedirs(path, exist_ok=True)
    try:
        prev = latest_version(path)
        with open(_manifest_path(path, prev)) as f:
            dirs = json.load(f)["dirs"]
        version = prev + 1
    except FileNotFoundError:
        dirs, version = [], 1
    data_dir = os.path.join(path, f"v{version}")
    df.write.mode("overwrite").parquet(data_dir)
    manifest = {"version": version, "dirs": dirs + [f"v{version}"]}
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path, version))  # atomic publish
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). The
    manifest names the visible version dirs; the scan unions them as
    one parquet load (partition pruning / pushdown intact)."""
    if version is None:
        version = latest_version(path)
    with open(_manifest_path(path, version)) as f:
        dirs = json.load(f)["dirs"]
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])

"""Versioned keyed tables over plain Parquet — manifest-based time
travel (extension surface; lakehouse ops).

The :class:`~.merge.MergeWriter` rewrites touched buckets IN PLACE:
correct and idempotent, but the previous state is gone the moment the
overwrite lands — no audit of what a bad increment replaced, no
read-at-version for reproducing yesterday's training run, no
rollback. Transactional formats (Delta/Iceberg — the
``operators/merge.py`` MERGE INTO delegation) solve this with a
commit log; :class:`VersionedTable` is the same idea reduced to its
load-bearing core on plain Parquet, so the engine's dev/test lake
gets time travel without a format dependency:

- data files are IMMUTABLE, written once under a per-commit directory
  (``files/<commit>/__bucket=N/…``); a commit never touches another
  commit's files;
- a VERSION is a JSON manifest listing its member files; an upsert
  writes ONLY the touched buckets' merged files and its manifest
  reuses the untouched buckets' files from the parent version —
  file-level structural sharing, exactly how Delta/Iceberg snapshots
  share unchanged data files;
- the latest-version pointer is a one-line file swapped with an
  atomic rename: a crash anywhere before the swap leaves the previous
  version fully intact and only orphan files behind (reclaimed by
  :meth:`vacuum`); a crash after the swap is a completed commit.
  Single WRITER at a time (readers are unrestricted) — the same
  contract documented on ``streaming.compact_ledger``.

At 100 TB the manifest lists file paths, not data (KBs per commit);
reads open exactly the listed files so no directory listing of the
whole tree is needed — the small-files discipline the reference's
``*/*`` glob rescans lack (SURVEY §4).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


class VersionedTable:
    def __init__(self, path: str, keys: Sequence[str], n_buckets: int = 32):
        self.path = path
        self.keys = list(keys)
        self.n_buckets = n_buckets

    # -- layout helpers ---------------------------------------------------

    def _vdir(self) -> str:
        return os.path.join(self.path, "_versions")

    def _latest_path(self) -> str:
        return os.path.join(self.path, "_latest")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._vdir(), f"v{version:08d}.json")

    def latest_version(self) -> int:
        """0 if the table does not exist yet."""
        try:
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def versions(self) -> list[int]:
        try:
            names = os.listdir(self._vdir())
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        b = F.pmod(F.hash(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets))
        return df.withColumn(BUCKET_COL, b)

    def _write_commit(self, df: DataFrame) -> dict[int, list[str]]:
        """Write ``df`` (already bucketed) under a fresh immutable
        commit dir; returns {bucket: [file, ...]} relative paths."""
        commit = uuid.uuid4().hex[:12]
        out = os.path.join(self.path, "files", commit)
        df.write.mode("error").partitionBy(BUCKET_COL).parquet(out)
        files: dict[int, list[str]] = {}
        for dp, _, fs in os.walk(out):
            for fn in fs:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(dp, fn)
                rel = os.path.relpath(full, self.path)
                bkt = int(dp.rsplit(f"{BUCKET_COL}=", 1)[1].split(os.sep)[0])
                files.setdefault(bkt, []).append(rel)
        return files

    def _commit(self, bucket_files: dict[int, list[str]], parent: int) -> int:
        version = self.latest_version() + 1
        os.makedirs(self._vdir(), exist_ok=True)
        manifest = {
            "version": version,
            "parent": parent,
            "buckets": {str(b): sorted(fs) for b, fs in sorted(bucket_files.items())},
        }
        tmp = self._manifest_path(version) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(version))
        # the atomic swap that IS the commit
        ltmp = self._latest_path() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(ltmp, "w") as f:
            f.write(str(version))
        os.replace(ltmp, self._latest_path())
        return version

    # -- public API -------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        """Full refresh as a NEW version (the old one stays readable)."""
        parent = self.latest_version()
        files = self._write_commit(self._bucketed(df))
        return self._commit(files, parent)

    def upsert(self, spark: SparkSession, new: DataFrame) -> int:
        """Keyed merge as a NEW version: only the touched buckets'
        files are written; untouched buckets are file-shared with the
        parent manifest. Same null-safe win-by-key semantics as
        MergeWriter.upsert."""
        parent = self.latest_version()
        if parent == 0:
            return self.overwrite(new)
        new_b = self._bucketed(new)
        touched = [
            r[BUCKET_COL] for r in new_b.select(BUCKET_COL).distinct().collect()
        ]
        old_manifest = self._manifest(parent)["buckets"]
        old_touched_files = [
            os.path.join(self.path, f)
            for b in touched
            for f in old_manifest.get(str(b), [])
        ]
        if old_touched_files:
            old = spark.read.parquet(*old_touched_files)
            # file-list reads drop the hive-derived bucket column;
            # recompute it (pure function of the keys)
            old = self._bucketed(old.select(*new.columns))
            on = [new_b[k].eqNullSafe(old[k]) for k in self.keys]
            survivors = old.join(new_b, on=on, how="left_anti")
            merged = new_b.unionByName(survivors)
        else:
            merged = new_b
        merged = merged.localCheckpoint(eager=True)
        files = self._write_commit(merged)
        combined = {
            int(b): [f for f in fs]
            for b, fs in old_manifest.items()
            if int(b) not in touched
        }
        combined.update(files)
        return self._commit(combined, parent)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        manifest = self._manifest(v)
        paths = [
            os.path.join(self.path, f)
            for fs in manifest["buckets"].values()
            for f in fs
        ]
        if not paths:
            raise ValueError(f"version {v} is empty")
        return spark.read.parquet(*paths)

    def rollback(self, to_version: int) -> int:
        """Restore an old state as a NEW version (no files move — the
        new manifest simply points at the target's files), so the
        rollback itself is audited and reversible."""
        target = self._manifest(to_version)["buckets"]
        return self._commit({int(b): list(fs) for b, fs in target.items()},
                            parent=self.latest_version())

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete data files referenced ONLY by manifests older than
        the last ``keep_last`` versions (plus orphans from crashed
        commits), then drop those manifests. Returns deleted paths.
        Runs under the single-writer contract."""
        versions = self.versions()
        keep = set(versions[-keep_last:]) if keep_last else set()
        live: set[str] = set()
        for v in keep:
            for fs in self._manifest(v)["buckets"].values():
                live.update(fs)
        deleted: list[str] = []
        froot = os.path.join(self.path, "files")
        for dp, _, fs in os.walk(froot):
            for fn in fs:
                full = os.path.join(dp, fn)
                rel = os.path.relpath(full, self.path)
                if fn.endswith(".parquet") and rel not in live:
                    os.remove(full)
                    deleted.append(rel)
        for v in versions:
            if v not in keep:
                os.remove(self._manifest_path(v))
        return deleted

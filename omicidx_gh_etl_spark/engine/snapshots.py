"""Versioned snapshot tables: a minimal transaction log over parquet —
time travel, metadata-only rollback, and safe file vacuum.

The reference publishes marts by overwriting parquet in place and keeps
no history (DEPLOYMENT.md:73-83 — consumers always see "latest");
`merge.publish_parquet` already makes the overwrite atomic. This module
adds the missing dimension: every publish is a numbered snapshot, old
versions stay readable, and a bad publish is undone by a metadata-only
rollback instead of a recompute.

Layout (same idea as Delta/Iceberg, reduced to the parts the engine
needs — public designs: Delta log = ordered JSON actions, Iceberg =
manifest lists):

    table_dir/
      _log/00000000.json     one manifest per version: op, ts, schema,
           00000001.json     relative file list + per-file row counts
      data/<commit>/*.parquet  immutable data files, never rewritten

Scale design:
- **Commits are O(new data)**: append writes only the new files and a
  manifest referencing old + new; nothing is rewritten. Rollback and
  (no-op) overwrite are O(1) metadata.
- **Row counts come from parquet footers** (driver-side pyarrow reads
  of KB-sized metadata), not a second Spark count job over the data.
- **Readers pin a manifest**, so a concurrent commit never changes the
  file set under a running query (snapshot isolation); the manifest
  rename is the atomic commit point, and optimistic versioning (next
  version file must not exist) rejects concurrent writers.
- **Vacuum deletes only files unreferenced by retained manifests** —
  the check is against the union of retained file lists, so a data dir
  shared by many versions (rollbacks, appends) survives until every
  referencing version is expired.

On an object store the `_log/` rename needs a conditional-put (the
same caveat as merge.publish_parquet); the data layout is already
object-store-safe because files are immutable.
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class SnapshotConflictError(RuntimeError):
    """Another writer committed the version this commit targeted."""


@dataclass(frozen=True)
class Snapshot:
    """One committed version of a table."""

    version: int
    op: str  # "overwrite" | "append" | "rollback"
    ts: float
    files: tuple[str, ...]  # relative to the table root
    n_rows: int
    schema_json: str
    note: str = ""
    meta: dict = field(default_factory=dict)  # app-level commit metadata


class SnapshotTable:
    """A parquet table with a numbered-manifest transaction log."""

    def __init__(self, table_dir: str) -> None:
        self.root = Path(table_dir)
        self.log_dir = self.root / "_log"
        self.data_dir = self.root / "data"

    # -- log access ---------------------------------------------------

    def versions(self) -> list[int]:
        if not self.log_dir.exists():
            return []
        return sorted(
            int(p.stem) for p in self.log_dir.glob("*.json") if p.stem.isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no snapshots in {self.root}")
        path = self.log_dir / f"{version:08d}.json"
        doc = json.loads(path.read_text())
        return Snapshot(
            version=doc["version"],
            op=doc["op"],
            ts=doc["ts"],
            files=tuple(doc["files"]),
            n_rows=doc["n_rows"],
            schema_json=doc["schema"],
            note=doc.get("note", ""),
            meta=doc.get("meta", {}),
        )

    def history(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self.versions()]

    # -- reads --------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a pinned snapshot (default: latest). Time travel =
        pass any version from ``history()``."""
        snap = self.snapshot(version)
        paths = [str(self.root / f) for f in snap.files]
        if not paths:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(snap.schema_json))
            return spark.createDataFrame([], schema)
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Read the snapshot current at wall-clock time ``ts``."""
        eligible = [s for s in self.history() if s.ts <= ts]
        if not eligible:
            raise FileNotFoundError(f"no snapshot at or before ts={ts}")
        return self.read(spark, eligible[-1].version)

    # -- writes -------------------------------------------------------

    def commit_overwrite(
        self, df: DataFrame, note: str = "", meta: dict | None = None
    ) -> Snapshot:
        """New version whose contents are exactly ``df``."""
        files, n_rows = self._write_data(df)
        return self._commit("overwrite", files, n_rows, df.schema.json(), note, meta)

    def commit_append(
        self, df: DataFrame, note: str = "", meta: dict | None = None
    ) -> Snapshot:
        """New version = previous files + ``df``'s files. O(new data):
        nothing existing is rewritten."""
        prev = self.latest_version()
        base: tuple[str, ...] = ()
        base_rows = 0
        if prev is not None:
            snap = self.snapshot(prev)
            base, base_rows = snap.files, snap.n_rows
        files, n_rows = self._write_data(df)
        return self._commit(
            "append", base + files, base_rows + n_rows, df.schema.json(), note, meta
        )

    def rollback(self, version: int, note: str = "") -> Snapshot:
        """Commit a new version with an old version's exact file list —
        metadata-only undo, no data moves."""
        snap = self.snapshot(version)
        return self._commit(
            "rollback",
            snap.files,
            snap.n_rows,
            snap.schema_json,
            note or f"rollback to v{version}",
        )

    def vacuum(self, retain_last: int = 2) -> list[str]:
        """Delete data dirs referenced by no retained manifest; expired
        manifests are dropped too. Returns removed paths."""
        vs = self.versions()
        keep_versions = vs[-retain_last:] if retain_last > 0 else []
        live_dirs = set()
        for v in keep_versions:
            for f in self.snapshot(v).files:
                # files are data/<commit>/<part>.parquet — keep the commit dir
                live_dirs.add(Path(f).parts[1])
        removed: list[str] = []
        if self.data_dir.exists():
            for d in self.data_dir.iterdir():
                if d.is_dir() and d.name not in live_dirs:
                    shutil.rmtree(d)
                    removed.append(str(d))
        for v in vs:
            if v not in keep_versions:
                (self.log_dir / f"{v:08d}.json").unlink()
                removed.append(f"_log/{v:08d}.json")
        return removed

    # -- internals ----------------------------------------------------

    def _write_data(self, df: DataFrame) -> tuple[tuple[str, ...], int]:
        commit_id = uuid.uuid4().hex[:12]
        out = self.data_dir / commit_id
        df.write.mode("overwrite").option("compression", "zstd").parquet(str(out))
        files: list[str] = []
        n_rows = 0
        for p in sorted(out.glob("*.parquet")):
            files.append(str(p.relative_to(self.root)))
            n_rows += pq.ParquetFile(p).metadata.num_rows
        return tuple(files), n_rows

    def _commit(
        self,
        op: str,
        files: tuple[str, ...],
        n_rows: int,
        schema_json: str,
        note: str,
        meta: dict | None = None,
    ) -> Snapshot:
        self.log_dir.mkdir(parents=True, exist_ok=True)
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        final = self.log_dir / f"{version:08d}.json"
        if final.exists():
            raise SnapshotConflictError(f"version {version} already committed")
        doc = {
            "version": version,
            "op": op,
            "ts": time.time(),
            "files": list(files),
            "n_rows": n_rows,
            "schema": schema_json,
            "note": note,
            "meta": meta or {},
        }
        tmp = self.log_dir / f".{final.name}.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(doc, indent=1))
        try:
            # exclusive link-style publish: os.rename overwrites on
            # POSIX, so re-check then rename — the manifest filename is
            # the optimistic lock
            if final.exists():
                raise SnapshotConflictError(f"version {version} already committed")
            tmp.rename(final)
        finally:
            if tmp.exists():
                tmp.unlink()
        return self.snapshot(version)

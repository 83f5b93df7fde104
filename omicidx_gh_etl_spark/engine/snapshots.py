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


def _footer_stats(meta, cols: tuple[str, ...]) -> dict:
    """Per-file column min/max from parquet footer row-group stats
    (KB-sized driver reads). A column with any stats-less row group is
    omitted — absent stats must stay 'unknown', never 'unbounded'."""
    idx = {
        meta.schema.column(i).name: i for i in range(meta.num_columns)
    }
    stats: dict = {}
    for c in cols:
        if c not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(meta.num_row_groups):
            s = meta.row_group(rg).column(idx[c]).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if ok and lo is not None:
            stats[c] = [_plain(lo), _plain(hi)]
    return stats


def _plain(v):
    """JSON-encodable scalar (bytes → utf-8 best effort)."""
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


@dataclass(frozen=True)
class Snapshot:
    """One committed version of a table."""

    version: int
    op: str  # "overwrite" | "append" | "replace_partitions" | "rollback"
    ts: float
    files: tuple[str, ...]  # relative to the table root
    n_rows: int
    schema_json: str
    note: str = ""
    meta: dict = field(default_factory=dict)  # app-level commit metadata
    # per-file detail: {"path", "rows", "part": {col: str(value)} | None}
    file_infos: tuple[dict, ...] = ()


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
        # manifests store either plain path strings (early format) or
        # {"path","rows","part"} dicts — normalize to dicts
        infos = tuple(
            f if isinstance(f, dict) else {"path": f, "rows": None, "part": None}
            for f in doc["files"]
        )
        return Snapshot(
            version=doc["version"],
            op=doc["op"],
            ts=doc["ts"],
            files=tuple(i["path"] for i in infos),
            n_rows=doc["n_rows"],
            schema_json=doc["schema"],
            note=doc.get("note", ""),
            meta=doc.get("meta", {}),
            file_infos=infos,
        )

    def history(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self.versions()]

    # -- reads --------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        partition_filter: dict | None = None,
        range_filter: dict | None = None,
    ) -> DataFrame:
        """Read a pinned snapshot (default: latest). Time travel =
        pass any version from ``history()``.

        ``partition_filter={col: [v1, v2]}`` prunes at the MANIFEST
        level: only files committed for those partition values are
        listed to the scan (Delta-style log pruning — the planner never
        even sees the other files). Files with no recorded partition
        info are conservatively included.

        ``range_filter={col: (lo, hi)}`` prunes on recorded per-file
        column min/max (``stats_cols`` at commit time): a file is
        skipped only when its range provably misses [lo, hi]; files
        without stats for the column are conservatively included.
        Values compare with the JSON-decoded footer types (numbers as
        numbers, dates as ISO strings).
        """
        snap = self.snapshot(version)
        infos = snap.file_infos
        if range_filter:
            def overlaps(i: dict) -> bool:
                st = i.get("stats") or {}
                for c, (lo, hi) in range_filter.items():
                    if c not in st:
                        continue  # unknown → cannot prune
                    fmin, fmax = st[c]
                    if fmax < lo or fmin > hi:
                        return False
                return True

            infos = tuple(i for i in infos if overlaps(i))
        if partition_filter:
            wanted = {c: {str(v) for v in vs} for c, vs in partition_filter.items()}
            infos = tuple(
                i
                for i in infos
                if i.get("part") is None
                or all(
                    i["part"].get(c) is None or i["part"][c] in vs
                    for c, vs in wanted.items()
                )
            )
        paths = [str(self.root / i["path"]) for i in infos]
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
        self,
        df: DataFrame,
        note: str = "",
        meta: dict | None = None,
        partition_by: str | None = None,
        stats_cols: tuple[str, ...] = (),
    ) -> Snapshot:
        """New version whose contents are exactly ``df``. With
        ``partition_by``, data files are laid out per partition value
        and the manifest records each file's partition — enabling
        manifest-level pruned reads and partition-replace commits.
        ``stats_cols`` additionally records per-file column min/max
        (from the just-written footers) for ``read(range_filter=…)``
        skipping; cluster the data on those columns first
        (``repartitionByRange`` + sort) or every file spans the whole
        range and nothing prunes."""
        infos, n_rows = self._write_data(df, partition_by, stats_cols)
        return self._commit("overwrite", infos, n_rows, df.schema.json(), note, meta)

    def commit_append(
        self, df: DataFrame, note: str = "", meta: dict | None = None
    ) -> Snapshot:
        """New version = previous files + ``df``'s files. O(new data):
        nothing existing is rewritten."""
        prev = self.latest_version()
        base: tuple[dict, ...] = ()
        base_rows = 0
        if prev is not None:
            snap = self.snapshot(prev)
            base, base_rows = snap.file_infos, snap.n_rows
        infos, n_rows = self._write_data(df)
        return self._commit(
            "append", base + infos, base_rows + n_rows, df.schema.json(), note, meta
        )

    def commit_replace_partitions(
        self,
        df: DataFrame,
        partition_by: str,
        note: str = "",
        meta: dict | None = None,
        partitions: list | None = None,
    ) -> Snapshot:
        """New version where ONLY the partitions present in ``df`` are
        replaced; every other partition's files carry over untouched
        (dynamic partition overwrite, versioned).

        This is the 100 TB incremental-publish primitive: a daily CDC
        batch touching 3 dates rewrites 3 partitions' files and one
        manifest, not the table. Requires every prior file to carry
        partition info for ``partition_by`` (i.e. the table has always
        been committed partition-aware). Partition values must be
        non-null and hive-encode as ``str(value)`` (ints, dates, plain
        strings).

        ``partitions`` overrides the affected set (default: the values
        present in ``df``) — needed when a replace legitimately EMPTIES
        a partition (e.g. a CDC batch that tombstones its every row):
        the emptied partition has no rows in ``df`` but must still be
        dropped from the carried-over files.
        """
        prev = self.latest_version()
        kept: tuple[dict, ...] = ()
        kept_rows = 0
        if prev is not None:
            snap = self.snapshot(prev)
            bad = [
                i["path"]
                for i in snap.file_infos
                if not (i.get("part") and i["part"].get(partition_by) is not None)
            ]
            if bad:
                raise ValueError(
                    f"cannot replace partitions: {len(bad)} file(s) lack "
                    f"partition info for {partition_by!r} (e.g. {bad[0]})"
                )
            if partitions is not None:
                affected = {str(v) for v in partitions}
            else:
                affected = {
                    str(r[0])
                    for r in df.select(partition_by).distinct().collect()
                }
            kept = tuple(
                i
                for i in snap.file_infos
                if i["part"][partition_by] not in affected
            )
            kept_rows = sum(i["rows"] for i in kept)
        infos, n_rows = self._write_data(df, partition_by)
        return self._commit(
            "replace_partitions",
            kept + infos,
            kept_rows + n_rows,
            df.schema.json(),
            note,
            meta,
        )

    def compact(
        self,
        spark: SparkSession,
        max_files: int = 8,
        note: str = "",
    ) -> Snapshot:
        """Rewrite the CURRENT version's data into ≤ ``max_files``
        files and commit the result — contents identical, file count
        bounded (the small-files answer for append/streaming-heavy
        tables; SURVEY §7.4.5).

        Old versions keep reading their original files (immutability),
        so compaction never blocks time travel; vacuum reclaims the
        fragmented files once their versions expire.
        """
        df = self.read(spark).coalesce(max_files)
        snap = self.commit_overwrite(df, note=note or f"compact to ≤{max_files} files")
        return snap

    def rollback(self, version: int, note: str = "") -> Snapshot:
        """Commit a new version with an old version's exact file list —
        metadata-only undo, no data moves."""
        snap = self.snapshot(version)
        return self._commit(
            "rollback",
            snap.file_infos,
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

    def _write_data(
        self,
        df: DataFrame,
        partition_by: str | None = None,
        stats_cols: tuple[str, ...] = (),
    ) -> tuple[tuple[dict, ...], int]:
        commit_id = uuid.uuid4().hex[:12]
        out = self.data_dir / commit_id
        writer = df.write.mode("overwrite").option("compression", "zstd")
        if partition_by is not None:
            # duplicate the partition column: `__part` drives the hive
            # directory layout, the original column stays IN the data
            # files so explicit-path reads need no partition inference
            df = df.withColumn("__part", df[partition_by])
            writer = df.write.mode("overwrite").option(
                "compression", "zstd"
            ).partitionBy("__part")
        writer.parquet(str(out))
        infos: list[dict] = []
        n_rows = 0
        for p in sorted(out.rglob("*.parquet")):
            meta = pq.ParquetFile(p).metadata
            rows = meta.num_rows
            part = None
            if partition_by is not None:
                # .../data/<commit>/__part=<value>/file.parquet
                pdir = p.parent.name
                part = {partition_by: pdir.split("=", 1)[1]}
            info = {"path": str(p.relative_to(self.root)), "rows": rows, "part": part}
            if stats_cols:
                info["stats"] = _footer_stats(meta, stats_cols)
            infos.append(info)
            n_rows += rows
        return tuple(infos), n_rows

    def _commit(
        self,
        op: str,
        files: tuple[dict, ...],
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

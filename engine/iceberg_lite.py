"""iceberg_lite — a minimal from-scratch snapshot/manifest table layer.

No Iceberg runtime jar in this environment (SURVEY.md §7.0), so the engine
emulates the parts of the spec it actually needs (BASELINE.json north_rule:
"Iceberg tables", "checkpoints per-partition lineage (cell-range -> snapshot ->
output manifest) so any executor loss resumes without recompute"):

- a table is a directory of immutable parquet data files plus JSON manifests;
- each snapshot lists its data files with per-file row counts, byte sizes and
  (optional) partition-key ranges — so row counts and pruning come from metadata,
  never a scan (replaces the reference's full-scan sizing pre-pass,
  /root/reference/.../App.scala:30);
- commits are atomic via write-temp + rename of version-hint;
- append / overwrite / read at snapshot;
- a run checkpoint maps work units (e.g. cell ranges) -> committed output files,
  so a resumed job skips completed units.

Layout:
    <table>/data/part-<uuid>.parquet
    <table>/metadata/snap-<n>.json
    <table>/metadata/version-hint.txt      (current snapshot number)
    <table>/metadata/checkpoint-<run>.json (work-unit lineage)
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DataFileMeta:
    path: str
    rows: int
    bytes: int
    partition_ranges: dict = field(default_factory=dict)  # col -> [min, max]


class Table:
    def __init__(self, location: str):
        self.location = location
        self.meta_dir = os.path.join(location, "metadata")
        self.data_dir = os.path.join(location, "data")

    # -- snapshot bookkeeping ------------------------------------------------
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.txt")

    def current_snapshot_id(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{sid}.json")

    def snapshot(self, sid: int | None = None) -> dict:
        sid = self.current_snapshot_id() if sid is None else sid
        if sid < 0:
            return {"snapshot_id": -1, "files": [], "parent": None}
        with open(self._snap_path(sid)) as f:
            return json.load(f)

    def row_count(self, sid: int | None = None) -> int:
        """Row count from manifest metadata — no scan (S2 in SURVEY.md §2.1)."""
        return sum(f["rows"] for f in self.snapshot(sid)["files"])

    # -- commits ---------------------------------------------------------------
    def _commit(
        self, files: list[dict], operation: str, parent: int, txn: str | None = None
    ) -> int:
        os.makedirs(self.meta_dir, exist_ok=True)
        sid = parent + 1
        snap = {
            "snapshot_id": sid,
            "parent": parent if parent >= 0 else None,
            "operation": operation,
            "timestamp_ms": int(time.time() * 1000),
            "txn": txn,
            "files": files,
        }
        tmp = self._snap_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._snap_path(sid))
        hint_tmp = self._hint_path() + ".tmp"
        with open(hint_tmp, "w") as f:
            f.write(str(sid))
        os.replace(hint_tmp, self._hint_path())  # atomic pointer swap = the commit
        return sid

    def _write_data_files(
        self, df: DataFrame, range_cols: list[str] | None = None
    ) -> list[dict]:
        os.makedirs(self.data_dir, exist_ok=True)
        batch_dir = os.path.join(self.data_dir, f"batch-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(batch_dir)
        spark = df.sparkSession
        files = []
        import pyarrow.parquet as pq

        for name in sorted(os.listdir(batch_dir)):
            if not name.endswith(".parquet"):
                continue
            p = os.path.join(batch_dir, name)
            md = pq.read_metadata(p)
            ranges = {}
            if range_cols:
                schema_names = md.schema.to_arrow_schema().names
                for col in range_cols:
                    if col not in schema_names:
                        continue
                    ci = schema_names.index(col)
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                    if mins:
                        ranges[col] = [min(mins), max(maxs)]
            files.append(
                DataFileMeta(
                    path=p, rows=md.num_rows, bytes=os.path.getsize(p),
                    partition_ranges=ranges,
                ).__dict__
            )
        return files

    def append(
        self,
        df: DataFrame,
        range_cols: list[str] | None = None,
        txn: str | None = None,
    ) -> int:
        """Append a commit; `txn` is an optional idempotence tag recorded INSIDE
        the snapshot JSON (atomic with the commit — Delta's txnAppId/txnVersion
        pattern), checked via txn_committed() by replay-prone writers."""
        parent = self.current_snapshot_id()
        files = self.snapshot(parent)["files"] + self._write_data_files(df, range_cols)
        return self._commit(files, "append", parent, txn=txn)

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        range_cols: list[str] | None = None,
    ) -> int:
        """Rewrite small data files into ~target-sized ones, committed as one
        atomic 'compact' snapshot (bin-pack compaction — the small-files
        problem is what kills table scans at 10^12 rows: per-file open cost
        and manifest bloat). Files already >= target/2 are carried over
        untouched; table contents are bit-identical before/after (test-
        asserted). Returns the new snapshot id (or the current one if there
        is nothing to do)."""
        parent = self.current_snapshot_id()
        snap = self.snapshot(parent)
        small = [f for f in snap["files"] if f["bytes"] < target_file_bytes // 2]
        if len(small) < 2:
            return parent
        keep = [f for f in snap["files"] if f["bytes"] >= target_file_bytes // 2]
        df = spark.read.parquet(*[f["path"] for f in small])
        total = sum(f["bytes"] for f in small)
        n_out = max(1, total // target_file_bytes)
        new_files = self._write_data_files(df.coalesce(int(n_out)), range_cols)
        return self._commit(keep + new_files, "compact", parent)

    def txn_committed(self, txn: str) -> bool:
        """True iff any snapshot in the current chain carries this txn tag.
        O(#snapshots) metadata reads — acceptable for streaming micro-batch
        cadence; a production table would index txn -> snapshot in the hint."""
        sid = self.current_snapshot_id()
        while sid is not None and sid >= 0:
            snap = self.snapshot(sid)
            if snap.get("txn") == txn:
                return True
            sid = snap.get("parent")
        return False

    def overwrite(self, df: DataFrame, range_cols: list[str] | None = None) -> int:
        parent = self.current_snapshot_id()
        return self._commit(self._write_data_files(df, range_cols), "overwrite", parent)

    # -- reads -----------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        sid: int | None = None,
        prune: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Read a snapshot; `prune` maps column -> (lo, hi) and skips data files
        whose manifest range doesn't intersect — partition pruning from metadata."""
        snap = self.snapshot(sid)
        paths = []
        for f in snap["files"]:
            if prune:
                skip = False
                for col, (lo, hi) in prune.items():
                    r = f.get("partition_ranges", {}).get(col)
                    if r is not None and (r[1] < lo or r[0] > hi):
                        skip = True
                        break
                if skip:
                    continue
            paths.append(f["path"])
        if not paths:
            raise ValueError("no data files (empty table or everything pruned)")
        return spark.read.parquet(*paths)

    # -- per-work-unit checkpoint lineage ---------------------------------------
    def _ckpt_path(self, run_id: str) -> str:
        return os.path.join(self.meta_dir, f"checkpoint-{run_id}.json")

    def checkpoint_load(self, run_id: str) -> dict:
        try:
            with open(self._ckpt_path(run_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"run_id": run_id, "units": {}}

    def checkpoint_unit_done(
        self, run_id: str, unit: str, snapshot_id: int, metrics: dict | None = None
    ) -> None:
        """Record one completed work unit (e.g. a cell range) -> snapshot lineage.
        A resumed run skips units already present (resume-without-recompute)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        ck = self.checkpoint_load(run_id)
        ck["units"][unit] = {
            "snapshot_id": snapshot_id,
            "metrics": metrics or {},
            "ts_ms": int(time.time() * 1000),
        }
        tmp = self._ckpt_path(run_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
        os.replace(tmp, self._ckpt_path(run_id))

    def pending_units(self, run_id: str, units: list[str]) -> list[str]:
        done = set(self.checkpoint_load(run_id)["units"])
        return [u for u in units if u not in done]

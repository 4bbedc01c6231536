"""Stage-table catalog: parquet tables with snapshot manifests.

The design target is an Iceberg catalog (BASELINE.json: "resumable from
Iceberg snapshot checkpoints"): every pipeline stage commits its output as an
immutable snapshot, and resume means "start from the last committed stage".
The sandbox has no Iceberg runtime jar, so this module implements the same
contract on plain parquet:

    <warehouse>/<table>/snap-<n>/   immutable parquet data
    <warehouse>/<table>/MANIFEST.json  {current, snapshots[], stage, rows}

Mapping to Iceberg in production: ``commit`` ≡ table.newAppend/replace
snapshot commit; ``MANIFEST.json`` ≡ the catalog pointer; readers always go
through the manifest so a half-written snap-<n> directory is never visible
(write-then-flip, same isolation Iceberg gives via metadata swap).

Everything is driver-side metadata only — data paths are read/written by
Spark executors as ordinary parquet (predicate pushdown and column pruning
fully apply).
"""

from __future__ import annotations

import json
import os
import shutil
import time


class Catalog:
    def __init__(self, warehouse: str) -> None:
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table, "MANIFEST.json")

    def _read_manifest(self, table: str) -> dict | None:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def current_snapshot(self, table: str) -> dict | None:
        manifest = self._read_manifest(table)
        if not manifest or manifest.get("current") is None:
            return None
        snap_id = manifest["current"]
        return next(s for s in manifest["snapshots"] if s["id"] == snap_id)

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def path(self, table: str) -> str:
        return self.paths(table)[0]

    def paths(self, table: str) -> list[str]:
        """All data dirs of the current snapshot (append snapshots reference
        prior dirs plus their own — the Iceberg manifest-list analog)."""
        snap = self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        dirs = snap.get("dirs") or [snap["dir"]]
        return [os.path.join(self.warehouse, table, d) for d in dirs]

    # -- commit / read -----------------------------------------------------
    def commit(self, df, table: str, stage: str | None = None,
               append: bool = False, batch_id: str | None = None) -> dict:
        """Write df as the next snapshot of `table`, then flip the manifest.

        ``append=True`` writes only df's rows into the new snapshot dir and
        the snapshot references the previous snapshot's dirs as well —
        an Iceberg fast-append (no rewrite of existing data).

        ``batch_id`` tags the snapshot with an idempotency key (Iceberg's
        wap.id analog): retried incremental batches check
        ``batch_appended`` and skip instead of double-appending."""
        manifest = self._read_manifest(table) or {"current": None, "snapshots": []}
        next_id = (
            max((s["id"] for s in manifest["snapshots"]), default=0) + 1
        )
        snap_dir = f"snap-{next_id:05d}"
        out = os.path.join(self.warehouse, table, snap_dir)
        started = time.time()
        df.write.mode("overwrite").parquet(out)
        dirs = [snap_dir]
        if append and manifest["current"] is not None:
            prev = next(
                s for s in manifest["snapshots"] if s["id"] == manifest["current"]
            )
            dirs = (prev.get("dirs") or [prev["dir"]]) + [snap_dir]
        snap = {
            "id": next_id,
            "dir": snap_dir,
            "dirs": dirs,
            "stage": stage or table,
            "committed_at": time.time(),
            "write_seconds": round(time.time() - started, 3),
        }
        if batch_id is not None:
            snap["batch_id"] = batch_id
        manifest["snapshots"].append(snap)
        manifest["current"] = next_id
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, self._manifest_path(table))  # atomic flip
        return snap

    def batch_appended(self, table: str, batch_id: str) -> bool:
        """True iff a snapshot tagged with batch_id is part of the CURRENT
        snapshot's data-dir chain (i.e. the batch's rows are live)."""
        manifest = self._read_manifest(table)
        if not manifest or manifest.get("current") is None:
            return False
        cur = next(
            s for s in manifest["snapshots"] if s["id"] == manifest["current"]
        )
        live = set(cur.get("dirs") or [cur["dir"]])
        return any(
            s.get("batch_id") == batch_id and s["dir"] in live
            for s in manifest["snapshots"]
        )

    def batch_paths(self, table: str, batch_id: str) -> list[str]:
        """Data dirs written by the snapshot(s) tagged with batch_id."""
        manifest = self._read_manifest(table) or {"snapshots": []}
        return [
            os.path.join(self.warehouse, table, s["dir"])
            for s in manifest["snapshots"]
            if s.get("batch_id") == batch_id
        ]

    def read(self, spark, table: str):
        return spark.read.parquet(*self.paths(table))

    def drop(self, table: str) -> None:
        target = os.path.join(self.warehouse, table)
        if os.path.exists(target):
            shutil.rmtree(target)

    def tables(self) -> list[str]:
        if not os.path.isdir(self.warehouse):
            return []
        return sorted(
            name
            for name in os.listdir(self.warehouse)
            if os.path.exists(self._manifest_path(name))
        )

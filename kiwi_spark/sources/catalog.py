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

    # -- warehouse properties ---------------------------------------------
    # catalog-level key/value metadata (the Iceberg table-properties
    # analog) — e.g. the link_mode the graph was built with, so a later
    # incremental batch can't silently relink with a mismatched key family
    def _properties_path(self) -> str:
        return os.path.join(self.warehouse, "PROPERTIES.json")

    def properties(self) -> dict:
        path = self._properties_path()
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return json.load(fh)

    def get_property(self, key: str, default=None):
        return self.properties().get(key, default)

    def set_property(self, key: str, value) -> None:
        props = self.properties()
        props[key] = value
        tmp = self._properties_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(props, fh, indent=2)
        os.replace(tmp, self._properties_path())  # atomic flip

    # -- single-writer guard ----------------------------------------------
    def mutation_lock(self):
        """Exclusive per-warehouse mutation lock (context manager).

        Mutating entrypoints (full run, incremental add/remove) must be
        serialized per warehouse: batch idempotency keys assume no other
        mutation lands between a batch's first commit and its completion
        (e.g. a removal bumping removal_epoch mid-add would orphan the
        add's retry tag). This is the local-driver stand-in for Iceberg's
        optimistic commit-conflict detection — flock releases on process
        death, so a crashed run never wedges the warehouse."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def _lock():
            path = os.path.join(self.warehouse, "MUTATION.lock")
            # append mode: a LOSING contender must not truncate the
            # holder's recorded pid (the file's debugging value) before
            # its own flock attempt fails
            fh = open(path, "a+")
            try:
                fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                fh.close()
                raise RuntimeError(
                    f"another mutation is in progress on warehouse "
                    f"{self.warehouse!r} (single-writer discipline); retry "
                    "after it completes"
                ) from None
            try:
                fh.seek(0)
                fh.truncate()
                fh.write(f"{os.getpid()}\n")
                fh.flush()
                yield
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)
                fh.close()

        return _lock()

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
               append: bool = False, batch_id: str | None = None,
               delete_keys=None, delete_on: list[str] | None = None,
               batch_ids: list[str] | None = None,
               delete_sets: list[tuple] | None = None,
               partition_by: list[str] | None = None,
               sort_within: list[str] | None = None) -> dict:
        """Write df as the next snapshot of `table`, then flip the manifest.

        ``partition_by`` declares the table's physical layout (the Iceberg
        partition-spec analog, e.g. ``bucket(entity_id)`` materialized as a
        hash column): the first commit that passes it records the spec in
        the manifest, and EVERY later commit — appends, pure-delete
        commits, compaction — re-applies it automatically, so the layout
        survives the table's whole lifecycle. The write clusters rows
        (repartition on the spec columns, optional ``sort_within`` for
        row-group stats on a secondary key) and writes hive-style
        partition dirs, giving readers partition-pruned scans for
        ``col IN (...)`` probes (the delta paths' touched-bucket filters).

        ``append=True`` writes only df's rows into the new snapshot dir and
        the snapshot references the previous snapshot's dirs as well —
        an Iceberg fast-append (no rewrite of existing data).

        ``delete_keys`` + ``delete_on`` (requires ``append=True``) add an
        Iceberg *equality-delete* to the same commit: delete_keys is a
        DataFrame of key tuples, delete_on the key column names. Readers
        anti-join the delete set against rows from EARLIER snapshots only —
        rows appended by this commit (or later) are not affected, exactly
        Iceberg's sequence-number rule. This makes incremental maintenance
        commits O(changed rows): old rows are masked, not rewritten.
        Read amplification grows with the delete chain; ``compact()``
        rewrites the table to a single clean snapshot.

        ``delete_sets`` is the multi-predicate form: a list of
        (keys_df, key_cols) pairs, each applied as an independent
        anti-join — a row from an earlier snapshot is masked if ANY set
        matches it (e.g. edges deleted by src_id ∈ S plus dst_id ∈ S).

        ``batch_id`` tags the snapshot with an idempotency key (Iceberg's
        wap.id analog): retried incremental batches check
        ``batch_appended`` and skip instead of double-appending."""
        all_deletes = list(delete_sets or [])
        if delete_keys is not None:
            all_deletes.append((delete_keys, delete_on))
        if all_deletes and not (
            append and all(cols for _, cols in all_deletes)
        ):
            raise ValueError("delete sets require append=True and key columns")
        manifest = self._read_manifest(table) or {"current": None, "snapshots": []}
        if partition_by:
            manifest["partition_by"] = list(partition_by)
            if sort_within:
                manifest["sort_within"] = list(sort_within)
        # the schema rides in the manifest so a table whose every live
        # data file has been masked away (possible on partitioned tables,
        # where an empty write emits no files at all) stays readable
        manifest["schema"] = df.schema.jsonValue()
        layout = manifest.get("partition_by")
        next_id = (
            max((s["id"] for s in manifest["snapshots"]), default=0) + 1
        )
        snap_dir = f"snap-{next_id:05d}"
        out = os.path.join(self.warehouse, table, snap_dir)
        started = time.time()
        if layout:
            clustered = df.repartition(*layout)
            if manifest.get("sort_within"):
                clustered = clustered.sortWithinPartitions(
                    *manifest["sort_within"]
                )
            clustered.write.mode("overwrite").partitionBy(*layout).parquet(out)
        else:
            df.write.mode("overwrite").parquet(out)
        for i, (keys_df, cols) in enumerate(all_deletes):
            suffix = f"-deletes{i if i else ''}"
            keys_df.select(*cols).write.mode("overwrite").parquet(
                os.path.join(self.warehouse, table, snap_dir + suffix)
            )
        dirs = [snap_dir]
        deletes = []
        if append and manifest["current"] is not None:
            prev = next(
                s for s in manifest["snapshots"] if s["id"] == manifest["current"]
            )
            dirs = (prev.get("dirs") or [prev["dir"]]) + [snap_dir]
            deletes = list(prev.get("deletes") or [])
        for i, (_keys_df, cols) in enumerate(all_deletes):
            suffix = f"-deletes{i if i else ''}"
            deletes.append(
                {"dir": snap_dir + suffix, "on": list(cols), "seq": next_id}
            )
        snap = {
            "id": next_id,
            "dir": snap_dir,
            "dirs": dirs,
            "stage": stage or table,
            "committed_at": time.time(),
            "write_seconds": round(time.time() - started, 3),
        }
        if deletes:
            snap["deletes"] = deletes
        if batch_id is not None:
            snap["batch_id"] = batch_id
        if batch_ids:
            snap["batch_ids"] = sorted(batch_ids)
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
            s["dir"] in live
            and (
                s.get("batch_id") == batch_id
                or batch_id in (s.get("batch_ids") or [])
            )
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

    @staticmethod
    def _dir_has_data(path: str) -> bool:
        """True iff the dir holds at least one parquet data file. A
        partitioned write of zero rows emits no partition dirs at all
        (just _SUCCESS) — such dirs must be skipped at read time."""
        for root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def table_schema(self, spark, table: str):
        """Schema of the table from its first data-bearing snapshot dir
        (partition columns included via discovery), falling back to the
        manifest's recorded schema when no live dir holds data files
        (e.g. a fully-masked-then-compacted partitioned table)."""
        for path in self.paths(table):
            if self._dir_has_data(path):
                return spark.read.parquet(path).schema
        recorded = (self._read_manifest(table) or {}).get("schema")
        if recorded:
            from pyspark.sql.types import StructType

            return StructType.fromJson(recorded)
        raise FileNotFoundError(f"table {table!r} has no data files")

    def _read_paths(self, spark, table: str, paths: list[str],
                    layout: list[str] | None):
        """One DataFrame over several snapshot dirs. Partitioned tables
        must be read per root dir and unioned (Spark's partition discovery
        rejects multiple roots), which also keeps per-scan
        PartitionFilters pushdown; dataless dirs are skipped."""
        if not layout:
            return spark.read.parquet(*paths)
        out = None
        for path in paths:
            if not self._dir_has_data(path):
                continue
            part = spark.read.parquet(path)
            out = part if out is None else out.unionByName(part)
        if out is None:
            return spark.createDataFrame([], self.table_schema(spark, table))
        return out

    def read(self, spark, table: str):
        snap = self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        layout = (self._read_manifest(table) or {}).get("partition_by")
        deletes = snap.get("deletes") or []
        if not deletes:
            return self._read_paths(spark, table, self.paths(table), layout)
        # merge-on-read: equality deletes mask rows from snapshots OLDER
        # than the delete (Iceberg sequence-number semantics) — a commit
        # that deletes key K and appends new K rows keeps the new rows.
        # Dirs sharing the same applicable delete set are read together.
        dirs = snap.get("dirs") or [snap["dir"]]
        by_delset: dict[tuple, list[str]] = {}
        for d in dirs:
            seq = int(d.split("-")[1])
            applicable = tuple(
                i for i, dl in enumerate(deletes) if dl["seq"] > seq
            )
            by_delset.setdefault(applicable, []).append(
                os.path.join(self.warehouse, table, d)
            )
        out = None
        for applicable, paths in sorted(by_delset.items()):
            part = self._read_paths(spark, table, paths, layout)
            for i in applicable:
                dl = deletes[i]
                keys = spark.read.parquet(
                    os.path.join(self.warehouse, table, dl["dir"])
                )
                part = part.join(keys, on=list(dl["on"]), how="left_anti")
            out = part if out is None else out.unionByName(part)
        return out

    def live_batch_ids(self, table: str) -> list[str]:
        """Batch ids whose rows are part of the current snapshot's data-dir
        chain — a full-rewrite commit (compaction, index retrain) must
        carry these forward so retried batches still skip."""
        manifest = self._read_manifest(table) or {"snapshots": []}
        cur = self.current_snapshot(table)
        live = set((cur.get("dirs") or [cur["dir"]])) if cur else set()
        return sorted(
            {
                b
                for s in manifest["snapshots"]
                if s["dir"] in live
                for b in ([s["batch_id"]] if s.get("batch_id") else [])
                + list(s.get("batch_ids") or [])
            }
        )

    def compact(self, spark, table: str, stage: str | None = None) -> dict:
        """Rewrite the table's merged view as one clean snapshot — the
        Iceberg rewrite-data-files action that bounds MOR read
        amplification. Call after every N incremental batches. Batch-id
        provenance of the compacted-away snapshots is carried forward IN
        THE SAME atomic manifest flip as the rewrite, so a crash can
        never leave a current snapshot that has forgotten which batches
        are live (``batch_appended`` would otherwise double-append on
        retry)."""
        return self.commit(
            self.read(spark, table), table, stage=stage,
            batch_ids=self.live_batch_ids(table) or None,
        )

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

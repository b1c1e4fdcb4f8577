"""Snapshot catalog: bucketed-parquet tables + JSON manifests.

Stands in for an Iceberg catalog (SURVEY.md §7 phase 2 — the sandbox
has no Iceberg runtime jar) behind one seam: every epoch commits an
atomic snapshot per table (directory + manifest), resume reads the
latest consistent manifest set. The physical layout is the same story
Iceberg would give us:

* every state table is written partitioned by `bucket` =
  pmod(xxhash64(host), n_buckets) — co-partitioning the seen-set
  anti-join and the politeness window by host hash so neither needs a
  full shuffle of the big side at read time;
* manifests carry row counts + per-partition lineage metrics, so a
  resumed run can verify it sees exactly the state the failed run
  committed (north_rule: exact resume with per-partition lineage).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    def __init__(self, root: str, n_buckets: int = 32):
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ---- paths ----
    def table_path(self, table: str, epoch: int) -> str:
        return os.path.join(self.root, table, f"epoch={epoch:05d}")

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, "_manifests", f"epoch_{epoch:05d}.json")

    # ---- commit ----
    def write_table(
        self, df: DataFrame, table: str, epoch: int, bucket_col: str | None = "host"
    ) -> dict:
        path = self.table_path(table, epoch)
        out = df
        if bucket_col is not None and bucket_col in df.columns:
            out = df.withColumn(
                "bucket",
                F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(self.n_buckets)).cast(
                    "int"
                ),
            )
            out.write.mode("overwrite").partitionBy("bucket").parquet(path)
        else:
            out.write.mode("overwrite").parquet(path)
        return {"table": table, "path": path}

    def commit(self, epoch: int, tables: list[dict], metrics: dict) -> None:
        """Atomic-enough snapshot commit: the manifest is written last,
        via rename, so a crash mid-epoch leaves the previous manifest as
        the latest consistent snapshot."""
        manifest = {
            "epoch": epoch,
            "committed_at": time.time(),
            "n_buckets": self.n_buckets,
            "tables": tables,
            "metrics": metrics,
        }
        tmp = self.manifest_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self.manifest_path(epoch))

    def seen_parts(self, epoch: int) -> list[str]:
        """The parquet paths whose union is the seen set at `epoch`
        (append-only deltas + compaction bases, recorded per manifest).
        epoch < 0 -> [] (crawl start)."""
        if epoch < 0:
            return []
        m = self.read_manifest(epoch)
        return list(m["metrics"].get("seen_parts", []))

    # ---- bucketed tables (storage-partitioned joins) ----
    def write_bucketed_table(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        epoch: int,
        key: str = "url_sha1",
    ) -> str:
        """Write as a bucketBy/sortBy table (external, under the
        catalog root). Two tables bucketed by the same key and count
        join with ZERO exchange (SortMergeJoin over co-located buckets)
        — the plan that replaces broadcast once `seen` outgrows a
        broadcast at 10^10 keys. Verified by
        tests/test_plan_quality.py::test_bucketed_seen_join_no_exchange."""
        name = f"{table}_e{epoch:05d}"
        path = self.table_path(f"{table}_bucketed", epoch)
        (
            df.write.mode("overwrite")
            .option("path", path)
            .bucketBy(self.n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
        return name

    def read_bucketed_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(name)

    # ---- resume ----
    def latest_epoch(self) -> int | None:
        mdir = os.path.join(self.root, "_manifests")
        epochs = [
            int(name[len("epoch_") : -len(".json")])
            for name in os.listdir(mdir)
            if name.startswith("epoch_") and name.endswith(".json")
        ]
        return max(epochs) if epochs else None

    def read_manifest(self, epoch: int) -> dict:
        with open(self.manifest_path(epoch)) as f:
            return json.load(f)

    def read_table(self, spark: SparkSession, table: str, epoch: int) -> DataFrame:
        df = spark.read.parquet(self.table_path(table, epoch))
        # the bucket partition column is physical layout, not table schema
        return df.drop("bucket") if "bucket" in df.columns else df

    # ---- snapshot maintenance (the Iceberg expire/rollback story) ----
    def list_epochs(self) -> list[int]:
        mdir = os.path.join(self.root, "_manifests")
        return sorted(
            int(name[len("epoch_"): -len(".json")])
            for name in os.listdir(mdir)
            if name.startswith("epoch_") and name.endswith(".json")
        )

    def referenced_paths(self, epochs: list[int]) -> set:
        """Every physical path any of `epochs`' manifests still needs:
        the epoch's own table dirs plus the seen parts its snapshot
        references — which, under append-only seen storage, reach BACK
        into older epochs' seen_delta dirs."""
        refs: set = set()
        for e in epochs:
            m = self.read_manifest(e)
            for t in m.get("tables", []):
                refs.add(os.path.normpath(t["path"]))
            for p in m["metrics"].get("seen_parts", []):
                refs.add(os.path.normpath(p))
        return refs

    def expire_snapshots(self, keep_last: int = 8) -> dict:
        """Drop all but the newest `keep_last` snapshots and delete
        table directories no surviving snapshot references — bounded
        catalog storage for a 10^3-epoch crawl, where otherwise every
        epoch's schedule/queue table lives forever.

        Safety model (same as Iceberg's expire_snapshots): a path is
        deleted only if NO surviving manifest references it, so the
        append-only seen deltas a compacted-or-not latest snapshot
        still needs always survive, and `resume_state` after expiry is
        byte-identical to before. Manifests are removed first, data
        dirs second — a crash in between leaves only unreferenced
        orphan dirs (re-run to finish), never a manifest pointing at
        deleted data."""
        import shutil

        if keep_last < 1:
            # epochs[:-0] would silently keep everything; and keeping
            # ZERO snapshots is crawl-state destruction, which should
            # be an explicit rmtree, not an expiry policy
            raise ValueError("keep_last must be >= 1")
        epochs = self.list_epochs()
        # the orphan sweep runs even when no manifest expires: rollback
        # leaves newer epochs' data dirs unreferenced on purpose, and
        # this is the pass that reclaims them
        expired = epochs[:-keep_last] if len(epochs) > keep_last else []
        kept = epochs[len(expired):]
        keep_refs = self.referenced_paths(kept)
        for e in expired:
            os.remove(self.manifest_path(e))
        deleted = []
        for table in sorted(os.listdir(self.root)):
            tdir = os.path.join(self.root, table)
            # *_bucketed dirs belong to the Spark metastore (saveAsTable),
            # not the snapshot manifests — outside this contract; drop
            # them with DROP TABLE, not a file sweep
            if (
                table == "_manifests"
                or table.endswith("_bucketed")
                or not os.path.isdir(tdir)
            ):
                continue
            for ep_dir in sorted(os.listdir(tdir)):
                path = os.path.normpath(os.path.join(tdir, ep_dir))
                if path not in keep_refs:
                    shutil.rmtree(path)
                    deleted.append(path)
        return {"expired_epochs": expired, "deleted_dirs": deleted}

    def rollback(self, epoch: int) -> list[int]:
        """Time travel: drop every snapshot NEWER than `epoch` so
        `resume_state` resumes from it. Only manifests are removed —
        newer epochs' data dirs become unreferenced orphans that the
        next `expire_snapshots` sweeps, mirroring Iceberg's
        rollback-then-expire contract (rollback stays instant and
        safely crash-interruptible)."""
        dropped = [e for e in self.list_epochs() if e > epoch]
        if epoch not in self.list_epochs():
            raise ValueError(f"no snapshot for epoch {epoch}")
        for e in dropped:
            os.remove(self.manifest_path(e))
        return dropped

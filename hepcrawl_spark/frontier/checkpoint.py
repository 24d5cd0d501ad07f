"""Resumable crawl checkpoints (F7) with atomic per-round commits.

Layout (one directory per crawl):

    <root>/rounds/round-<N>/<table>/   parquet per state table
    <root>/rounds/round-<N>/MANIFEST.json   written last, atomically

A round is committed iff its MANIFEST exists; the manifest is written
to a temp name and ``os.rename``d (atomic on POSIX), so a killed job
leaves at most an uncommitted round directory that resume ignores and
overwrites.  This mirrors the reference's JOBDIR persistence
(/root/reference/hepcrawl/settings.py:120) and is exactly the Iceberg
snapshot-commit protocol: on a cluster, swap FilesystemRoundStore for
Iceberg tables (one snapshot per round; manifest = snapshot commit) —
the round loop only talks to this interface.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


class RoundStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)

    # -- commit protocol ------------------------------------------------------

    def _round_dir(self, n: int) -> str:
        return os.path.join(self.root, "rounds", f"round-{n:05d}")

    def _manifest_path(self, n: int) -> str:
        return os.path.join(self._round_dir(n), "MANIFEST.json")

    def last_committed_round(self) -> Optional[int]:
        rounds_dir = os.path.join(self.root, "rounds")
        committed = []
        for name in os.listdir(rounds_dir):
            if name.startswith("round-") and os.path.exists(
                os.path.join(rounds_dir, name, "MANIFEST.json")
            ):
                committed.append(int(name.split("-")[1]))
        return max(committed) if committed else None

    def commit_round(self, n: int, tables: Dict[str, DataFrame],
                     meta: dict | None = None) -> None:
        rdir = self._round_dir(n)
        if os.path.exists(rdir):  # uncommitted leftovers from a kill
            shutil.rmtree(rdir)
        os.makedirs(rdir)
        manifest = {"round": n, "tables": {}, "meta": meta or {}}
        for name, df in tables.items():
            path = os.path.join(rdir, name)
            df.write.mode("overwrite").parquet(path)
            manifest["tables"][name] = name
        tmp = self._manifest_path(n) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest_path(n))  # atomic commit point

    def read_table(self, n: int, name: str) -> Optional[DataFrame]:
        if not os.path.exists(self._manifest_path(n)):
            return None
        path = os.path.join(self._round_dir(n), name)
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def read_meta(self, n: int) -> dict:
        with open(self._manifest_path(n)) as fh:
            return json.load(fh)["meta"]

    # -- append-only outputs (records / lineage across all rounds) -----------

    def records_path(self, n: int) -> str:
        return os.path.join(self._round_dir(n), "records")

    def all_records(self) -> Optional[DataFrame]:
        last = self.last_committed_round()
        if last is None:
            return None
        paths = [
            self.records_path(i)
            for i in range(last + 1)
            if os.path.exists(self.records_path(i))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def all_lineage(self) -> Optional[DataFrame]:
        return self._all_table("lineage")

    def all_errors(self) -> Optional[DataFrame]:
        return self._all_table("errors")

    def _all_table(self, name: str) -> Optional[DataFrame]:
        last = self.last_committed_round()
        if last is None:
            return None
        paths = [
            os.path.join(self._round_dir(i), name)
            for i in range(last + 1)
            if os.path.exists(os.path.join(self._round_dir(i), name))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

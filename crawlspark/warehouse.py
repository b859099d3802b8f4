"""Snapshot warehouse — atomic per-round commits + exact resume.

This is the engine analog of the reference's temp-table → atomic-rename publish
(/root/reference/src/storage/database_sink.rs:91-101 temp DDL, 258-284 the
SERIALIZABLE drop+rename swap): every crawl round commits its state/appends as
immutable parquet snapshot directories, and a single atomic manifest swap
(write-temp + ``os.replace``) is the commit point — exactly Iceberg's
metadata-pointer model. On a real cluster this module is swapped for Iceberg
(``writeTo(...).append()`` / ``overwritePartitions``) without touching callers;
the container ships no Iceberg jars, so the same ACID contract is provided on
plain parquet.

Guarantees used by the resume test:
* a round is visible iff the manifest names it (partial writes are invisible)
* ``commit_round`` is idempotent — re-committing a committed round is a no-op
  (reference analog: re-running after migrate_schema does not double-publish)
* state tables ("snapshot") expose only the latest round; fact tables
  ("append") expose the union of all committed rounds
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Warehouse:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._manifest_path = self.path / "manifest.json"

    # -- manifest ----------------------------------------------------------
    def manifest(self) -> dict:
        if self._manifest_path.exists():
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"last_round": -1, "tables": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # the atomic commit point

    def last_round(self) -> int:
        return self.manifest()["last_round"]

    # -- commit ------------------------------------------------------------
    def commit_round(
        self,
        round_: int,
        snapshots: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        local_appends: dict[str, "object"] | None = None,
    ) -> bool:
        """Write all tables for a round, then publish atomically.

        ``local_appends`` maps table name → pyarrow Table for tiny
        driver-side facts (e.g. the 1-row metrics record) — written directly
        with pyarrow, no Spark job.

        Returns False (no-op) if the round is already committed — idempotent
        re-commit for resume.
        """
        m = self.manifest()
        if round_ <= m["last_round"]:
            return False

        import pyarrow.parquet as pq

        for name, table in (local_appends or {}).items():
            final = self._round_dir(name, round_)
            final.parent.mkdir(parents=True, exist_ok=True)
            staging = final.parent / f"_staging_r{round_:06d}"
            if staging.exists():
                shutil.rmtree(staging)
            staging.mkdir()
            pq.write_table(table, staging / "part-0.parquet")
            if final.exists():
                shutil.rmtree(final)
            os.rename(staging, final)
            t = m["tables"].setdefault(name, {"kind": "append", "rounds": []})
            if round_ not in t["rounds"]:
                t["rounds"].append(round_)

        import time as _time

        timing = os.environ.get("CRAWLSPARK_TIMING") == "1"
        written: list[tuple[str, str, Path]] = []
        for kind, tables in (("snapshot", snapshots or {}), ("append", appends or {})):
            for name, df in tables.items():
                t0 = _time.time()
                final = self._round_dir(name, round_)
                staging = final.parent / f"_staging_r{round_:06d}"
                if staging.exists():
                    shutil.rmtree(staging)
                final.parent.mkdir(parents=True, exist_ok=True)
                df.write.mode("overwrite").parquet(str(staging))
                if final.exists():  # crashed post-rename pre-manifest: replace
                    shutil.rmtree(final)
                os.rename(staging, final)
                written.append((kind, name, final))
                if timing:
                    import sys as _sys

                    _sys.stderr.write(
                        f"[timing commit] {name}: {_time.time() - t0:.2f}s\n"
                    )

        for kind, name, _ in written:
            t = m["tables"].setdefault(name, {"kind": kind, "rounds": []})
            t["kind"] = kind
            if round_ not in t["rounds"]:
                t["rounds"].append(round_)
        m["last_round"] = round_
        self._write_manifest(m)
        return True

    def write_once(self, name: str, df: DataFrame) -> None:
        """One-time dimension table (e.g. the (name, hash) translation table,
        reference src/storage/database_sink.rs:104-125)."""
        final = self.path / name / "r000000"
        if final.exists():
            return
        staging = final.parent / "_staging"
        if staging.exists():
            shutil.rmtree(staging)
        final.parent.mkdir(parents=True, exist_ok=True)
        df.write.mode("overwrite").parquet(str(staging))
        os.rename(staging, final)
        m = self.manifest()
        m["tables"].setdefault(name, {"kind": "snapshot", "rounds": [0]})
        self._write_manifest(m)

    # -- read --------------------------------------------------------------
    def _round_dir(self, name: str, round_: int) -> Path:
        return self.path / name / f"r{round_:06d}"

    def read_state(
        self, spark: SparkSession, name: str, schema: StructType | None = None
    ) -> DataFrame:
        """Latest committed snapshot of a state table (empty df if absent)."""
        t = self.manifest()["tables"].get(name)
        if not t or not t["rounds"]:
            assert schema is not None, f"no snapshot for {name} and no schema"
            return SparkSession.getActiveSession().createDataFrame([], schema)
        return spark.read.parquet(str(self._round_dir(name, max(t["rounds"]))))

    def read_appends(
        self, spark: SparkSession, name: str, schema: StructType | None = None
    ) -> DataFrame:
        """Union of all committed append snapshots of a fact table."""
        t = self.manifest()["tables"].get(name)
        if not t or not t["rounds"]:
            assert schema is not None, f"no appends for {name} and no schema"
            return SparkSession.getActiveSession().createDataFrame([], schema)
        dirs = [str(self._round_dir(name, r)) for r in sorted(t["rounds"])]
        return spark.read.parquet(*dirs)

    def has_table(self, name: str) -> bool:
        t = self.manifest()["tables"].get(name)
        return bool(t and t["rounds"])

"""Write-audit-publish on plain parquet, with dry-run and provenance.

The reference wraps every bulk load in a transaction that attaches an
ObjectMeta provenance row and rolls back under GERRYDB_DRY_RUN
(/root/reference/gerrydb_etl/db.py:24-69). On a filesystem store the
same contract is write-audit-publish:

    stage:   write the new table version to  <root>/v=<n>_<uuid>/
    audit:   run caller validations against the staged files
    publish: atomically point <root>/_CURRENT at the staged version
             (write-temp + os.replace — atomic on POSIX)

A failed audit or dry_run=True leaves the staged directory behind
(inspectable) but never moves the pointer — readers only ever see
fully-written versions. This is the plain-parquet equivalent of the
nested-transaction close+insert in db.py:135, and the pattern Delta/
Iceberg implement with manifest files.

Scale: publish cost is O(1) (one pointer write) regardless of table
size; concurrent readers hold the version they resolved at read
time (snapshot isolation per query).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

CURRENT_POINTER = "_CURRENT"
META_FILE = "_meta.json"


class AuditError(RuntimeError):
    """An audit check rejected the staged version."""


class VersionedTable:
    """A parquet table with atomic version publication."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- write side ----------------------------------------------------
    def write(
        self,
        df: DataFrame,
        audits: list[Callable[[DataFrame], None]] | None = None,
        notes: str = "",
        source_fingerprint: str | None = None,
        dry_run: bool = False,
    ) -> str:
        """Stage df, audit it, publish unless dry_run. Returns the
        staged version directory name."""
        version = f"v_{uuid.uuid4().hex[:12]}"
        stage_dir = os.path.join(self.root, version)
        df.write.mode("errorifexists").parquet(stage_dir)

        staged = self.spark.read.parquet(stage_dir)
        for audit in audits or []:
            try:
                audit(staged)
            except AssertionError as exc:
                raise AuditError(f"audit failed for {version}: {exc}") from exc

        meta = {
            "meta_id": version,
            "notes": notes,
            "created_at": datetime.now(timezone.utc).isoformat(),
            "source_fingerprint": source_fingerprint,
            "rows": staged.count(),
        }
        with open(os.path.join(stage_dir, META_FILE), "w") as f:
            json.dump(meta, f)

        if dry_run:
            return version
        self._publish(version)
        return version

    def _publish(self, version: str) -> None:
        tmp = os.path.join(self.root, f".{CURRENT_POINTER}.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(self.root, CURRENT_POINTER))  # atomic

    # -- read side -----------------------------------------------------
    def current_version(self) -> str | None:
        ptr = os.path.join(self.root, CURRENT_POINTER)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return f.read().strip()

    def read(self) -> DataFrame:
        version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no published version in {self.root}")
        return self.spark.read.parquet(os.path.join(self.root, version))

    def meta(self) -> dict | None:
        version = self.current_version()
        if version is None:
            return None
        with open(os.path.join(self.root, version, META_FILE)) as f:
            return json.load(f)


def fingerprint_file(path: str) -> str:
    """SHA-256 of a source file — the provenance fingerprint the
    reference computes on every download (gerrydb_etl/__init__.py:54)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()

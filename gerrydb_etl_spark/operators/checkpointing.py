"""Checkpoint hygiene shared by the lineage-truncating operators
(dense ids, connected components).

Two standard Spark gotchas handled here, once:

* ``DataFrame.checkpoint(eager=True)`` launches a separate job to
  write the checkpoint files; without a prior ``persist`` that job
  RE-EXECUTES the whole upstream plan, so the expensive sort/pair
  pipeline the checkpoint exists to pin runs twice.
  (``localCheckpoint`` caches internally and does not need this.)
* ``SparkContext.setCheckpointDir`` mutates global context state and
  creates a fresh UUID subdirectory on every call, so it should only
  run when the directory is unset or actually different.
"""

from __future__ import annotations

import posixpath

from pyspark import SparkContext
from pyspark.sql import DataFrame


def _strip_scheme(path: str) -> str:
    return path.split(":", 1)[1] if ":" in path.split("/", 1)[0] else path


def ensure_checkpoint_dir(sc: SparkContext, checkpoint_dir: str) -> None:
    """Set the context checkpoint dir only when unset or pointing at
    a different directory. ``getCheckpointDir`` reports the resolved
    ``<scheme>:<dir>/<uuid>`` subdir, so compare the PARENT path
    exactly (scheme stripped, both sides absolute-normalized) — a
    suffix match would wrongly treat ``/data/jobs/ckpt`` as already
    satisfying a request for ``/jobs/ckpt``."""
    cur = sc.getCheckpointDir()
    want = posixpath.normpath(_strip_scheme(checkpoint_dir.rstrip("/")))
    if cur is not None:
        have = posixpath.normpath(
            posixpath.dirname(_strip_scheme(cur.rstrip("/")))
        )
        if have == want:
            return
    sc.setCheckpointDir(checkpoint_dir)


def checkpoint_once(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize ``df`` exactly once and truncate its lineage.

    ``checkpoint_dir=None`` -> ``localCheckpoint`` (executor-local,
    fast, non-resilient — the right default on a single node).
    Otherwise a RELIABLE checkpoint: persist -> checkpoint ->
    unpersist, so the upstream plan executes once (into the cache),
    the checkpoint write job reads cached blocks instead of
    recomputing, and the cache is released as soon as the checkpoint
    files serve subsequent reads.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    ensure_checkpoint_dir(df.sparkSession.sparkContext, checkpoint_dir)
    cached = df.persist()
    out = cached.checkpoint(eager=True)
    cached.unpersist()
    return out

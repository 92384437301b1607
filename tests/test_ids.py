"""Dense-ID assignment (operators/ids.py): density, key-order
correctness, determinism across invocations, and degenerate inputs.
The registered query's oracle already proves parity with the
single-reducer row_number(); these pin the operator's contract on
inputs the corpus can't produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.ids import assign_dense_ids


def test_ids_are_dense_and_key_ordered(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 7919 % 1000).alias("k"), F.col("id").alias("payload")
    )
    out = assign_dense_ids(df, ["k"], num_partitions=8).collect()
    assert len(out) == 1000
    by_id = sorted(out, key=lambda r: r["row_id"])
    assert [r["row_id"] for r in by_id] == list(range(1000))
    ks = [r["k"] for r in by_id]
    assert ks == sorted(ks)


def test_ids_deterministic_across_runs(spark):
    df = spark.range(0, 500).select((F.col("id") % 97).alias("salt"), "id")
    a = {r["id"]: r["row_id"] for r in assign_dense_ids(df, ["id"], num_partitions=5).collect()}
    b = {r["id"]: r["row_id"] for r in assign_dense_ids(df, ["id"], num_partitions=5).collect()}
    assert a == b


def test_ids_single_row_and_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(42, "x")], ["k", "v"])
    (row,) = assign_dense_ids(df, ["k"], num_partitions=8).collect()
    assert row["row_id"] == 0 and row["k"] == 42 and row["v"] == "x"


def test_ids_empty_input(spark):
    df = spark.createDataFrame([], "k INT, v STRING")
    assert assign_dense_ids(df, ["k"], num_partitions=4).count() == 0


def test_reliable_checkpoint_sets_dir_once_and_stays_correct(spark, tmp_path):
    """checkpoint_once must not re-point the global checkpoint dir on
    every call (each setCheckpointDir mints a new UUID subdir) and the
    persist->checkpoint->unpersist sequence must leave no cache behind
    while producing the same dense ids."""
    from gerrydb_etl_spark.operators.checkpointing import ensure_checkpoint_dir
    from gerrydb_etl_spark.operators.ids import assign_dense_ids

    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    ensure_checkpoint_dir(sc, ckpt)
    resolved = sc.getCheckpointDir()
    ensure_checkpoint_dir(sc, ckpt)
    assert sc.getCheckpointDir() == resolved, "dir re-set on identical path"

    df = spark.range(0, 500).select(
        (F.col("id") * 7 % 500).alias("k"), F.col("id").alias("payload")
    )
    out = assign_dense_ids(df, ["k"], checkpoint_dir=ckpt)
    rows = sorted((r.k, r.row_id) for r in out.collect())
    assert [rid for _, rid in rows] == list(range(500))
    assert [k for k, _ in rows] == sorted({i * 7 % 500 for i in range(500)})

"""Continuous ANN index maintenance (r9 verdict item 6): a
checkpointed pump folds base-table commits into the index micro-batch
by micro-batch; after every batch the index equals a from-scratch
rebuild; a graceful stop leaves a consistent snapshot that a new job
resumes from the same checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.operators.annindex import AnnLshIndex
from otrrentetl_spark.operators.merge import KeyedParquetTable
from otrrentetl_spark.streaming.annmaint import AnnIndexMaintenance

SF = "/root/testdata/sf0.01"


def _index_state(idx):
    return sorted(
        (r["id"], r["sig"])
        for r in idx._table().read().select("id", "sig").collect()
    )


def _rebuild_state(spark, base, tmp_path, n):
    rebuilt = AnnLshIndex.build(
        spark,
        base.read(),
        str(tmp_path / f"rebuild{n}"),
        n_planes=12,
        prefix_bits=6,
        id_col="vec_id",
    )
    return _index_state(rebuilt)


def test_maintenance_folds_three_micro_batches_and_restarts(
    spark, tmp_path
):
    emb = load_table(spark, SF, "embeddings")
    base = KeyedParquetTable(
        spark, str(tmp_path / "base"), keys=("grp", "vec_id")
    )
    base.retain_stale_s = 3600.0
    seed = emb.filter(F.col("vec_id").between(1, 300)).select(
        (F.col("vec_id") % 4).alias("grp"), "vec_id", "embedding"
    )
    base.overwrite(seed)
    idx = AnnLshIndex.build(
        spark,
        base.read(),
        str(tmp_path / "lsh"),
        n_planes=12,
        prefix_bits=6,
        id_col="vec_id",
    )
    ckpt = str(tmp_path / "ckpt.json")
    job = AnnIndexMaintenance(base, idx, ckpt)
    assert job.run_available_now() == 0  # pins the build version

    # --- micro-batch 1: bucket-moving updates (negation) ------------
    base.upsert_replace_partitions(
        emb.filter(F.col("vec_id").isin(1, 5, 9)).select(
            F.lit(1).alias("grp"),
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    # --- micro-batch 2 (still queued): deletes + insert -------------
    # committed AFTER batch 1 is drained so the feed sees 3 distinct
    # (from, to) diffs, not one coalesced one
    assert job.run_available_now() == 1
    assert _index_state(idx) == _rebuild_state(spark, base, tmp_path, 1)

    base.delete_by_keys(
        spark.createDataFrame([(2, 2), (3, 3)], "grp long, vec_id long")
    )
    assert job.run_available_now() == 1
    assert _index_state(idx) == _rebuild_state(spark, base, tmp_path, 2)

    base.upsert_replace_partitions(
        emb.filter(F.col("vec_id") == 7).select(
            F.lit(0).alias("grp"),
            (F.col("vec_id") + 2_000_000_000).alias("vec_id"),
            "embedding",
        )
    )
    assert job.run_available_now() == 1
    assert _index_state(idx) == _rebuild_state(spark, base, tmp_path, 3)


def test_graceful_stop_leaves_consistent_snapshot_and_resumes(
    spark, tmp_path
):
    """I5: a stop flag raised mid-stream halts BETWEEN batches — the
    index sits at a committed base version with the checkpoint
    aligned; a NEW job on the same checkpoint folds the remainder."""
    emb = load_table(spark, SF, "embeddings")
    base = KeyedParquetTable(
        spark, str(tmp_path / "base"), keys=("grp", "vec_id")
    )
    base.retain_stale_s = 3600.0
    base.overwrite(
        emb.filter(F.col("vec_id").between(1, 200)).select(
            (F.col("vec_id") % 2).alias("grp"), "vec_id", "embedding"
        )
    )
    idx = AnnLshIndex.build(
        spark,
        base.read(),
        str(tmp_path / "lsh"),
        n_planes=12,
        prefix_bits=6,
        id_col="vec_id",
    )
    ckpt = str(tmp_path / "ckpt.json")
    job = AnnIndexMaintenance(base, idx, ckpt)
    job.run_available_now()  # pin
    v_pinned = base._read_snapshot()["version"]

    # two queued commits
    base.upsert_replace_partitions(
        emb.filter(F.col("vec_id") == 2).select(
            F.lit(0).alias("grp"),
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    mid_state = _rebuild_state(spark, base, tmp_path, "mid")
    # drain commit 1, then the stop flag fires before the next poll
    stops = iter([False, True])
    n = job.run(poll_interval_s=0.0, should_stop=lambda: next(stops))
    assert n == 1
    assert _index_state(idx) == mid_state  # consistent snapshot
    # checkpoint points at the drained version
    assert job.feed._read_checkpoint() == base._read_snapshot()["version"]

    base.delete_by_keys(
        spark.createDataFrame([(1, 1)], "grp long, vec_id long")
    )
    # checkpoint-restart: a FRESH job on the same path resumes, and
    # re-folds nothing already applied
    job2 = AnnIndexMaintenance(base, idx, ckpt)
    assert job2.run_available_now() == 1
    assert _index_state(idx) == _rebuild_state(spark, base, tmp_path, "end")
    assert v_pinned < job2.feed._read_checkpoint()

"""Training-shard export (operators/export.py): deterministic seeded
shuffle, weight-balanced contiguous shards, physical writer. The
assignment math is oracle-checked by `export_training_shards`; these
tests pin the writer face and the balance/determinism contracts."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from otrrentetl_spark.operators import text
from otrrentetl_spark.operators.export import shard_by_weight, write_shards

SF = "/root/testdata/sf0.01"


def _sized(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", text.token_count("text").alias("n_tok"))
    )


def test_shard_by_weight_balance_and_contiguity(spark):
    d = _sized(spark)
    a = shard_by_weight(d, 8, "n_tok", seed=7).select(
        "doc_id", "n_tok", "rank", "shard"
    )
    rows = a.collect()
    total = sum(r["n_tok"] for r in rows)
    max_doc = max(r["n_tok"] for r in rows)
    per = {}
    spans = {}
    for r in rows:
        per[r["shard"]] = per.get(r["shard"], 0) + r["n_tok"]
        lo, hi = spans.get(r["shard"], (r["rank"], r["rank"]))
        spans[r["shard"]] = (min(lo, r["rank"]), max(hi, r["rank"]))
    assert set(per) == set(range(8))
    # contiguous cut: each shard's weight within one doc of the ideal
    ideal = total / 8
    for s, wt in per.items():
        assert abs(wt - ideal) <= max_doc + 1, (s, wt, ideal, max_doc)
    # rank spans are disjoint and ordered by shard id
    ordered = [spans[s] for s in sorted(spans)]
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 <= lo2, (ordered,)


def test_shard_assignment_deterministic_and_seed_sensitive(spark):
    d = _sized(spark)
    one = {
        r["doc_id"]: r["shard"]
        for r in shard_by_weight(d, 8, "n_tok", seed=7).collect()
    }
    two = {
        r["doc_id"]: r["shard"]
        for r in shard_by_weight(d, 8, "n_tok", seed=7).collect()
    }
    other = {
        r["doc_id"]: r["shard"]
        for r in shard_by_weight(d, 8, "n_tok", seed=8).collect()
    }
    assert one == two
    assert one != other  # a new seed is a genuinely different shuffle


def test_write_shards_layout_manifest_and_order(spark, tmp_path):
    d = _sized(spark)
    path = str(tmp_path / "shards")
    manifest = write_shards(d, path, 4, "n_tok", seed=3)
    on_disk = json.loads(open(f"{path}/_SHARD_MANIFEST.json").read())
    assert on_disk == manifest
    assert set(manifest["shards"]) == {"0", "1", "2", "3"}
    back = spark.read.parquet(path)
    assert back.count() == d.count()
    for s in range(4):
        sdir = os.path.join(path, f"shard={s}")
        files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        assert len(files) == 1, (s, files)  # one contiguous slice each
        rows = spark.read.parquet(os.path.join(sdir, files[0])).collect()
        ranks = [r["rank"] for r in rows]
        assert ranks == sorted(ranks), f"shard {s} not in shuffle order"
        m = manifest["shards"][str(s)]
        assert m["n_rows"] == len(rows)
        assert m["weight"] == sum(r["n_tok"] for r in rows)


def test_seeded_rank_sql_matches_spark_for_negative_ids(spark):
    """SQL % keeps the dividend's sign while pmod doesn't — the oracle
    twin must wrap the first reduction or negative ids diverge (and
    even leave [0, 2^31))."""
    import duckdb

    from otrrentetl_spark.operators.export import seeded_rank, seeded_rank_sql

    ids = [-12345, -1, 0, 7, 2**40 + 3, -(2**40) - 9]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["rank"]
        for r in sdf.select("doc_id", seeded_rank("doc_id", 42).alias("rank")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT doc_id, " + seeded_rank_sql("doc_id", 42) + " AS rank "
            "FROM (SELECT UNNEST(" + str(ids) + ") AS doc_id)"
        ).fetchall()
    )
    assert got == want
    assert all(0 <= v < 2**31 for v in got.values())


def test_manifest_seeds_all_shards_under_pathological_weights(spark, tmp_path):
    """One doc carrying most of the corpus weight makes
    floor(start*N/total) skip shard ids (ADVICE r8): the directory may
    be absent, but the manifest must still carry every shard key."""
    rows = [(0, "x" * 10, 1_000_000)] + [
        (i, "y" * 10, 1) for i in range(1, 20)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, n_tok long")
    path = str(tmp_path / "patho")
    manifest = write_shards(d, path, 8, "n_tok", seed=3)
    assert set(manifest["shards"]) == {str(s) for s in range(8)}
    empty = [s for s, m in manifest["shards"].items() if m["n_rows"] == 0]
    assert empty, "expected skipped shards under the pathological weight"
    for s in empty:
        assert manifest["shards"][s] == {
            "n_rows": 0,
            "weight": 0,
            "files": [],
        }
        assert not os.path.exists(os.path.join(path, f"shard={s}"))
    # conservation: every row landed exactly once
    total = sum(m["n_rows"] for m in manifest["shards"].values())
    assert total == len(rows)


def test_max_task_weight_splits_shards_and_keeps_rank_order(spark, tmp_path):
    """With max_task_weight set, an oversized shard splits into
    multiple part files, each a contiguous rank slice, name-ordered by
    rank range; the manifest records the per-shard file lists."""
    d = _sized(spark)
    path = str(tmp_path / "split")
    # 2 shards over the corpus with a cap ~1/4 of a shard's weight
    total = d.agg(F.sum("n_tok")).first()[0]
    cap = max(int(total) // 8, 1)
    manifest = write_shards(
        d, path, 2, "n_tok", seed=3, max_task_weight=cap
    )
    assert manifest["max_task_weight"] == cap
    # the assignment itself is UNCHANGED by the task layout
    want = {
        r["doc_id"]: (r["shard"], r["rank"])
        for r in shard_by_weight(d, 2, "n_tok", seed=3).collect()
    }
    back = spark.read.parquet(path)
    got = {
        r["doc_id"]: (int(r["shard"]), r["rank"]) for r in back.collect()
    }
    assert got == want
    for s in range(2):
        m = manifest["shards"][str(s)]
        assert len(m["files"]) > 1, (s, m["files"])  # genuinely split
        # name order == rank order: files' rank ranges ascend and are
        # disjoint, so reading files in name order restores the shard
        prev_hi = -1
        for rel in m["files"]:
            ranks = [
                r["rank"]
                for r in spark.read.parquet(f"{path}/{rel}").collect()
            ]
            assert ranks == sorted(ranks)
            assert ranks[0] > prev_hi, (rel, ranks[0], prev_hi)
            prev_hi = ranks[-1]


def test_max_task_weight_clamps_task_count(spark, tmp_path):
    """ADVICE r9: a tiny cap on a large corpus must raise with a
    workable minimum, not hand the planner an unbounded range
    shuffle."""
    import pytest

    from otrrentetl_spark.operators.export import _MAX_WRITE_TASKS

    d = _sized(spark)
    total = int(d.agg(F.sum("n_tok")).first()[0])
    # a cap that requests more than _MAX_WRITE_TASKS slices
    bad_cap = max(total // (_MAX_WRITE_TASKS * 2), 1)
    with pytest.raises(ValueError, match="write tasks"):
        write_shards(
            d, str(tmp_path / "clamped"), 2, "n_tok",
            seed=3, max_task_weight=bad_cap,
        )

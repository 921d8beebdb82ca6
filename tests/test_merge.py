"""Merge-writer semantics (SURVEY.md §5.3/§5.4): stored-vs-default
matrix for U2/U3, upsert idempotence, moveto conservation.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from otrrentetl_spark.operators import merge

KEYS = ("PartitionKey", "RowKey")
SCHEMA = "PartitionKey string, RowKey string, val string, n long"
DEFAULTS = {"val": "", "n": 0}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted((r.PartitionKey, r.RowKey, r.val, r.n) for r in df.collect())


def test_upsert_replace_whole_row(spark):
    old = _df(spark, [("p", "1", "keepme", 5), ("p", "2", "old", 1)])
    new = _df(spark, [("p", "2", "new", 0), ("p", "3", "ins", 9)])
    got = _rows(merge.upsert_replace(old, new, KEYS))
    assert got == [("p", "1", "keepme", 5), ("p", "2", "new", 0), ("p", "3", "ins", 9)]


def test_upsert_replace_idempotent(spark):
    """save twice ≡ save once (A3 / property §5.4)."""
    old = _df(spark, [("p", "1", "a", 1)])
    new = _df(spark, [("p", "1", "b", 2), ("p", "2", "c", 3)])
    once = merge.upsert_replace(old, new, KEYS)
    twice = merge.upsert_replace(once, new, KEYS)
    assert _rows(once) == _rows(twice)


def test_upsert_merge_default_columns_do_not_overwrite(spark):
    """The stored-vs-default matrix (azurestoragewrapper.py:227-231):
    incoming default-valued columns leave stored values untouched."""
    old = _df(spark, [("p", "1", "stored", 7)])
    # val='' and n=0 are defaults → must NOT clobber; n=3 must win
    new = _df(spark, [("p", "1", "", 3)])
    got = _rows(merge.upsert_merge(old, new, DEFAULTS, KEYS))
    assert got == [("p", "1", "stored", 3)]


def test_upsert_merge_insert_new_row_keeps_defaults(spark):
    old = _df(spark, [("p", "1", "a", 1)])
    new = _df(spark, [("q", "9", "", 4)])
    got = _rows(merge.upsert_merge(old, new, DEFAULTS, KEYS))
    assert got == [("p", "1", "a", 1), ("q", "9", "", 4)]


def test_delete_keys(spark):
    old = _df(spark, [("p", "1", "a", 1), ("p", "2", "b", 2)])
    dels = _df(spark, [("p", "2", "x", 0)])
    assert _rows(merge.delete_keys(old, dels, KEYS)) == [("p", "1", "a", 1)]


def test_rekey_move_conserves_rowcount(spark):
    """moveto conservation (U6, property §5.4): moving rows across
    partitions never changes the total row count."""
    old = _df(spark, [("2017_01_01", "1", "a", 1), ("2017_01_01", "2", "b", 2)])
    sel = _df(spark, [("2017_01_01", "2", "", 0)])
    moved = merge.rekey(old, sel, {"PartitionKey": "top"}, KEYS, move=True)
    assert moved.count() == old.count()
    assert _rows(moved) == [("2017_01_01", "1", "a", 1), ("top", "2", "b", 2)]


def test_rekey_copy_adds_rows(spark):
    old = _df(spark, [("2017_01_01", "1", "a", 1)])
    sel = _df(spark, [("2017_01_01", "1", "", 0)])
    copied = merge.rekey(old, sel, {"PartitionKey": "top"}, KEYS, move=False)
    assert copied.count() == 2


def test_keyed_parquet_table_partition_gate(spark, tmp_path):
    path = str(tmp_path / "recordings")
    t = merge.KeyedParquetTable(spark, path, KEYS)
    assert t.partition_is_empty("2017_01_01")  # no table yet
    t.upsert_replace_partitions(_df(spark, [("2017_01_01", "1", "a", 1)]))
    assert not t.partition_is_empty("2017_01_01")
    assert t.partition_is_empty("2017_01_02")
    # dynamic partition overwrite touches only the named partition
    t.upsert_replace_partitions(_df(spark, [("2017_01_02", "2", "b", 2)]))
    got = sorted((r.PartitionKey, r.RowKey) for r in t.read().collect())
    assert got == [("2017_01_01", "1"), ("2017_01_02", "2")]


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """SURVEY.md §4: PartitionKey-scoped queries must physically prune —
    the scan of a partitionBy(PartitionKey) layout filtered to one key
    reads ONE partition directory, reproducing the reference store's
    partition affinity (azurestoragewrapper.py:54-75) at plan level."""
    path = str(tmp_path / "parted")
    t = merge.KeyedParquetTable(spark, path, KEYS)
    t.overwrite(
        _df(
            spark,
            [(f"2017_01_0{d}", str(i), "x", i) for d in range(1, 6) for i in range(3)],
        )
    )
    q = t.read().filter(F.col("PartitionKey") == "2017_01_03")
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "PartitionKey" in m.group(1), plan
    # physically one of the five directories survives pruning
    pc = re.search(r"partition filters: [^,]*", plan) or re.search(
        r"PartitionCount: (\d+)", plan
    )
    if pc and pc.re.pattern.startswith("PartitionCount"):
        assert int(pc.group(1)) == 1, plan
    assert q.count() == 3


def test_schema_evolution_add_column(spark, tmp_path):
    """Azure Table entities are schemaless — a later batch may carry a
    NEW property. The keyed table must accept it: old rows read back
    null in the new column, and partitions written before the column
    existed still read correctly (mergeSchema)."""
    from otrrentetl_spark.operators.merge import KeyedParquetTable

    t = KeyedParquetTable(spark, str(tmp_path / "tbl"))
    v1 = spark.createDataFrame(
        [("p1", "1", 10)], "PartitionKey string, RowKey string, a long"
    )
    t.upsert_replace_partitions(v1)
    v2 = spark.createDataFrame(
        [("p2", "2", 20, "fresh")],
        "PartitionKey string, RowKey string, a long, b string",
    )
    t.upsert_replace_partitions(v2)
    got = {r["RowKey"]: r for r in t.read().collect()}
    assert set(got) == {"1", "2"}
    assert got["1"]["a"] == 10 and got["1"]["b"] is None
    assert got["2"]["a"] == 20 and got["2"]["b"] == "fresh"
    # and a batch OMITTING a known column still merges (nulls in)
    v3 = spark.createDataFrame(
        [("p1", "3", 30)], "PartitionKey string, RowKey string, a long"
    )
    t.upsert_replace_partitions(v3)
    got = {r["RowKey"]: r for r in t.read().collect()}
    assert got["3"]["b"] is None and got["2"]["b"] == "fresh"

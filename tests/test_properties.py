"""Property-based tests (hypothesis) for the merge lifecycle and key
normalization — SURVEY.md §5.4:

- upsert idempotence: save twice ≡ save once (A3/U3/U4)
- rekey conservation: moveto preserves row count up to target-key
  collisions, copyto adds the copies (U6)
- join-key normalization invariance under whitespace/case noise (J2/Str3)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

key = st.tuples(
    st.sampled_from(["p1", "p2", "top"]),
    st.integers(min_value=0, max_value=5).map(str),
)
vals = st.integers(min_value=-100, max_value=100)
rows_strategy = st.lists(st.tuples(key, vals), max_size=8)


def _kv_df(spark, rows):
    return spark.createDataFrame(
        [(pk, rk, v) for (pk, rk), v in rows] or [("z", "z", 0)],
        "PartitionKey STRING, RowKey STRING, v BIGINT",
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@SETTINGS
@given(old=rows_strategy, new=rows_strategy)
def test_upsert_replace_idempotent(spark, old, new):
    from otrrentetl_spark.operators.merge import upsert_replace

    old_df = _kv_df(spark, old).dropDuplicates(["PartitionKey", "RowKey"])
    new_df = _kv_df(spark, new)
    once = upsert_replace(old_df, new_df)
    twice = upsert_replace(once, new_df)
    assert _canon(once) == _canon(twice)
    # the result is key-unique whenever the old side was
    assert once.count() == once.select("PartitionKey", "RowKey").distinct().count()


@SETTINGS
@given(rows=rows_strategy)
def test_rekey_conservation(spark, rows):
    from otrrentetl_spark.operators.merge import rekey

    table = _kv_df(spark, rows).dropDuplicates(["PartitionKey", "RowKey"])
    selected = table.filter(F.col("PartitionKey") == "p1")
    n_selected = selected.count()
    n_collide = (
        table.filter(F.col("PartitionKey") == "top")
        .join(selected.select("RowKey"), "RowKey", "left_semi")
        .count()
    )
    moved = rekey(table, selected, {"PartitionKey": "top"}, move=True)
    copied = rekey(table, selected, {"PartitionKey": "top"}, move=False)
    assert moved.count() == table.count() - n_collide
    assert copied.count() == table.count() + n_selected - n_collide
    # no source rows remain under the old key after a move
    assert moved.filter(F.col("PartitionKey") == "p1").count() == 0


@SETTINGS
@given(s=st.text(alphabet=st.sampled_from("aA bB\tcC"), max_size=20))
def test_normalize_key_invariance(spark, s):
    """normalize_key is invariant under extra spaces and case flips —
    the property the J2 join depends on."""
    from otrrentetl_spark.functions.strings import normalize_key

    noisy = " ".join(s.upper())  # case-flip + a space between every char
    df = spark.createDataFrame([(s, noisy)], "a STRING, b STRING")
    row = df.select(
        normalize_key("a").alias("ka"), normalize_key("b").alias("kb")
    ).first()
    assert row["ka"] == row["kb"]

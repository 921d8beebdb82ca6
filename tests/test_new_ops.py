"""Locks on the late-round operators' load-bearing claims:

- PageRank's fixed-point arithmetic makes the result independent of
  physical layout (the associativity claim, tested by re-running on a
  deliberately different partitioning).
- The interval-overlap bucket rewrite is result-identical to the
  naive theta join.
- The new broadcast paths stay broadcasts (plan shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pagerank_layout_independent(spark):
    from otrrentetl_spark.registry import QUERIES

    a = _rows(QUERIES["graph_pagerank"](spark, SF_SMOKE))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _rows(QUERIES["graph_pagerank"](spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_interval_overlap_matches_naive(spark):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.operators.rangejoin import interval_overlap_join

    orders = load_table(spark, SF_SMOKE, "orders")
    wa = orders.filter(F.col("o_orderkey") % 23 == 0).select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderdate").alias("a_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 6 days")).alias("a_end"),
    )
    wb = orders.filter(F.col("o_orderkey") % 19 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 9 days")).alias("b_end"),
    )
    fast = _rows(
        interval_overlap_join(wa, wb, "a_start", "a_end", "b_start", "b_end")
        .select("a_id", "b_id")
    )
    naive = _rows(
        wa.crossJoin(wb)
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select("a_id", "b_id")
    )
    assert fast == naive and len(fast) > 0


def test_bloom_and_tfidf_broadcast_plans(spark):
    from otrrentetl_spark.registry import QUERIES

    df = QUERIES["decontaminate_bloom_probe"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # r13 shape pin: the probe is k narrow per-position broadcast hash
    # joins over the gram frame — NOT the old explode-k-rows-per-gram +
    # re-aggregate-by-(doc_id, g) plan. Exactly ONE Generate (the gram
    # explode; a second would be the position explode coming back) and
    # one BHJ per hash function.
    from otrrentetl_spark.plans.curation_ops import _BF_K

    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Generate") == 1, plan
    assert final_plan.count("BroadcastHashJoin") == _BF_K, plan

    # tfidf (r5 rewrite) attaches document frequency by BROADCAST —
    # the regressions this pins are a term-keyed shuffle/sort of the
    # pair frame (the r4 window plan's stopword-skew exposure) or the
    # broadcast degrading to a shuffled join
    df = QUERIES["tfidf_top_terms"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # (the vocabulary-sized dfreq aggregate still exchanges on term —
    # that's map-side-combined and tiny; what must never return is a
    # term-keyed JOIN of the pair frame)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "Window" in plan, plan  # the per-doc rank window remains


def test_interval_overlap_bucket_width_invariant(spark):
    """The bucket width is a pure performance knob: any width must
    produce the identical overlap set (candidates differ; the exact
    verify + dedup make the result width-independent)."""
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.operators.rangejoin import interval_overlap_join

    orders = load_table(spark, SF_SMOKE, "orders")
    wa = orders.filter(F.col("o_orderkey") % 23 == 0).select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderdate").alias("a_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 6 days")).alias("a_end"),
    )
    wb = orders.filter(F.col("o_orderkey") % 19 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 9 days")).alias("b_end"),
    )
    results = [
        _rows(
            interval_overlap_join(
                wa, wb, "a_start", "a_end", "b_start", "b_end",
                bucket_seconds=w,
            ).select("a_id", "b_id")
        )
        for w in (86_400, 86_400 * 3, 86_400 * 30)
    ]
    assert results[0] == results[1] == results[2] and len(results[0]) > 0


def test_exact_dedup_full_row_and_ids_paths_agree(spark):
    """The full-row survivor join and the ids_only aggregate must pick
    the same survivors — including when input ids are NOT unique (two
    contents sharing an id must not resurrect extra rows)."""
    from otrrentetl_spark.operators.dedup import exact_dedup

    rows = [
        (1, "alpha beta"),
        (2, "alpha beta"),       # dup of 1 -> loses
        (3, "gamma"),
        (3, "delta delta"),      # id collision, distinct content
        (4, "gamma"),            # dup of 3 -> loses
        (5, None),               # null content: its own dedup group
        (6, None),               # dup of 5 -> loses
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = exact_dedup(df, "text", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in
                 exact_dedup(df, "text", "doc_id", ids_only=True).collect())
    assert sorted(((r["doc_id"], r["text"]) for r in full),
                  key=lambda t: (t[0], t[1] or "")) == [
        (1, "alpha beta"), (3, "delta delta"), (3, "gamma"), (5, None)
    ]
    assert ids == [1, 3, 3, 5]

"""Partition-invariance contract: a distributed engine's results must
not depend on HOW the data was partitioned or which join strategy the
optimizer picked — that is the property that makes sf0.001 correctness
extrapolate to a 1000-executor cluster where partitioning is different
by construction.

Each representative query runs twice in the same session: once with
the default layout, once with a hostile runtime config (prime shuffle
partition count, broadcasts disabled so every join degrades to
shuffle). The collected row multisets must be identical — which holds
only because the engine routes float aggregates through DECIMAL,
uses fixed-point integer arithmetic for iterative algorithms, and
keys every nondeterministic tie on a unique column.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# one per operator family with order-of-accumulation risk
INVARIANCE_SET = [
    "flagship",              # joins + decimal-routed SUM + top-k
    "agg_pricing_summary",   # wide aggregation
    "stats_moments_suite",   # one-pass moments (fixed-point)
    "graph_pagerank",        # iterative fixed-point
    "dedup_minhash_lsh_pairs",  # Arrow kernel + bucketed self-pairs
    "llm_data_pipeline_v2",  # five-stage composition
    "stream_tumbling_window",  # event-time windows (batch face)
    "text_unigram_surprisal",  # fixed-point decimal mean (r4 rewrite)
    "tfidf_top_terms",       # window-df + literal corpus count (r4)
]

_HOSTILE = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _rows(df):
    # stringify → sort: an order-insensitive multiset fingerprint
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", INVARIANCE_SET)
def test_result_invariant_under_hostile_partitioning(spark, name):
    from otrrentetl_spark.registry import QUERIES

    saved = {}
    for k in _HOSTILE:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        baseline = _rows(QUERIES[name](spark, SF_SMOKE))
        for k, v in _HOSTILE.items():
            spark.conf.set(k, v)
        hostile = _rows(QUERIES[name](spark, SF_SMOKE))
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    assert baseline == hostile, (
        f"{name}: result depends on partitioning/join strategy "
        f"({len(baseline)} vs {len(hostile)} rows)"
    )

"""Custom stateful streaming operator: per-user running stats via
``applyInPandasWithState`` — the escape hatch for operators Spark's
built-in windowed aggregations can't express (arbitrary per-key state
machines), per the custom-operator policy (built-ins → Pandas-UDF
state → mapPartitions, SURVEY.md §2.11).

State is one (count, sum, last_seen) triple per user: O(1) per key,
Arrow-batched per micro-batch, carried by Spark's state store across
batches (checkpointed — replays resume, they do not double-count).

The running sum accumulates in integer CENTS (fixed-point), the same
determinism trick as graph_pagerank's fixed-point power iteration:
integer addition is associative, so the final state is bit-identical
no matter how the stream is micro-batched or partitioned — which is
what lets the batch-face oracle (plain GROUP BY in DuckDB) hash-match
the streaming result exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_seen timestamp"
)
STATE_SCHEMA = "n long, s_cents long, last_seen timestamp"


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s_cents, last = state.get
    else:
        n, s_cents, last = 0, 0, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        # fixed-point: value is money-like (2-decimal); integer cents
        # make the running sum order- and batching-independent.
        # Half-AWAY-FROM-ZERO to match SQL ROUND(value*100, 0) in the
        # DuckDB oracle (ADVICE r4): pandas .round() is banker's
        # half-to-even, which diverges for 3+-decimal inputs whose
        # cents land exactly on .5 (e.g. 0.005).
        v100 = pdf["value"].astype("float64") * 100
        cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype("int64")
        s_cents += int(cents.sum())
        mx = pdf["ts"].max()
        last = mx if last is None or mx > last else last
    state.update((n, s_cents, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s_cents / 100.0],
            "last_seen": [last],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value, ...) → one updated running
    (count, sum, last_seen) row per user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

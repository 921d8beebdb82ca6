"""Custom stateful streaming operator on Spark 4's NEW
`transformWithStateInPandas` API (StatefulProcessor + typed state
handles) — the successor to `applyInPandasWithState` (stateful.py
keeps the legacy shape). Differences that matter at scale: typed
per-key state primitives (ValueState/ListState/MapState) instead of
one opaque tuple, explicit init/close lifecycle, and timer support —
Spark manages each primitive in the state store individually.

Semantics here mirror stateful.running_user_stats (per-user running
count/sum in integer cents) so the v1/v2 APIs are directly
comparable in tests.

Environment gate: the v2 state protocol requires `google.protobuf`
(JVM↔Python state server messages); in environments without it the
query fails at driver-worker init — tests/test_stateful_v2.py skips
accordingly and the legacy operator (stateful.py) stays the covered
path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class RunningUserCents(StatefulProcessor):
    """ValueState[(n, cents)] per user; emits the updated running
    totals once per key per micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n long, cents long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = (0, 0)
        if self._state.exists():
            n, cents = self._state.get()
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_user_cents(events: DataFrame) -> DataFrame:
    """events stream with a precomputed integer `cents` column →
    running (count, cents-sum) per user via transformWithStateInPandas."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningUserCents(),
        outputStructType="user_id long, n_events long, sum_cents long",
        outputMode="Update",
        timeMode="None",
    )

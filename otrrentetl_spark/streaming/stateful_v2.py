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


class BatchValueState:
    """In-memory ValueState with the v2 state-handle surface — lets the
    SAME StatefulProcessor run under plain Arrow execution (applyInPandas)
    where the protobuf state transport isn't available. State lives for
    one grouped batch, which is exactly the batch-face contract."""

    def __init__(self) -> None:
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


class BatchStateHandle:
    """Duck-typed StatefulProcessorHandle for batch-face execution."""

    def __init__(self) -> None:
        self._states: dict[str, BatchValueState] = {}

    def getValueState(self, name: str, schema) -> BatchValueState:
        return self._states.setdefault(name, BatchValueState())


def running_user_cents_batch(events: DataFrame) -> DataFrame:
    """Batch face of the v2 operator: drives ``RunningUserCents``
    through its full StatefulProcessor lifecycle (init →
    handleInputRows × micro-batches → close) inside ``applyInPandas``,
    so the processor's LOGIC is exercised — and oracle-checkable —
    in environments where the protobuf state transport is absent.
    Each key's rows are split into two chunks to exercise cross-batch
    state carry-over, mirroring what the streaming runtime does."""

    def drive(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        proc = RunningUserCents()
        proc.init(BatchStateHandle())
        mid = len(pdf) // 2
        out = None
        for chunk in (pdf.iloc[:mid], pdf.iloc[mid:]):
            for res in proc.handleInputRows((key[0],), iter([chunk]), None):
                out = res
        proc.close()
        return out

    return events.groupBy("user_id").applyInPandas(
        drive, "user_id long, n_events long, sum_cents long"
    )

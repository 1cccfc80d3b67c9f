"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running profile: event count, spend, distinct event types --
state that survives across micro-batches and is emitted (updated) every
batch the user appears in.  This is the extension point the reference
lacks entirely: arbitrary per-key state with timeout semantics, the
Spark-native replacement for hand-rolled state in an external store.

Arrow-batched: each group's rows arrive as pandas DataFrames; state is
a simple tuple.  At scale, state lives in the checkpointed state store,
partitioned by the grouping key."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_spent double, distinct_event_types int"
)
STATE_SCHEMA = "total_events long, total_spent double, seen_types string"


def _update_user_profile(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    total_events, total_spent, seen = (
        state.get if state.exists else (0, 0.0, "")
    )
    seen_set = set(seen.split("|")) - {""}
    for pdf in pdfs:
        total_events += len(pdf)
        total_spent += float(pdf["total_amount"].fillna(0.0).sum())
        seen_set |= set(pdf["event_type"].dropna())
    state.update((int(total_events), float(total_spent), "|".join(sorted(seen_set))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [int(total_events)],
            "total_spent": [float(total_spent)],
            "distinct_event_types": [len(seen_set)],
        }
    )


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """Stateful per-user running profile (update mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

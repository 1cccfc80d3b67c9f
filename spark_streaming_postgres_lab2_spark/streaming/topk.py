"""Sink-side global top-k over trending_stream emissions.

Cross-key ranking cannot live inside a per-key stateful operator
(``applyInPandasWithState`` sees one key at a time), so the global
top-k belongs in the sink -- the same place the reference keeps its
cross-row concerns (the analytics views it serves from Postgres,
``reference/docker/postgres/postgres_setup.sql:101-151`` view
definitions).  ``TrendingTopKSink`` is
a ``foreachBatch``-compatible callable that folds each micro-batch's
*update-mode* emissions into a running score table and answers global
``topk(k)`` queries between (or after) batches.

Scale shape (100 TB): the input is NOT the event stream -- it is the
stateful operator's per-key aggregate output, one row per key that
CHANGED this micro-batch, so each batch collect is bounded by the
active-key vocabulary (event types: single digits; at worst the
trending key cardinality).  State here is one float per ever-active
key, further bounded two ways: the upstream operator evicts idle keys
with a zero-score tombstone (which this sink interprets as a delete),
and ``max_keys`` hard-caps the table by deterministically dropping the
lowest-(score, key) entries.

``max_keys`` trades exactness for the bound: the upstream operator
runs in update mode and only re-emits keys whose score CHANGED, so a
``max_keys``-evicted key whose score never changes again stays
invisible to this sink permanently.  Results are exact whenever the
live vocabulary fits in ``max_keys``; beyond that the sink keeps a
Misra-Gries-style **evicted-floor watermark** (``evicted_floor`` = the
highest score ever dropped), which makes the error quantifiable: every
absent key's true score is <= ``evicted_floor``, so any ``topk()``
entry scoring strictly above the floor holds its rank against ALL keys
ever seen -- ``exact_above()`` reports the guarantee per call.
"""

from __future__ import annotations

import heapq
from typing import Optional

from pyspark.sql import DataFrame


class TrendingTopKSink:
    """foreachBatch sink: maintain running trending scores, serve
    global top-k.

    Usage::

        sink = TrendingTopKSink(k=5)
        (trending_stream(enriched)
            .writeStream.foreachBatch(sink)
            .outputMode("update").trigger(availableNow=True).start())
        ...
        sink.topk()          # [(event_type, score), ...] best-first

    Ties break on the key ascending, so the ranking is deterministic
    on any engine and replayable by the ``trending_topk`` batch twin's
    DuckDB oracle.
    """

    def __init__(self, k: int = 5, max_keys: Optional[int] = 10_000):
        self.k = k
        self.max_keys = max_keys
        self.scores: dict[str, float] = {}
        self.batches_seen = 0
        # highest score ever dropped by the max_keys cap: every key
        # absent from `scores` has true score <= this (a dropped key
        # only returns if upstream re-emits it, i.e. its score changed)
        self.evicted_floor: float = 0.0

    # foreachBatch contract: (DataFrame, epoch_id) -> None
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        # one row per CHANGED key (update mode): vocabulary-bounded
        for r in batch_df.select("event_type", "score").collect():
            if r.score == 0.0:
                # upstream idle-eviction tombstone
                self.scores.pop(r.event_type, None)
            else:
                self.scores[r.event_type] = r.score
        if self.max_keys is not None and len(self.scores) > self.max_keys:
            keep = heapq.nlargest(
                self.max_keys,
                self.scores.items(),
                key=lambda kv: (kv[1], _neg_key(kv[0])),
            )
            kept = dict(keep)
            self.evicted_floor = max(
                self.evicted_floor,
                max(v for n, v in self.scores.items() if n not in kept),
            )
            self.scores = kept
        self.batches_seen += 1

    def topk(self, k: Optional[int] = None) -> list[tuple[str, float]]:
        kk = self.k if k is None else k
        return heapq.nsmallest(
            kk, self.scores.items(), key=lambda kv: (-kv[1], kv[0])
        )

    def exact_above(self) -> float:
        """The exactness watermark for the current state: every
        ``topk()`` entry with score strictly above this value is
        guaranteed to hold its rank against every key the stream has
        ever emitted (0.0 when no eviction has occurred, i.e. results
        are fully exact)."""
        return self.evicted_floor


class _neg_key(str):
    """Inverts string comparison so nlargest's (score, key) tuple
    breaks score ties on the SMALLEST key -- matching topk()'s
    (-score, key) ascending order exactly."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)

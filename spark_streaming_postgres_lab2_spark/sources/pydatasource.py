"""Custom Python DataSource (Spark 4 DataSource API): a seeded
synthetic e-commerce event source usable batch OR streaming.

Batch:      spark.read.format("events_gen").option("rows", 1000).load()
Streaming:  spark.readStream.format("events_gen")
                 .option("rows_per_batch", 100).load()

Rows are generated executor-side per partition (the driver ships only
the partition descriptors), deterministic under (seed, partition) --
the DataSource-API-native packaging of sources/datagen.py, showing how
a custom source plugs into Catalyst without any JVM code."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENTS_GEN_SCHEMA = (
    "event_id string, user_id int, session_id string, event_type string, "
    "product_id int, category string, price double, quantity int, "
    "user_segment string, search_query string, event_time string, "
    "source_system string"
)


def _rows_for(seed: int, n: int) -> list[tuple]:
    from .datagen import CSV_COLUMNS, EventGenerator

    gen = EventGenerator(seed=seed)
    return [tuple(ev.get(c) for c in CSV_COLUMNS) for ev in gen.generate_batch(n)]


@dataclass
class _GenPartition(InputPartition):
    seed: int
    rows: int


class EventsGenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.total_rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = self.total_rows // self.num_partitions
        sizes = [per] * self.num_partitions
        sizes[-1] += self.total_rows - per * self.num_partitions
        return [
            _GenPartition(seed=self.seed + i, rows=sizes[i])
            for i in range(self.num_partitions)
        ]

    def read(self, partition: _GenPartition):
        yield from _rows_for(partition.seed, partition.rows)


class EventsGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"batch": 0}

    def read(self, start):
        batch = start["batch"]
        rows = _rows_for(self.seed + 1000 * batch, self.rows_per_batch)
        return iter(rows), {"batch": batch + 1}

    def readBetweenOffsets(self, start, end):
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(_rows_for(self.seed + 1000 * b, self.rows_per_batch))
        return iter(rows)


class EventsGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_gen"

    def schema(self) -> str:
        return EVENTS_GEN_SCHEMA

    def reader(self, schema):
        return EventsGenBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return EventsGenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventsGenDataSource)

"""Synthetic document source — a Spark 4 Python DataSource.

The reference's data plane is seeded by Python producer scripts that
push deterministic synthetic records into Kafka (scripts/lab1_datagen.py,
scripts/lab3_datagen.py in /root/reference). This module re-expresses
that ingest tier as a first-class **Python DataSource**
(`pyspark.sql.datasource`, Spark 4): the generator runs INSIDE the
executors — partitioned, resumable, schema-typed — instead of as a
driver-side script writing files. Register once, then

    spark.read.format("syntheticdocs").option("rows", 1000).load()
    spark.readStream.format("syntheticdocs").option("rowsPerBatch", 100)

both work, and both produce the SAME deterministic rows (seeded per
doc_id, so any row is reproducible in isolation — the property that
matters when a 100 TB backfill and its streaming tail must agree).

Scale shape: `partitions` controls read parallelism; each partition
generates a disjoint doc_id range independently (no coordination, no
shuffle). The stream reader is a `SimpleDataSourceStreamReader` whose
offset is just the next doc_id — restart-safe via the checkpoint, and
micro-batches are exactly the batch rows chunked.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING"

_LANGS = ("en", "en", "en", "es", "de")
_SOURCES = ("web", "wiki", "books", "code")
_WORDS = (
    "data stream table window join the of and to in model vector "
    "agent query spark engine shuffle partition token corpus"
).split()


def make_doc(doc_id: int) -> tuple[int, str, str, str]:
    """The one deterministic row generator both readers share: every
    field derives from md5(doc_id), so any row is reproducible without
    generating its predecessors."""
    h = hashlib.md5(f"synthdoc-{doc_id}".encode()).digest()
    n_words = 5 + h[0] % 40
    words = [
        _WORDS[(h[1 + (i % 14)] + i) % len(_WORDS)] for i in range(n_words)
    ]
    return (
        doc_id,
        " ".join(words),
        _LANGS[h[2] % len(_LANGS)],
        _SOURCES[h[3] % len(_SOURCES)],
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        if self.rows <= 0:
            # an empty partition list is replaced by [None] upstream and
            # read(None) would crash — one empty range yields 0 rows
            return [_RangePartition(0, 0)]
        step = max(1, -(-self.rows // self.parts))
        return [
            _RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield make_doc(i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next doc_id to emit; micro-batch = rowsPerBatch docs."""

    def __init__(self, options):
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        # never move the offset backward: a restart with a lower maxRows
        # than the checkpointed offset must emit nothing, not regress and
        # re-emit already-sunk rows later
        hi = max(lo, min(lo + self.per_batch, self.max_rows))
        # the prefetch cache both calls next() on this (must be an
        # iterator) and pickles it (generators can't pickle) — a list
        # iterator satisfies both
        return iter([make_doc(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([make_doc(i) for i in range(start["next"], end["next"])])


class SyntheticDocsDataSource(DataSource):
    """`format("syntheticdocs")` — deterministic documents, batch + stream."""

    @classmethod
    def name(cls):
        return "syntheticdocs"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the syntheticdocs format."""
    spark.dataSource.register(SyntheticDocsDataSource)

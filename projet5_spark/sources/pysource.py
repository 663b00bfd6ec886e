"""Custom connector through the Python DataSource API (Spark 4):
a deterministic, partitioned synthetic-row source.

The API is the pure-Python connector surface (``pyspark.sql.datasource``)
— the modern replacement for writing a JVM DataSourceV2 when the upstream system
speaks Python: the driver plans ``partitions()``, each
``InputPartition`` is pickled to an executor, and ``read(partition)``
yields that slice's rows as tuples. Reads are partition-parallel and
restart-safe as long as ``read`` is a pure function of the partition —
which this source makes literal: every emitted row is a closed-form
function of its row id (key, sha-256 digest prefix, and a 0-99 bucket),
so any engine can replay the exact stream.

Registered with ``spark.dataSource.register`` and consumed as
``spark.read.format("detrows").option("n", ...).option(
"numPartitions", ...)`` — see ``plans/spark4.py::pysource_digest_rows``
for the oracle-gated query over it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: format name used with spark.read.format(...)
FORMAT_NAME = "detrows"

_SCHEMA = "id BIGINT, dig STRING, bucket BIGINT"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class DetRowsReader(DataSourceReader):
    """Partition-parallel reader: [0, n) split into ``numPartitions``
    contiguous ranges; each partition's rows derive purely from row id."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            dig = hashlib.sha256(str(i).encode()).hexdigest()[:8]
            yield i, dig, int(dig, 16) % 100


class DetRowsDataSource(DataSource):
    """``detrows``: n deterministic (id, digest-prefix, bucket) rows."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DetRowsReader:  # noqa: ANN001 — API signature
        return DetRowsReader(self.options)


def register(spark) -> None:  # noqa: ANN001 — SparkSession
    """Idempotently register the ``detrows`` format on this session."""
    spark.dataSource.register(DetRowsDataSource)

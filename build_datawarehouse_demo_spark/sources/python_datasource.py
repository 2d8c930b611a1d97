"""Custom Python Data Source (Spark 4 DataSource API).

The pluggable-source surface: anything Python can reach (an internal
REST API, a bespoke binary format, a queue) becomes a first-class
`spark.read.format(...)` with partition-parallel reads — each
InputPartition is read by a separate task, so a 1000-partition source
fans out across the cluster exactly like a parquet scan. This module
ships a deterministic synthetic-documents source so the mechanism is
oracle-checkable: every row is a pure function of its id.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs")` after registration.

    Options:
      rows        total row count (default 1000)
      partitions  read parallelism (default 8)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "id bigint, bucket int, payload string"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(
            rows=int(self.options.get("rows", 1000)),
            partitions=int(self.options.get("partitions", 8)),
        )


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, rows: int, partitions: int) -> None:
        if rows < 0 or partitions <= 0:
            raise ValueError(f"need rows >= 0 and partitions > 0, got {rows}/{partitions}")
        self._rows = rows
        self._partitions = partitions

    def partitions(self):  # noqa: D401 - API contract
        return [InputPartition(i) for i in range(self._partitions)]

    def read(self, partition):
        # contiguous id ranges per partition; the last one takes the
        # remainder. Rows are pure functions of id (md5 payload), so
        # any engine reproduces the exact output.
        import hashlib

        per = self._rows // self._partitions
        extra = self._rows % self._partitions
        i = partition.value
        start = i * per + min(i, extra)
        end = start + per + (1 if i < extra else 0)
        for rid in range(start, end):
            yield rid, rid % 10, hashlib.md5(str(rid).encode()).hexdigest()

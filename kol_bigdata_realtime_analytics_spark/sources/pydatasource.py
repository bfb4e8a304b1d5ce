"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The modern extension point for sources Spark has no built-in connector
for — internal services, proprietary formats, synthetic generators. The
contract: a `DataSource` declares schema + options, its `DataSourceReader`
declares PARTITIONS (the parallelism unit — each partition reads
independently on an executor; no driver bottleneck), and `read(partition)`
yields that partition's rows (Arrow-batched by the runtime).

`DetRangeDataSource` here is a deterministic generator: row ids are
GLOBALLY determined by (partition, offset), and every value is a pure
function of the id — so the SAME dataset materializes at any parallelism,
which is what makes the source oracle-checkable end-to-end (the DuckDB
oracle recomputes the identical rows from `range()`).

Registration is per-session: `register_detrange(spark)`; then
    spark.read.format("detrange").option("n", "100000")
         .option("partitions", "8").load()
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DetRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.n_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        step = (self.n + self.n_partitions - 1) // self.n_partitions
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        # deterministic row content: pure function of the global id
        for i in range(partition.start, partition.end):
            yield (i, (i % 997) / 100.0, f"k{i % 13}")


class DetRangeDataSource(DataSource):
    """format("detrange"): id bigint, v double, k string."""

    @classmethod
    def name(cls) -> str:
        return "detrange"

    def schema(self) -> str:
        return "id bigint, v double, k string"

    def reader(self, schema):
        return DetRangeReader(self.options)


def register_detrange(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(DetRangeDataSource)

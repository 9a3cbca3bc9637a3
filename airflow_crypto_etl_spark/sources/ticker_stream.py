"""Custom Python STREAMING DataSource — a deterministic market ticker.

Twin of sources/rest.py's batch DataSource (SURVEY §2.1 S1): the
reference polls a market API once per daily run; the streaming-native
form of that contract is a source that emits each poll as an offset
range. This implements Spark 4's ``SimpleDataSourceStreamReader``:

- offsets are poll sequence numbers ({"poll": N}) — the engine
  checkpoints them, so restarts resume exactly where they stopped (the
  Airflow-catchup story, but per-record);
- each poll deterministically synthesizes one quote per symbol
  (integer-hash pseudo-prices — no network, reproducible tests; a real
  deployment swaps ``_quotes`` for the HTTP GET in sources.rest);
- commit(end) is where a real source would ack/forget upstream state.

Scale: simple-reader mode is driver-side (right for low-rate API
polls); a high-rate source implements the partitioned streamReader
instead — same offset contract, executor-side reads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

TICKER_SCHEMA = T.StructType(
    [
        T.StructField("poll", T.LongType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)

SYMBOLS = ["btc", "eth", "sol", "ada", "dot"]
POLLS_PER_BATCH = 3  # bounded work per micro-batch


def _quotes(poll: int) -> list[tuple]:
    """Deterministic fake quotes for one poll (integer arithmetic)."""
    return [
        (poll, sym, float((hash_price := ((poll * 31 + i * 17) % 1000)) + hash_price / 100.0))
        for i, sym in enumerate(SYMBOLS)
    ]


try:  # Spark 4 streaming Python DataSource API
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _TickerStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict):
            self.max_polls = int(options.get("maxpolls", 10))

        def initialOffset(self) -> dict:
            return {"poll": 0}

        def read(self, start: dict):
            first = int(start["poll"])
            last = min(first + POLLS_PER_BATCH, self.max_polls)
            rows = [row for p in range(first, last) for row in _quotes(p)]
            return iter(rows), {"poll": last}

        def readBetweenOffsets(self, start: dict, end: dict):
            # deterministic replay for recovery — same rows, same order
            rows = [row for p in range(int(start["poll"]), int(end["poll"])) for row in _quotes(p)]
            return iter(rows)

        def commit(self, end: dict) -> None:
            pass  # a real source acks upstream here

    class TickerDataSource(DataSource):
        """spark.readStream.format("ticker").option("maxPolls", N)"""

        @classmethod
        def name(cls) -> str:
            return "ticker"

        def schema(self) -> T.StructType:
            return TICKER_SCHEMA

        def simpleStreamReader(self, schema: T.StructType) -> SimpleDataSourceStreamReader:
            return _TickerStreamReader(self.options)

except ImportError:  # pragma: no cover - PySpark < 4
    TickerDataSource = None  # type: ignore[assignment]


def register_ticker_source(spark: SparkSession) -> bool:
    """Register the streaming source (False on old PySpark)."""
    if TickerDataSource is None:
        return False
    spark.dataSource.register(TickerDataSource)
    return True

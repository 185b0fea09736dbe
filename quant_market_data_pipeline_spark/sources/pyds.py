"""Spark-4 Python DataSource: a deterministic synthetic market-bars feed.

The reference ingests bars from a REST vendor (etl/extract.py — Alpaca
REST + landing files); ``sources/ingest.py`` carries that seam.  This
module adds the Spark-4-NATIVE form of the same seam: a custom
``pyspark.sql.datasource.DataSource`` (``format("synthbars")``) with

- a BATCH reader that partitions the tick-id keyspace into contiguous
  ranges (one ``InputPartition`` per slice — the same range-parallelism
  contract the JDBC reader uses), and
- a STREAMING reader (``SimpleDataSourceStreamReader``) whose offset is
  the next unread tick id — exactly-once replay is a pure function of
  the (start, end) offsets because generation is deterministic.

Determinism is the point: every field derives from the tick id through
the seeded-md5 family (``llm/hashing.py`` conventions), so any slice can
be re-generated bit-identically on any executor — the property that
makes the source value-gateable by a DuckDB oracle (``pyds_synth_bars``
in queries/curation.py re-derives the same rows from ``generate_series``
+ md5 arithmetic) and makes streaming recovery trivial (an uncommitted
range replays identically).

At 100 TB the same shape holds: planInputPartitions slices the keyspace
by a target rows-per-task, each task generates (or fetches) its range
independently, no shuffle, no driver bottleneck.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

_SYMBOLS = ("click", "error", "purchase", "signup", "view")
_BASE_EPOCH_S = 1_704_067_200  # 2024-01-01T00:00:00Z
_BAR_SECONDS = 60


def _md5_unit(seed: str, i: int) -> float:
    """Uniform [0, 1) from the first 15 hex chars of md5('{seed}|{i}') —
    the same construction as hashing.seeded_md5_long, so the DuckDB twin
    is ('0x' || substr(md5(...), 1, 15))::BIGINT / 2^60."""
    h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def synth_bar(i: int) -> tuple[int, str, int, float, int]:
    """The closed-form bar for tick id ``i`` (shared by reader + tests).

    Returns (bar_id, symbol, ts_epoch_s, close, volume)."""
    symbol = _SYMBOLS[i % len(_SYMBOLS)]
    ts = _BASE_EPOCH_S + (i // len(_SYMBOLS)) * _BAR_SECONDS
    # close stays UNROUNDED: Python round() is banker's, engine round()
    # is half-away — consumers round at the query edge where Spark and
    # DuckDB agree.  The double is bit-identical to the oracle's
    # 100 + 50 * (bigint / 2^60) because the op order is identical.
    close = 100.0 + 50.0 * _md5_unit("px", i)
    volume = 1 + int(_md5_unit("vol", i) * 1000.0)
    return (i, symbol, ts, close, volume)


_SCHEMA_DDL = (
    "bar_id BIGINT, symbol STRING, ts_epoch_s BIGINT, "
    "close DOUBLE, volume BIGINT"
)


@dataclass
class _RangePartition:
    start: int
    end: int


def _register_lazy():
    """Import-time light: pyspark.sql.datasource only loads when the
    source is registered (keeps module import cheap for tooling)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _SynthBarsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("rows", "1000"))
            self.rows_per_part = int(options.get("rowsperpartition", "250"))

        def partitions(self):
            return [
                InputPartition((start, min(start + self.rows_per_part, self.n_rows)))
                for start in range(0, self.n_rows, self.rows_per_part)
            ]

        def read(self, partition):
            start, end = partition.value
            for i in range(start, end):
                yield synth_bar(i)

    class _SynthBarsStreamReader(SimpleDataSourceStreamReader):
        """Offset = {"i": next unread tick id}; each micro-batch emits a
        fixed-size deterministic range, so replaying (start, end) after
        a crash regenerates bit-identical rows (exactly-once without a
        write-ahead log)."""

        def __init__(self, options):
            self.batch_rows = int(options.get("batchrows", "100"))
            self.max_rows = int(options.get("rows", "1000"))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            lo = start["i"]
            hi = min(lo + self.batch_rows, self.max_rows)
            # the wrapper caches via next(it): must be a true iterator
            return iter([synth_bar(i) for i in range(lo, hi)]), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(
                [synth_bar(i) for i in range(start["i"], end["i"])]
            )

    class SynthBarsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthbars"

        def schema(self):
            return _SCHEMA_DDL

        def reader(self, schema):
            return _SynthBarsReader(self.options)

        def simpleStreamReader(self, schema):
            return _SynthBarsStreamReader(self.options)

    return SynthBarsDataSource


def register_synthbars(spark) -> None:
    """Idempotently register the synthbars Python data source."""
    spark.dataSource.register(_register_lazy())

"""S1 seam: fetch-to-landing adapter contract (network ingress stays
OUTSIDE the engine).

The reference's ingest task is a REST pagination loop that fetches bars
and writes one raw JSON document per symbol
(/root/reference/project/ingest_data.py:33-90).  Network ingress is not an
engine concern — a Spark job should never hold API credentials or retry
loops in executor code — so the engine defines the *landing contract*
instead and any fetcher (REST, websocket replay, vendor SFTP drop) plugs
in by writing it:

- one JSON document per (symbol, day): ``{"symbol": ..., "bars": [...]}``
  with ISO-8601 ``t`` timestamps per bar (the multiline shape
  ``sources/json_bronze.py:read_raw_json`` scans in PERMISSIVE mode), OR
- JSONL ticks (one object per line) for the streaming path
  (``streaming/bars_stream.py:read_tick_stream``).

Files must land ATOMICALLY (write to a temp name, rename into the landing
dir) so a concurrent batch/stream scan never reads half a file — the file
source lists by name+mtime and never re-reads a committed file.

``write_landing_doc`` implements the atomic commit; ``LandingFetcher`` is
the adapter protocol; ``FakeBarsFetcher`` is the deterministic in-repo
implementation used by tests (the container has no network — a real
Alpaca/vendor fetcher implements the same two methods with requests +
retries and nothing else changes).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Iterable, Sequence
from datetime import date, datetime, timedelta, timezone
from typing import Protocol


def write_landing_doc(landing_dir: str, name: str, doc: dict) -> str:
    """Atomically commit one raw JSON document into the landing dir.

    tmp-write + ``os.replace`` rename: readers (batch PERMISSIVE scan or
    the file-source stream) either see the whole document or nothing.
    """
    os.makedirs(landing_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=landing_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f)
        final = os.path.join(landing_dir, name)
        os.replace(tmp, final)
        return final
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class LandingFetcher(Protocol):
    """The S1 adapter contract: fetch upstream data, land raw files.

    Implementations own credentials, pagination, rate limits and retries;
    the engine owns everything after the landing directory.
    """

    def fetch_bars(self, symbol: str, day: date) -> list[dict]:
        """Return raw bar dicts for one (symbol, day) — the unit of
        idempotent re-fetch."""
        ...

    def land(
        self, landing_dir: str, symbols: Sequence[str], days: Iterable[date]
    ) -> list[str]:
        """Fetch and atomically write one document per (symbol, day);
        return the landed paths.  Re-running replaces the same files
        (same names) — idempotent by construction."""
        ...


class FakeBarsFetcher:
    """Deterministic offline fetcher (test/CI stand-in for the REST leg).

    Emits ``bars_per_day`` 5-minute bars starting 09:30 ET (14:30 UTC in
    winter) with a reproducible price walk keyed on (symbol, day, index) —
    no randomness, no network, byte-stable across runs.
    """

    def __init__(self, bars_per_day: int = 78, base_price: float = 100.0):
        self.bars_per_day = bars_per_day
        self.base_price = base_price

    def fetch_bars(self, symbol: str, day: date) -> list[dict]:
        start = datetime(day.year, day.month, day.day, 14, 30, tzinfo=timezone.utc)
        out = []
        for i in range(self.bars_per_day):
            # deterministic walk keyed by a stable int hash
            k = (hash_key(symbol) + day.toordinal() * 7 + i) % 19
            price = round(self.base_price + k - 9 + i * 0.01, 4)
            ts = start + timedelta(minutes=5 * i)
            out.append(
                {
                    # sources/json_bronze.py BAR_STRUCT keys; ISO-8601
                    # with offset per TS_FORMAT
                    "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S+00:00"),
                    "open": price,
                    "high": round(price + 0.5, 4),
                    "low": round(price - 0.5, 4),
                    "close": round(price + 0.1, 4),
                    "volume": 100 + k,
                }
            )
        return out

    def land(
        self, landing_dir: str, symbols: Sequence[str], days: Iterable[date]
    ) -> list[str]:
        paths = []
        for day in days:
            for sym in symbols:
                bars = self.fetch_bars(sym, day)
                doc = {
                    "symbol": sym,
                    "timeframe": "5Min",
                    "source": "fake",
                    "feed": "test",
                    "start_utc": bars[0]["timestamp"] if bars else None,
                    "end_utc": bars[-1]["timestamp"] if bars else None,
                    "bars": bars,
                }
                name = f"{sym}_{day.isoformat()}.json"
                paths.append(write_landing_doc(landing_dir, name, doc))
        return paths


def hash_key(s: str) -> int:
    """Stable (non-seeded) string hash for deterministic fake data."""
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % 1_000_003
    return h

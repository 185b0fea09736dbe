"""Property pins for the round-4c drift/graph/dedup additions.

Each test builds a tiny synthetic fixture dir (same parquet layout as
the driver testdata) where the statistic's value is known in closed
form, then runs the REGISTERED query against it — exercising the real
plan, not a reimplementation.  The class-collapse test additionally
pins that banded pair generation over distinct fingerprints equals the
exhaustive all-pairs answer (losslessness + collapse correctness in
one assertion).
"""

from __future__ import annotations

import itertools
import shutil
from pathlib import Path

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries import load_all

_SCRATCH = Path(__file__).resolve().parent / ".drift_props"


def _fixture_dir(spark, name: str, tables: dict) -> str:
    """Write {table: (rows, schema)} as <scratch>/<name>/<table>.parquet."""
    base = _SCRATCH / name
    shutil.rmtree(base, ignore_errors=True)
    for table, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(base / f"{table}.parquet")
        )
    return str(base)


def test_ks_zero_on_identical_sources(spark):
    # two sources with IDENTICAL length multisets: D must be exactly 0
    rows = []
    for i, n in enumerate([100, 200, 200, 300, 550]):
        rows.append((i, "x", "en", "sa", n))
        rows.append((100 + i, "x", "en", "sb", n))
    d = _fixture_dir(
        spark,
        "ks0",
        {"documents": (rows, "doc_id long, text string, lang string, source string, n_chars long")},
    )
    out = load_all()["ks_source_drift"].spark(spark, d).collect()
    assert len(out) == 1
    assert out[0]["ks_stat"] == 0.0
    assert out[0]["drifted"] is False


def test_psi_zero_on_identical_periods(spark):
    # identical price multisets in both halves of the date span -> PSI 0
    import datetime as dt

    prices = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0]
    rows = []
    for i, p in enumerate(prices):
        rows.append((i, p, dt.datetime(2024, 1, 1)))
        rows.append((100 + i, p, dt.datetime(2024, 1, 11)))
    d = _fixture_dir(
        spark,
        "psi0",
        {"orders": (rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp")},
    )
    out = load_all()["psi_price_drift"].spark(spark, d).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["psi_total"] == 0.0 for r in out)


def test_gini_zero_on_uniform_keys(spark):
    rows = [(k,) for k in range(10) for _ in range(5)]
    d = _fixture_dir(
        spark, "gini0", {"lineitem": (rows, "l_partkey long")}
    )
    out = load_all()["key_skew_gini"].spark(spark, d).collect()[0]
    assert out["gini"] == 0.0
    assert out["top1_share"] == 0.1
    assert out["top10_share"] == 1.0


def test_underwater_streak_known_series(spark):
    import datetime as dt

    closes = [10.0, 9.0, 8.0, 11.0, 10.0, 12.0]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), "SYM", c)
        for i, c in enumerate(closes)
    ]
    d = _fixture_dir(
        spark,
        "streaks",
        {"events": (rows, "event_id long, ts timestamp, event_type string, value double")},
    )
    out = load_all()["underwater_streaks"].spark(spark, d).collect()[0]
    # peaks [10,10,10,11,11,12] -> under [F,T,T,F,T,F]
    assert out["n_days"] == 6
    assert out["n_underwater_days"] == 3
    assert out["longest_underwater_run"] == 2


def test_peak_concurrency_midnight_carryover(spark):
    import datetime as dt

    # user 7's session spans midnight: its +1 lands on day 1 and its -1
    # on day 2, so day 2's correct peak NEEDS the cross-day offset
    rows = [
        # day-1 sessions: A 10:00-10:05, B 10:02-10:06 -> peak 2... but C
        # opens 23:50, so day-1 peak is 2 (A+B overlap; C alone later)
        (1, dt.datetime(2024, 1, 1, 10, 0), 1, 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 5), 1, 1.0),
        (3, dt.datetime(2024, 1, 1, 10, 2), 2, 1.0),
        (4, dt.datetime(2024, 1, 1, 10, 6), 2, 1.0),
        # C: 23:50 -> 00:10 next day (10-min gaps keep one session)
        (5, dt.datetime(2024, 1, 1, 23, 50), 7, 1.0),
        (6, dt.datetime(2024, 1, 2, 0, 10), 7, 1.0),
        # D: 00:05-00:07 on day 2, overlapping C's tail -> day-2 peak 2
        (7, dt.datetime(2024, 1, 2, 0, 5), 8, 1.0),
        (8, dt.datetime(2024, 1, 2, 0, 7), 8, 1.0),
    ]
    d = _fixture_dir(
        spark,
        "conc",
        {"events": (rows, "event_id long, ts timestamp, user_id long, value double")},
    )
    out = {
        str(r["day"]): r
        for r in load_all()["peak_concurrency_daily"].spark(spark, d).collect()
    }
    assert out["2024-01-01"]["peak_concurrency"] == 2
    assert out["2024-01-01"]["n_sessions_started"] == 3
    # C is still open when D starts: without the day-offset broadcast the
    # day-2 running sum would start at 0 and report peak 1
    assert out["2024-01-02"]["peak_concurrency"] == 2
    assert out["2024-01-02"]["n_sessions_started"] == 1


def test_simhash60_class_collapse_equals_exhaustive(spark):
    """Banding over distinct fingerprints == exhaustive all-pairs at
    hamming <= 3 (losslessness by pigeonhole + collapse correctness),
    on a replica-heavy corpus."""
    from quant_market_data_pipeline_spark.llm.dedup import (
        simhash60_fingerprints,
        simhash60_neardup_pairs,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "one two three four five six seven eight nine ten",
        "completely different content with other words entirely here now",
    ]
    rows = []
    i = 0
    for t in texts:
        for _ in range(4):  # 4 exact replicas each
            rows.append((i, t))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = simhash60_fingerprints(docs)
    got = {
        (r["doc_lo"], r["doc_hi"], r["hamming"])
        for r in simhash60_neardup_pairs(fp, max_hamming=3).collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == want
    assert len(want) >= len(texts) * 6  # every replica clique survives


def test_markov_rows_are_distributions(spark):
    out = (
        load_all()["event_markov_transitions"]
        .spark(spark, "/root/testdata/sf0.001")
        .groupBy("prev_type")
        .agg(F.sum("prob").alias("s"))
        .collect()
    )
    assert out and all(abs(r["s"] - 1.0) < 1e-4 for r in out)


def test_delete_rows_untouched_partitions_keep_files(spark):
    """Erasure rewrites only partitions containing matching rows; a
    partition with no matches keeps its files byte-identical."""
    import datetime as dt
    import os

    from quant_market_data_pipeline_spark.sources.sink import delete_rows

    base = _SCRATCH / "erase_unit"
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "lake")
    rows = [
        (1, dt.date(2024, 1, 1), 100),   # day1: victim present
        (2, dt.date(2024, 1, 1), 7),
        (3, dt.date(2024, 1, 2), 8),     # day2: no victims
    ]
    spark.createDataFrame(
        rows, "event_id long, trading_date date, user_id long"
    ).coalesce(1).write.partitionBy("trading_date").parquet(lake)

    day2 = os.path.join(lake, "trading_date=2024-01-02")
    before = {
        f: os.path.getmtime(os.path.join(day2, f))
        for f in os.listdir(day2)
        if f.endswith(".parquet")
    }
    touched = delete_rows(spark, lake, F.col("user_id") == 100)
    assert [str(t) for t in touched] == ["2024-01-01"]
    after = {
        f: os.path.getmtime(os.path.join(day2, f))
        for f in os.listdir(day2)
        if f.endswith(".parquet")
    }
    assert before == after  # same files, untouched mtimes
    left = spark.read.parquet(lake).select("event_id").collect()
    assert sorted(r[0] for r in left) == [2, 3]
    # no-match delete is a no-op
    assert delete_rows(spark, lake, F.col("user_id") == 999) == []


def test_expire_partitions_boundary(spark):
    import datetime as dt
    import os

    from quant_market_data_pipeline_spark.sources.sink import (
        expire_partitions,
    )

    base = _SCRATCH / "expire_unit"
    shutil.rmtree(base, ignore_errors=True)
    lake = str(base / "lake")
    rows = [
        (1, dt.date(2024, 1, 1)),
        (2, dt.date(2024, 1, 5)),
        (3, dt.date(2024, 1, 9)),
    ]
    spark.createDataFrame(
        rows, "event_id long, trading_date date"
    ).coalesce(1).write.partitionBy("trading_date").parquet(lake)

    removed = expire_partitions(spark, lake, dt.date(2024, 1, 5))
    assert removed == ["2024-01-01"]  # strictly-older only: day 5 stays
    dirs = {d for d in os.listdir(lake) if d.startswith("trading_date=")}
    assert dirs == {"trading_date=2024-01-05", "trading_date=2024-01-09"}
    # idempotent: nothing left to expire at the same cutoff
    assert expire_partitions(spark, lake, dt.date(2024, 1, 5)) == []


def test_materialize_dim_keeps_lineage_and_bounds_cache(spark):
    """materialize_dim must (a) serve consumers from cache, (b) keep the
    lineage so a lost/evicted cache block recomputes instead of failing
    (the localCheckpoint failure mode it replaces), (c) evict FIFO past
    the bound."""
    from quant_market_data_pipeline_spark import session as S

    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    agg = df.groupBy("k").count()
    out = S.materialize_dim(agg)
    assert out.storageLevel.useMemory  # persisted
    assert out.count() == 7
    # lineage survives: unpersist (simulating block loss) and recompute
    out.unpersist(blocking=True)
    assert out.count() == 7
    # FIFO bound: push > max entries through, oldest get unpersisted
    old_max = S._DIM_CACHE_MAX
    S._DIM_CACHE_MAX = 2
    try:
        frames = [
            S.materialize_dim(spark.range(10 + i).groupBy().count())
            for i in range(4)
        ]
        assert len(S._DIM_CACHE) == 2
        # evicted frames still compute (lineage intact)
        assert frames[0].count() == 1
    finally:
        S._DIM_CACHE_MAX = old_max
        S._DIM_CACHE.clear()

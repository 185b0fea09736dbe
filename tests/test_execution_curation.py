"""Semantic pins for the round-8 execution/curation batch.

Oracle equivalence is the DuckDB gate's job; these tests pin the math on
constructed inputs with closed-form answers (Ljung-Box on an alternating
series, Kelly on a known win/loss mix, Almgren-Chriss conservation) and
the structural invariants the docstrings promise (band-sweep nesting,
planted leakage arithmetic, curriculum stage partitioning).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, schema=_EVENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _one_tick_per_day(prices, symbol="x"):
    """One noon tick per day -> daily close == the given price."""
    base = dt.datetime(2024, 1, 1, 12)
    return [
        (i, base + dt.timedelta(days=i), 1, symbol, float(p), None)
        for i, p in enumerate(prices)
    ]


def test_ljung_box_alternating_series_closed_form(spark, tmp_path):
    """Prices exp(0), exp(1), exp(0), ... give alternating returns
    r = +1, -1, ...; the centered autocorrelations and Q statistic have
    a closed sequential replication."""
    n_prices = 41
    prices = [math.exp(i % 2) for i in range(n_prices)]
    sf = _write_events(spark, tmp_path, _one_tick_per_day(prices))

    from quant_market_data_pipeline_spark.queries.execution import (
        q_ljung_box,
    )

    row = q_ljung_box(spark, sf).collect()[0]
    # sequential replication
    rets = [
        math.log(prices[i + 1]) - math.log(prices[i])
        for i in range(n_prices - 1)
    ]
    n = len(rets)
    rbar = sum(rets) / n
    c = [r - rbar for r in rets]
    denom = sum(x * x for x in c)
    rhos = [
        sum(c[t] * c[t - k] for t in range(k, n)) / denom
        for k in range(1, 6)
    ]
    q = n * (n + 2) * sum(rhos[k - 1] ** 2 / (n - k) for k in range(1, 6))
    assert row.n_days == n
    for k in range(1, 6):
        assert abs(getattr(row, f"rho_{k}") - round(rhos[k - 1], 6)) <= 1e-6
    assert abs(row.q_lb - round(q, 4)) <= 2e-4
    # alternating series: rho_1 strongly negative, rho_2 positive
    assert row.rho_1 < -0.9
    assert row.rho_2 > 0.9


def test_kelly_closed_form_two_outcome_mix(spark, tmp_path):
    """60 days alternating +ln2 (36 days) and -ln2-ish pattern: build a
    known p / b mix and check both Kelly forms."""
    # 3-day cycle: up, up, down with exact dyadic-exp prices
    prices = [1.0]
    for i in range(60):
        prices.append(
            prices[-1] * (2.0 if i % 3 != 2 else 0.25)
        )  # r = +ln2, +ln2, -2ln2
    sf = _write_events(spark, tmp_path, _one_tick_per_day(prices))

    from quant_market_data_pipeline_spark.queries.execution import (
        q_kelly_sizing,
    )

    row = q_kelly_sizing(spark, sf).collect()[0]
    p = 2.0 / 3.0
    b = math.log(2) / (2 * math.log(2))  # avg win / |avg loss| = 0.5
    assert row.n_days == 60
    assert abs(row.win_rate - round(p, 6)) <= 1e-6
    assert abs(row.payoff_ratio - round(b, 6)) <= 1e-6
    assert abs(row.kelly_discrete - round(p - (1 - p) / b, 6)) <= 1e-6
    # continuous form: mu/var from the same series
    rets = [
        math.log(prices[i + 1] / prices[i]) for i in range(len(prices) - 1)
    ]
    mu = sum(rets) / len(rets)
    var = sum((r - mu) ** 2 for r in rets) / (len(rets) - 1)
    assert abs(row.kelly_continuous - round(mu / var, 4)) <= 1e-3


def test_almgren_chriss_conservation_and_shape(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_almgren_chriss,
    )

    rows = q_almgren_chriss(spark, SF_DIR).collect()
    by_sym: dict[str, list] = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r)
    assert len(by_sym) == 5
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r.bucket_idx)
        assert len(rs) == 12
        # starts fully invested, holdings non-increasing (high-vol
        # symbols decay below the 4dp rounding quantum by mid-horizon,
        # so the rounded tail can tie at 0.0)
        assert abs(rs[0].holdings - 10_000.0) < 1e-6
        for a, b in zip(rs, rs[1:]):
            assert a.holdings >= b.holdings
        assert rs[0].holdings > rs[-1].holdings
        # trades liquidate the whole parent order: sum == x_0 - x_T = X
        assert abs(sum(r.trade for r in rs) - 10_000.0) < 2e-3
        # risk-averse trajectory front-loads: first trade >= last trade
        assert rs[0].trade >= rs[-1].trade
        # consistency: trade_j == holdings_j - holdings_{j+1}
        for a, b in zip(rs, rs[1:]):
            assert abs(a.trade - (a.holdings - b.holdings)) <= 2e-4


def test_realized_moments_match_python_on_fixture(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        _daily_rets,
        q_realized_skew_kurt,
    )

    got = {r.symbol: r for r in q_realized_skew_kurt(spark, SF_DIR).collect()}
    rets: dict[str, list] = {}
    for r in _daily_rets(spark, SF_DIR).collect():
        rets.setdefault(r.symbol, []).append(r.r)
    assert set(got) == set(rets)
    for sym, rs in rets.items():
        n = len(rs)
        mean = sum(rs) / n
        m2 = sum((x - mean) ** 2 for x in rs) / n
        m3 = sum((x - mean) ** 3 for x in rs) / n
        m4 = sum((x - mean) ** 4 for x in rs) / n
        assert got[sym].n_days == n
        assert abs(got[sym].skewness - round(m3 / m2**1.5, 6)) <= 2e-6
        assert (
            abs(got[sym].excess_kurtosis - round(m4 / m2**2 - 3, 6)) <= 2e-6
        )


def test_ic_bounds_and_universe_gate(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_ic_decay,
    )

    rows = q_ic_decay(spark, SF_DIR).collect()
    assert {r.horizon for r in rows} <= {1, 3, 5}
    for r in rows:
        assert -1.0 - 1e-9 <= r.mean_ic <= 1.0 + 1e-9
        assert r.n_days >= 1


def test_tail_dependence_bounds(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_tail_dependence,
    )

    rows = q_tail_dependence(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) pairs
    for r in rows:
        assert 0.0 <= r.joint_lo_rate <= 0.2 + 1e-9
        assert 0.0 <= r.tail_dependence <= 1.0 + 1e-9 or (
            # small-sample quantile granularity can push slightly past 1
            r.tail_dependence <= 1.5
        )


def test_portfolio_accounting_identities(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_portfolio_turnover,
    )

    rows = sorted(
        q_portfolio_turnover(spark, SF_DIR).collect(),
        key=lambda r: r.trading_day,
    )
    assert rows
    # first formed day: 4 positions open from zero -> turnover exactly 1
    assert abs(rows[0].turnover - 1.0) < 1e-9
    cum = 0.0
    for r in rows:
        assert 0.0 <= r.turnover <= 2.0 + 1e-9
        assert abs(r.net_ret - round(r.gross_ret - 0.001 * r.turnover, 6)) <= 2e-6
        cum += r.gross_ret - 0.001 * r.turnover
        assert abs(r.cum_net_ret - cum) <= 1e-4


def test_curriculum_stages_partition_the_corpus(spark):
    from quant_market_data_pipeline_spark.queries.curation import (
        q_curriculum_stage_plan,
    )
    from quant_market_data_pipeline_spark.queries.llm import _docs_wide

    rows = sorted(
        q_curriculum_stage_plan(spark, SF_DIR).collect(),
        key=lambda r: r.stage,
    )
    n_docs = _docs_wide(spark, SF_DIR).count()
    assert [r.stage for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r.n_docs for r in rows) == n_docs
    # quartiles up to bin granularity: each stage within 25% +/- 15%
    for r in rows:
        assert 0.05 * n_docs <= r.n_docs <= 0.45 * n_docs
    # stages are ordered score ranges that do not overlap
    for a, b in zip(rows, rows[1:]):
        assert a.max_score <= b.min_score


def test_band_sweep_nesting_and_monotonicity(spark):
    """r-row band collision implies every constituent 1-row band also
    collides, so candidate sets nest: 4x4 <= 8x2 <= 16x1 — counts and
    catch rates must be monotone."""
    from quant_market_data_pipeline_spark.queries.curation import (
        q_minhash_band_sweep,
    )

    rows = {r.bands: r for r in q_minhash_band_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {16, 8, 4}
    assert (
        rows[16].n_candidate_pairs
        >= rows[8].n_candidate_pairs
        >= rows[4].n_candidate_pairs
    )
    assert (
        rows[16].n_twins_caught
        >= rows[8].n_twins_caught
        >= rows[4].n_twins_caught
    )
    assert rows[16].twin_catch_rate == 1.0  # 1-row bands catch every twin
    for r in rows.values():
        assert 0.0 <= r.twin_catch_rate <= 1.0


def test_shard_leakage_planted_arithmetic(spark):
    from quant_market_data_pipeline_spark.queries.curation import (
        q_shard_dedup_leakage,
    )
    from quant_market_data_pipeline_spark.queries.llm import _docs_wide

    rows = q_shard_dedup_leakage(spark, SF_DIR).collect()
    n_docs = _docs_wide(spark, SF_DIR).count()
    n_planted = len(
        [1 for (d,) in _docs_wide(spark, SF_DIR).select("doc_id").collect()
         if d % 3 == 0]
    )
    assert sum(r.n_docs for r in rows) == n_docs + n_planted
    # every planted replica and its original are dup docs
    assert sum(r.n_dup_docs for r in rows) == 2 * n_planted
    # id-hash sharding scatters replicas: overall leak rate near 7/8
    leaked = sum(r.n_leaked_docs for r in rows)
    rate = leaked / (2 * n_planted)
    assert 0.6 <= rate <= 1.0


def test_quality_dup_lift_calibration(spark):
    """Planted replica rates (1/3 short, 1/6 long) make the true lift 2;
    the measured per-source lift must straddle it up to id-modulus
    granularity."""
    from quant_market_data_pipeline_spark.queries.curation import (
        q_quality_dup_interaction,
    )

    rows = q_quality_dup_interaction(spark, SF_DIR).collect()
    assert rows
    tot = sum(r.n_docs for r in rows)
    assert tot > 0
    for r in rows:
        if r.short_over_long_lift is not None and r.n_docs >= 50:
            assert 1.0 <= r.short_over_long_lift <= 4.0


def test_runs_test_alternating_and_trending_closed_form(spark, tmp_path):
    """Perfectly alternating returns -> R = n (every step is a sign
    change); the z-statistic follows the closed form."""
    n_prices = 31
    prices = [math.exp(i % 2) for i in range(n_prices)]
    sf = _write_events(spark, tmp_path, _one_tick_per_day(prices))

    from quant_market_data_pipeline_spark.queries.execution import (
        q_runs_test,
    )

    row = q_runs_test(spark, sf).collect()[0]
    n = n_prices - 1
    n_pos = n // 2
    n_neg = n - n_pos
    mu = 1 + 2 * n_pos * n_neg / n
    sd = math.sqrt((mu - 1) * (mu - 2) / (n - 1))
    assert row.n_runs == n  # alternating: every step changes sign
    assert row.expected_runs == round(mu, 4)
    assert abs(row.runs_z - round((n - mu) / sd, 4)) <= 1e-4
    assert row.runs_z > 3  # far more runs than exchangeable


def test_tick_clock_bars_invariants(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        q_tick_clock_bars,
    )

    rows = q_tick_clock_bars(spark, SF_DIR).collect()
    assert rows
    by_sym: dict[str, list] = {}
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.span_minutes >= 0
        by_sym.setdefault(r.symbol, []).append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r.bar_idx)
        # contiguous bar indexes; every bar but the last holds exactly K
        assert [r.bar_idx for r in rs] == list(range(len(rs)))
        assert all(r.n_ticks == 50 for r in rs[:-1])
        assert 1 <= rs[-1].n_ticks <= 50


def test_token_gini_closed_form_two_token_corpus(spark, tmp_path):
    """One source, vocabulary {a: 9, b: 1}: ranked ascending (b=1 at
    rank 1, a=9 at rank 2), G = 2*(1*1+2*9)/(2*10) - 3/2 = 0.4."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["a a a a a a a a a b"],
            "lang": ["en"],
            "source": ["s1"],
            "n_chars": [19],
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from quant_market_data_pipeline_spark.queries.curation import (
        q_token_gini,
    )

    row = q_token_gini(spark, str(tmp_path)).collect()[0]
    assert row.vocab_size == 2
    assert row.n_tokens == 10
    assert row.gini == 0.4


def test_bigram_entropy_zero_for_deterministic_chain(spark, tmp_path):
    """'a b a b ...' makes every context deterministic (a->b, b->a), so
    the conditional entropy is exactly 0 and perplexity 1."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b " * 20, "a b " * 5],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": [80, 20],
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from quant_market_data_pipeline_spark.queries.curation import (
        q_bigram_entropy_rate,
    )

    row = q_bigram_entropy_rate(spark, str(tmp_path)).collect()[0]
    assert row.cond_entropy_nats == 0.0
    assert row.perplexity == 1.0


def test_heaps_fit_detects_saturated_fixture_vocab(spark):
    """The synthetic corpus draws from a fixed 31-word vocabulary, so
    vocabulary saturates by the first checkpoint: beta == 0 exactly and
    K == the full vocab — precisely the 'synthetic/duplicated corpus'
    signal the audit exists to raise."""
    from quant_market_data_pipeline_spark.queries.curation import (
        q_heaps_law_fit,
    )

    row = q_heaps_law_fit(spark, SF_DIR).collect()[0]
    assert row.n_points == 8
    assert row.heaps_beta == 0.0
    assert row.heaps_k == 31.0


def test_heaps_fit_near_one_for_linear_vocab_growth(spark, tmp_path):
    """Each doc introduces 2 brand-new tokens plus fixed filler: vocab
    grows linearly in tokens, so the fitted exponent approaches 1."""
    import pandas as pd

    texts = [
        f"new{2 * i} new{2 * i + 1} " + "the of and " * 2
        for i in range(64)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(64),
            "text": texts,
            "lang": ["en"] * 64,
            "source": ["s1"] * 64,
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from quant_market_data_pipeline_spark.queries.curation import (
        q_heaps_law_fit,
    )

    row = q_heaps_law_fit(spark, str(tmp_path)).collect()[0]
    assert 0.8 <= row.heaps_beta <= 1.1


def test_kalman_converges_to_true_beta_constant_pair(spark, tmp_path):
    """y-symbol price e^0.7, x-symbol price e (so x=1, y=0.7 in logs):
    with beta0=0 the filter must converge to beta=0.7, innovations must
    shrink to ~0, and the gain sequence must be strictly decreasing
    (covariance contracts on a constant regressor)."""
    rows = []
    base = dt.datetime(2024, 1, 1, 12)
    for i in range(40):
        rows.append((2 * i, base + dt.timedelta(days=i), 1, "click",
                     math.exp(0.7), None))
        rows.append((2 * i + 1, base + dt.timedelta(days=i), 1, "view",
                     math.e, None))
    sf = _write_events(spark, tmp_path, rows)

    from quant_market_data_pipeline_spark.queries.execution import (
        q_kalman_hedge_beta,
    )

    out = sorted(
        q_kalman_hedge_beta(spark, sf).collect(),
        key=lambda r: r.trading_day,
    )
    assert len(out) == 40
    assert abs(out[0].innovation - 0.7) < 1e-6  # first innovation = y
    assert abs(out[-1].beta - 0.7) < 1e-3
    assert abs(out[-1].innovation) < 1e-3
    gains = [r.gain for r in out]
    assert all(a > b for a, b in zip(gains, gains[1:]))


def test_ewma_riskmetrics_fixed_point_constant_returns(spark, tmp_path):
    """Prices doubling daily: r = ln2 every day, so r^2 is the EWMA
    fixed point and ewma_vol == ln2 on every day (up to the 1-ulp
    (lam + (1-lam)) != 1 drift, far under 6dp)."""
    prices = [2.0**i for i in range(31)]
    sf = _write_events(spark, tmp_path, _one_tick_per_day(prices))

    from quant_market_data_pipeline_spark.queries.execution import (
        q_ewma_vol_riskmetrics,
    )

    rows = q_ewma_vol_riskmetrics(spark, sf).collect()
    assert len(rows) == 30
    ln2 = round(math.log(2.0), 6)
    for r in rows:
        assert abs(r.ewma_vol - ln2) <= 1e-6


def test_ewma_riskmetrics_matches_sequential_replication(spark):
    from quant_market_data_pipeline_spark.queries.execution import (
        _daily_rets,
        q_ewma_vol_riskmetrics,
    )

    got = {
        (r.symbol, r.trading_day): r.ewma_vol
        for r in q_ewma_vol_riskmetrics(spark, SF_DIR).collect()
    }
    series: dict[str, list] = {}
    for r in sorted(
        _daily_rets(spark, SF_DIR).collect(),
        key=lambda r: (r.symbol, r.trading_day),
    ):
        series.setdefault(r.symbol, []).append((r.trading_day, r.r))
    n_checked = 0
    for sym, days in series.items():
        v = None
        for day, r in days:
            v = r * r if v is None else 0.94 * v + (1.0 - 0.94) * r * r
            assert abs(got[(sym, day)] - round(math.sqrt(v), 6)) <= 1e-6
            n_checked += 1
    assert n_checked == len(got)

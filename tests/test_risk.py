"""Risk & strategy analytics properties (queries/risk.py).

Oracle equivalence is covered by the DuckDB gate; these pin the
invariants the SQL can't state: estimator non-negativity, ratio sign
consistency, regression identities, backtest accounting.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quant_market_data_pipeline_spark.queries.risk import (
    q_engle_granger,
    q_garman_klass,
    q_meanrev_backtest,
    q_sharpe_sortino,
    q_xsection_momentum,
)

SF_DIR = "/root/testdata/sf0.001"


def test_parkinson_nonnegative_gk_bounded(spark):
    rows = q_garman_klass(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Parkinson is a squared log-range: strictly >= 0
        assert r.parkinson_var >= 0
        # GK subtracts a fraction of ln(C/O)^2 from half the squared
        # range; it's bounded above by half the squared range
        hl2 = r.parkinson_var * 4 * math.log(2.0)
        assert r.gk_var <= 0.5 * hl2 + 1e-9


def test_sharpe_sign_matches_mean(spark):
    rows = q_sharpe_sortino(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.ann_sharpe is not None and r.mean_ret is not None:
            if abs(r.mean_ret) > 1e-9:
                assert (r.ann_sharpe > 0) == (r.mean_ret > 0)
        # downside deviation <= full deviation => |sortino| >= |sharpe|
        if (
            r.ann_sortino is not None
            and r.ann_sharpe is not None
            and r.mean_ret is not None
            and r.mean_ret > 0
        ):
            assert r.ann_sortino >= r.ann_sharpe - 1e-6


def test_autocorr_in_unit_interval(spark):
    from quant_market_data_pipeline_spark.queries.risk import (
        q_return_autocorr,
    )

    rows = q_return_autocorr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        for v in (r.ac1, r.ac2, r.ac3):
            if v is not None:
                assert -1.0001 <= v <= 1.0001


def test_xsection_spread_is_winner_minus_loser(spark):
    rows = q_xsection_momentum(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_symbols >= 4
        if r.winner_ret is not None and r.loser_ret is not None:
            assert abs(
                r.momentum_spread - round(r.winner_ret - r.loser_ret, 6)
            ) <= 2e-6


def test_engle_granger_pairs_ordered_and_rho_bounded(spark):
    rows = q_engle_granger(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sym_a < r.sym_b
        if r.resid_rho1 is not None:
            assert -1.0001 <= r.resid_rho1 <= 1.0001
        assert r.n_days >= 2


def test_backtest_accounting(spark):
    rows = q_meanrev_backtest(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_bars_in_position == 0:
            # flat the whole time => zero PnL, null hit rate
            assert r.total_logret == 0.0
            assert r.hit_rate is None
        elif r.hit_rate is not None:
            assert 0.0 <= r.hit_rate <= 1.0


def test_lead_lag_pairs_ordered(spark):
    from quant_market_data_pipeline_spark.queries.risk import q_lead_lag_xcorr

    rows = q_lead_lag_xcorr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sym_a < r.sym_b
        for v in (r.a_leads_b, r.b_leads_a):
            if v is not None:
                assert -1.0001 <= v <= 1.0001


def test_kyle_lambda_gated_on_variance(spark):
    from quant_market_data_pipeline_spark.queries.risk import q_kyle_lambda

    rows = q_kyle_lambda(spark, SF_DIR).collect()
    assert rows
    # lambda is null exactly when signed-volume variance is zero
    assert any(r.kyle_lambda is not None for r in rows)
    for r in rows:
        assert r.n_bars >= 1


def test_yang_zhang_combination_identity(spark):
    from quant_market_data_pipeline_spark.queries.risk import (
        q_yang_zhang_vol,
    )

    rows = q_yang_zhang_vol(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # variances are non-negative; k is in (0, 0.34)
        assert r.sigma2_overnight >= 0
        assert r.sigma2_openclose >= 0
        assert 0 < r.k_yz < 0.34
        # the published combination, recomputed from the rounded parts,
        # agrees with yz_var to rounding tolerance
        recon = (
            r.sigma2_overnight
            + r.k_yz * r.sigma2_openclose
            + (1 - r.k_yz) * r.sigma2_rs
        )
        # k is published at 6 dp, so recon carries ~|s2_oc - s2_rs| * 5e-7
        assert abs(r.yz_var - recon) < 1e-5


def test_triple_barrier_label_first_touch_consistent(spark):
    from quant_market_data_pipeline_spark.queries.risk import (
        _TB_HORIZON,
        q_triple_barrier_labels,
    )

    rows = q_triple_barrier_labels(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r.label)
        assert r.label in (-1, 0, 1)
        assert 0 <= r.n_future <= _TB_HORIZON
        assert 0 <= r.up_pos <= r.n_future
        assert 0 <= r.dn_pos <= r.n_future
        if r.label == 1:
            assert r.up_pos > 0
            assert r.dn_pos == 0 or r.up_pos < r.dn_pos
            assert r.t_hit == r.up_pos
        elif r.label == -1:
            assert r.dn_pos > 0
            assert r.up_pos == 0 or r.dn_pos < r.up_pos
            assert r.t_hit == r.dn_pos
        else:
            # timeout or same-session tie
            assert r.t_hit is None
            assert r.up_pos == r.dn_pos or min(
                p for p in (r.up_pos, r.dn_pos) if p > 0
            ) == max(r.up_pos, r.dn_pos)
    # the tick universe must exercise at least two label classes
    assert len(seen) >= 2

"""Round-11 window pins: the full-slot staleness-weighted sample
recomputed from committed artifacts, bounded with before_round=11 from
day one (the r9/r10 pattern), plus the live-prefix assertion — the
driver verifies the first 50 of load_all(), so the current round's
window must BE that prefix."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _window():
    from quant_market_data_pipeline_spark.queries import (
        _R11_NEW,
        _R11_SAMPLE,
        _R11_TOUCHED,
        load_all,
    )

    return _R11_NEW, _R11_TOUCHED, _R11_SAMPLE, list(load_all())


def _r11_registry_names():
    """The registry AS OF round 11: the live registry minus queries
    that first appear in round 12+."""
    import staleness_sample as ss

    new, touched_l, sample, names = _window()
    seen = ss.last_verified_rounds(REPO, before_round=12)
    era = set(seen) | set(new) | set(touched_l) | set(sample)
    return [n for n in names if n in era]


def test_r11_sample_matches_policy():
    import staleness_sample as ss

    new, touched_l, sample, _ = _window()
    names = _r11_registry_names()
    touched = set(new) | set(touched_l)
    k = 50 - len(new) - len(touched_l)
    expected = ss.staleness_sample(11, names, touched, k=k, repo_root=REPO)
    assert sample == expected


def test_r11_window_filled_driver_slots():
    """(a)+(b)+(c) covered the driver's full 50-query prefix (the live
    prefix assertion moved to the current round's test — the registry
    now leads with the r12 window)."""
    new, touched_l, sample, _ = _window()
    window = new + touched_l + sample
    assert len(window) == 50
    assert len(set(window)) == 50


def test_r11_sample_prefers_oldest_verification():
    import staleness_sample as ss

    new, touched_l, sample, _ = _window()
    touched = set(new) | set(touched_l)
    seen = ss.last_verified_rounds(REPO, before_round=11)
    sampled_max = max(seen.get(n, -1) for n in sample)
    rest = [
        n
        for n in _r11_registry_names()
        if n not in touched and n not in sample
    ]
    assert all(seen.get(n, -1) >= sampled_max for n in rest)

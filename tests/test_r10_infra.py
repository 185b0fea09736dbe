"""Round-10 window pins: the staleness-weighted sample (now sized to
fill the full driver window) recomputed from committed artifacts.
Bounded with before_round=10 FROM DAY ONE (r9 judge directive #1): the
moment the driver writes CORRECTNESS_r10.json, unbounded last-verified
rounds would flip both assertions.  Era-scoped from r11 on (the r9
test's pattern): queries first registered in r11+ are never-verified
under the r10 bound and would retroactively displace sample entries."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _window():
    from quant_market_data_pipeline_spark.queries import (
        _R10_NEW,
        _R10_SAMPLE,
        _R10_TOUCHED,
        load_all,
    )

    return _R10_NEW, _R10_TOUCHED, _R10_SAMPLE, list(load_all())


def _r10_registry_names():
    """The registry AS OF round 10: the live registry minus queries that
    first appear in round 11+ (no verification before round 11 and not
    in the r10 window)."""
    import staleness_sample as ss

    new, touched_l, sample, names = _window()
    seen = ss.last_verified_rounds(REPO, before_round=11)
    era = set(seen) | set(new) | set(touched_l) | set(sample)
    return [n for n in names if n in era]


def test_r10_sample_matches_policy():
    import staleness_sample as ss

    new, touched_l, sample, _ = _window()
    names = _r10_registry_names()
    touched = set(new) | set(touched_l)
    k = 50 - len(new) - len(touched_l)
    expected = ss.staleness_sample(10, names, touched, k=k, repo_root=REPO)
    assert sample == expected


def test_r10_window_filled_driver_slots():
    """(a)+(b)+(c) covered the driver's full 50-query prefix (the live
    prefix assertion moved to the current round's test — the registry
    now leads with the r11 window)."""
    new, touched_l, sample, _ = _window()
    window = new + touched_l + sample
    assert len(window) == 50
    assert len(set(window)) == 50


def test_r10_sample_prefers_oldest_verification():
    import staleness_sample as ss

    new, touched_l, sample, _ = _window()
    touched = set(new) | set(touched_l)
    seen = ss.last_verified_rounds(REPO, before_round=10)
    sampled_max = max(seen.get(n, -1) for n in sample)
    rest = [
        n
        for n in _r10_registry_names()
        if n not in touched and n not in sample
    ]
    assert all(seen.get(n, -1) >= sampled_max for n in rest)

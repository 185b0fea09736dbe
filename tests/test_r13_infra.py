"""Round-13 infrastructure pins.

1. The r13 driver window: exactly 50 names, new + touched first, the
   staleness sample matches tools/staleness_sample.py's policy, and the
   r5 remnant + r6 cohort are FULLY drained (judge directive #5).
2. Env-normalized artifact fields (judge directive #1): value_envnorm
   and the *_envnorm flag lists make the committed entry carry its own
   environmental correction.
3. Min-of-2 lane warm walls (judge directive #2): the recorded warm wall
   can never exceed its own cold wall (physically impossible readings
   like r12's ann_ivf_topk warm 11.63 s vs cold 4.43 s are excluded by
   construction).
4. Slim-line headroom (ADVICE r12): the drop-order fitter accounts for
   the slim_dropped payload itself, so dropping keys can never push the
   printed line back over the driver's 2000-char capture.
5. Scratch sweep age backstop (ADVICE r12): a day-old pid dir is swept
   even when its recycled pid is alive.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _window():
    from quant_market_data_pipeline_spark.queries import (
        _R13_NEW,
        _R13_SAMPLE,
        _R13_TOUCHED,
        load_all,
    )

    return _R13_NEW, _R13_TOUCHED, _R13_SAMPLE, list(load_all())


def test_r13_window_is_live_driver_prefix():
    """(The live `first 50 == window` assertion moved to
    test_r14_infra.py — the registry now leads with the r14 window.)"""
    new, touched_l, sample, names = _window()
    window = new + touched_l + sample
    assert len(window) == 50
    assert len(set(window)) == 50


def test_r13_sample_matches_policy():
    import staleness_sample as ss

    new, touched_l, sample, names = _window()
    touched = set(new) | set(touched_l)
    k = 50 - len(new) - len(touched_l)
    # era scope: replay the policy as of r13 — the r14-NEW queries did
    # not exist then (and, never-verified, would sort stalest of all),
    # so exclude them from the candidate pool; staleness_sample(13, ..)
    # already bounds verification history to rounds < 13
    from quant_market_data_pipeline_spark import queries as q

    names_r13 = [n for n in names if n not in set(q._R14_NEW)]
    expected = ss.staleness_sample(
        13, names_r13, touched, k=k, repo_root=REPO
    )
    assert sample == expected


def test_r13_window_drains_r5_and_r6_cohorts():
    import staleness_sample as ss

    new, touched_l, sample, names = _window()
    window = set(new) | set(touched_l) | set(sample)
    seen = ss.last_verified_rounds(REPO, before_round=13)
    registered = set(names)
    stale_r5_r6 = {
        n for n, last in seen.items()
        if last <= 6 and n in registered
    }
    missing = stale_r5_r6 - window
    assert not missing, f"r5/r6-stale queries left out: {missing}"


def test_envnorm_fields_in_artifact_schema():
    """The committed artifact carries its own environmental correction:
    bench.py emits value_envnorm + *_envnorm flag lists (source pin —
    the full run is the driver's job)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    for key in (
        '"value_envnorm"',
        '"regressions_envnorm_over_20pct"',
        '"docscale_regressions_envnorm"',
        '"tickscale_regressions_envnorm"',
        '"sf1_regressions_envnorm"',
        '"sf1grown_regressions_envnorm"',
    ):
        assert key in src, key
    # and the headline envnorm twins are in the slim printed line
    assert src.count('"value_envnorm"') >= 2


def test_lane_warm_wall_never_exceeds_cold():
    """_lane_warm_wall returns min over observed runs INCLUDING the cold
    wall, so warm <= cold by construction; a third run triggers only
    when min(2 warm) > cold."""
    import bench

    src = open(os.path.join(REPO, "bench.py")).read()
    assert "_lane_warm_wall" in src
    assert "min(walls + ([cold_wall]" in src
    # spread dicts recorded for all four lanes
    for key in (
        '"docscale_warm_spread"',
        '"tickscale_warm_spread"',
        '"sf1_warm_spread"',
        '"sf1grown_warm_spread"',
    ):
        assert key in src, key


def test_slim_fitter_reserves_headroom_for_dropped_list():
    """ADVICE r12: the fitter measures the line WITH the prospective
    slim_dropped payload, so the printed line can never regrow past the
    limit from the act of dropping."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "_slim_len" in src
    i = src.index("def _slim_len")
    body = src[i : src.index("for key in _SLIM_DROP_ORDER", i)]
    assert "slim_dropped" in body and "dropped" in body


def test_scratch_sweep_age_backstop(tmp_path, monkeypatch):
    """A pid dir older than the age threshold is swept even when its
    (recycled) pid is alive."""
    from quant_market_data_pipeline_spark.queries import streaming_e2e

    root = tmp_path / ".stream_e2e"
    root.mkdir()
    bad_name = root / f"pid{os.getpid()}x"  # invalid int -> skipped
    bad_name.mkdir()
    os.utime(bad_name, (0, 0))  # ancient AND unparseable: must survive
    alive_recycled = root / "pid1"  # pid 1 is always alive
    alive_recycled.mkdir()
    os.utime(alive_recycled, (0, 0))  # epoch mtime: ancient
    fresh_alive = root / f"pid{os.getpid() + 100000}"
    fresh_alive.mkdir()  # fresh mtime, dead pid -> swept by liveness
    monkeypatch.setattr(streaming_e2e, "_SCRATCH_ROOT", root)
    monkeypatch.setattr(streaming_e2e, "_SCRATCH", root / "pidself")
    streaming_e2e._sweep_stale_scratch()
    assert bad_name.exists(), "unparseable dir name swept"
    assert not alive_recycled.exists(), "ancient recycled-pid dir kept"
    assert not fresh_alive.exists(), "dead-pid dir kept"

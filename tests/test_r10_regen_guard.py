"""Round-10 stretch: the post-regen source guard's logic."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_regen_guard_flags_and_clears(tmp_path):
    import regen_guard as rg

    pkg = tmp_path / "quant_market_data_pipeline_spark"
    pkg.mkdir()
    src = pkg / "mod.py"
    src.write_text("x = 1\n")
    art = tmp_path / "CORRECTNESS_LOCAL_sf001.json"

    # no artifact at all -> flagged
    assert rg.stale_sources(str(tmp_path))

    # artifact newer than source -> clean
    time.sleep(0.02)
    art.write_text("{}")
    assert rg.stale_sources(str(tmp_path)) == []

    # source touched after the artifact -> flagged by name
    time.sleep(0.02)
    src.write_text("x = 2\n")
    assert rg.stale_sources(str(tmp_path)) == [
        os.path.join("quant_market_data_pipeline_spark", "mod.py")
    ]

"""Refresh CORRECTNESS_LOCAL_sf1.json with the round-11 new/touched
re-run (.sf1_runs/r11_touched.json — check_oracle --strict on the same
grown fixture).

Round-11 changes re-verified here: the HLL 2x raw-branch numerator fix
(values change on BOTH engines at every scale, so the grown-sf1 entry
must be re-hashed, not carried forward), the three r11 sketch/stream
queries from the first half of the round (multi-probe LSH + its recall
audit, streamed quantile histogram, skew-safe Q21), and the second
half's additions: KMV/theta set ops, sorted-neighborhood dedup,
streamed Count-Min, plus countmin_heavy_hitters whose bucket expression
moved to the shared cms_bucket_expr/_sql fragments (semantics
unchanged — re-verified anyway: artifact entries state what the
committed code computes, not what a refactor intended).
"""

from __future__ import annotations

import json

art = json.load(open("CORRECTNESS_LOCAL_sf1.json"))
for run_path in (
    ".sf1_runs/r11_touched.json",
    ".sf1_runs/r11_bloom.json",  # stream_bloom_e2e landed after the
    # 12-query run; same fixture, same mode
):
    run = json.load(open(run_path))
    assert run["sf_dir"].endswith(".bench_scale/sf1.0_grown")
    assert run["strict"]
    for name, res in run["results"].items():
        assert res["status"] == "ok", (name, res)
        art["results"][name] = {"status": "ok", "strict": True}

r = art["results"]
art["n_ok"] = sum(1 for v in r.values() if v["status"] == "ok")
art["n_fail"] = sum(1 for v in r.values() if v["status"] == "fail")
art["n_excluded"] = sum(
    1 for v in r.values() if v["status"].startswith("excluded")
)
art["n_queries"] = len(r)
art["provenance"] = (
    art["provenance"]
    + "; r11: new/touched queries (HLL numerator fix, multi-probe LSH "
    "family, streamed quantile + Count-Min maintenance, KMV/theta set "
    "ops, sorted-neighborhood dedup, skew-safe Q21, shared-fragment "
    "CMS refactor) re-verified strict on the same fixture "
    "(.sf1_runs/r11_touched.json)"
)
with open("CORRECTNESS_LOCAL_sf1.json", "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
print(
    f"updated: {art['n_ok']} ok / {art['n_fail']} fail / "
    f"{art['n_excluded']} excluded of {art['n_queries']}"
)

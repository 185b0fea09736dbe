"""Refresh CORRECTNESS_LOCAL_sf1.json with the round-13 new/touched
re-runs (check_oracle --strict on the same grown fixture).

Round-13 changes re-verified here: the three new queries (k-means-
trained PQ codebooks — pq_trained_recall_audit +
pq_trained_distortion_report — and the adaptive IVF+PQ index
ann_ivfpq_adaptive_recall_audit, grown-sf1 recall 0.23 -> 0.933), plus
the ten members of the shingle case-folding unification (oracle and
engine lowered together — re-verified because artifact entries state
what the committed code computes, not what a refactor intended).

Provenance lists every merged run file, BUILT FROM the iterated list
itself (ADVICE r12: the r12 script's hand-written provenance string
understated which runs were folded in).
"""

from __future__ import annotations

import json

RUNS = [
    ".sf1_runs/r13_ivfpq_adaptive.json",
    ".sf1_runs/r13_pq_trained.json",
    ".sf1_runs/r13_casefold.json",
    ".sf1_runs/r13_residual.json",
    ".sf1_runs/r13_sq8.json",
]

art = json.load(open("CORRECTNESS_LOCAL_sf1.json"))
for run_path in RUNS:
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
# idempotent: strip any prior r13 clause before appending (the script
# re-runs when a late-round query adds a run file)
art["provenance"] = art["provenance"].split("; r13:")[0]
art["provenance"] = (
    art["provenance"]
    + "; r13: new/touched queries (trained-PQ pair, adaptive IVF+PQ, "
    "the residual-PQ/IVFADC pair, the SQ8 tier, the 10-member shingle case-folding "
    "unification) re-verified strict on the same fixture ("
    + ", ".join(RUNS) + ")"
)
with open("CORRECTNESS_LOCAL_sf1.json", "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
print(
    f"updated: {art['n_ok']} ok / {art['n_fail']} fail / "
    f"{art['n_excluded']} excluded of {art['n_queries']}"
)

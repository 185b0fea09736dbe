"""Refresh CORRECTNESS_LOCAL_sf1.json with the round-12 new/touched
re-run (.sf1_runs/r12_new.json — check_oracle --strict on the same
grown fixture).

Round-12 changes re-verified here: the two new queries
(stream_minhash_e2e — incremental MinHash maintenance, MIN merge;
snm_neardup_pairs_2pass — multi-pass SNM with the rotated suffix key
and the planted re-rendering twin family), plus zorder_skipping_audit
(read_amplification zero-guard on both engines, ADVICE r11) and
minhash_lsh_pairs (corpus/oracle extracted into the shared
lsh_corpus_shingled / MINHASH_LSH_ORACLE fragments; semantics
unchanged — re-verified anyway: artifact entries state what the
committed code computes, not what a refactor intended).
"""

from __future__ import annotations

import json

art = json.load(open("CORRECTNESS_LOCAL_sf1.json"))
for run_path in (
    ".sf1_runs/r12_new.json",
    ".sf1_runs/r12_kmv.json",
    ".sf1_runs/r12_snm2opt.json",
    ".sf1_runs/r12_pq.json",
    ".sf1_runs/r12_ivfpq.json",
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
    + "; r12: new/touched queries (streamed MinHash MIN-merge, 2-pass "
    "SNM, streamed KMV k-min union + shared kmv_hv fragment, zorder "
    "zero-guard, shared LSH corpus fragment) re-verified "
    "strict on the same fixture (.sf1_runs/r12_new.json, r12_kmv.json)"
)
with open("CORRECTNESS_LOCAL_sf1.json", "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
print(
    f"updated: {art['n_ok']} ok / {art['n_fail']} fail / "
    f"{art['n_excluded']} excluded of {art['n_queries']}"
)

"""Finalize the grown-sf1.0 strict artifact (r11: one FRESH full run).

Unlike r10's three-part merge, round 11 regenerates
``CORRECTNESS_LOCAL_sf1.json`` with ONE full ``check_oracle --strict``
invocation over the whole registry on the regenerated grown fixture.
The only expected non-ok entry is ``simhash_neardup_pairs``, whose
operating-range guard fails fast at plan build on the 50k-doc corpus
(engine behavior since r10).  This tool converts that one recorded
failure into the documented ``excluded_fail_fast`` status, recomputes
the counters, stamps provenance, and exits non-zero on ANY other
failure — a real regression must never be silently excluded.

Usage: python tools/finalize_sf1_artifact.py [artifact.json]
"""

from __future__ import annotations

import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_LOCAL_sf1.json"
art = json.load(open(path))
assert art["strict"] and art["sf_dir"].endswith(".bench_scale/sf1.0_grown")

failed = {
    n: r for n, r in art["results"].items() if r.get("status") == "fail"
}
guard = failed.pop("simhash_neardup_pairs", None)
if failed:
    print(f"REAL failures, refusing to finalize: {sorted(failed)}")
    sys.exit(1)
if guard is not None:
    assert "out of operating range" in guard["errors"][0], guard
    art["results"]["simhash_neardup_pairs"] = {
        "status": "excluded_fail_fast",
        "note": (
            "r11: check_simhash_operating_range raises at plan build on "
            "this 50k-doc corpus (16-bit space supports 16,384 at load "
            "0.25; measured 46.9M-pair blowup, r9).  Error recorded "
            "verbatim below; simhash32/simhash60 pass strict at this "
            "scale."
        ),
        "error": guard["errors"][0],
    }
art["n_ok"] = sum(
    1 for r in art["results"].values() if r.get("status") == "ok"
)
art["n_fail"] = sum(
    1 for r in art["results"].values() if r.get("status") == "fail"
)
art["n_excluded"] = sum(
    1
    for r in art["results"].values()
    if r.get("status") == "excluded_fail_fast"
)
art["n_queries"] = len(art["results"])
art["provenance"] = (
    "r11: ONE full tools/check_oracle.py --strict run over the whole "
    "registry on the regenerated .bench_scale/sf1.0_grown fixture "
    "(tools/gen_sf1_grown.py, seed 42), finalized by "
    "tools/finalize_sf1_artifact.py (simhash_neardup_pairs guard "
    "failure -> excluded_fail_fast; any other failure aborts)."
)
json.dump(art, open(path, "w"), indent=1, sort_keys=True)
print(
    f"finalized {path}: {art['n_ok']} ok, {art['n_excluded']} excluded, "
    f"{art['n_fail']} fail of {art['n_queries']}"
)

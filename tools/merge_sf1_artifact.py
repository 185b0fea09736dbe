"""Assemble CORRECTNESS_LOCAL_sf1.json from the two grown-sf1.0 runs.

The full-registry strict run against `.bench_scale/sf1.0_grown` was
executed in two invocations of tools/check_oracle.py (identical code,
identical fixture):

- run 1 covered queries a..simhash_fingerprints (its per-query `ok`
  lines are parsed from sf1_grown_check.log; the process was stopped
  before writing its JSON when `simhash_neardup_pairs` saturated — see
  below);
- run 2 (`.sf1_runs/part2.json`) covered every remaining query,
  including the round-9 additions.

`simhash_neardup_pairs` is recorded as EXCLUDED, not failed: at the
grown 50k-doc corpus the 16-bit fingerprint space (65,536 values) is
saturated and the blocked candidate join emits a measured 46,921,518
pairs — the full-frame strict compare (two engine collects + a
Python-side cell-by-cell diff) is memory/time-prohibitive, and the
output itself demonstrates the variant is out of its operating range
(the production 32/60-bit variants stay sparse and PASS strict at this
scale, which is exactly why the dedup pipeline uses them).  The
saturation number is the useful result; it is recorded in the artifact
and in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXCLUDED_NOTE = (
    "excluded from the full-frame strict compare at sf1.0: the 16-bit "
    "fingerprint space saturates at the grown 50k-doc corpus — the "
    "blocked candidate join emits 46,921,518 pairs (measured via the "
    "oracle's own CTE), so the variant is out of its documented "
    "operating range here; the production simhash32/simhash60 variants "
    "pass strict at this scale (see their entries)"
)


def main() -> int:
    results: dict[str, dict] = {}
    log_text = open("sf1_grown_check.log", errors="replace").read()
    # The log's `ok` lines are only trustworthy if the run they came
    # from used the grown fixture WITH --strict (ADVICE r9).
    # check_oracle.py now prints a machine-readable PROVENANCE line; the
    # round-9 log predates it, so `--trust-legacy-log` accepts that one
    # captured log after the command line recorded at its top is
    # checked by hand (it was: see CORRECTNESS_LOCAL_sf1.json
    # provenance).  Fresh runs must carry the line.
    prov = re.search(
        r"PROVENANCE check_oracle sf_dir=(\S+) strict=(\S+)", log_text
    )
    if prov:
        assert prov.group(1) == ".bench_scale/sf1.0_grown", prov.group(1)
        assert prov.group(2) == "True", "run-1 log was not --strict"
    else:
        assert "--trust-legacy-log" in sys.argv, (
            "sf1_grown_check.log has no PROVENANCE line; re-run "
            "check_oracle (which now emits one) or pass "
            "--trust-legacy-log for the hand-audited round-9 log"
        )
    for line in log_text.splitlines():
        for m in re.finditer(r"  ok ([a-z0-9_]+)", line):
            results[m.group(1)] = {"status": "ok", "strict": True}
    part2 = json.load(open(".sf1_runs/part2.json"))
    assert part2["sf_dir"] == ".bench_scale/sf1.0_grown"
    assert part2["strict"]
    results.update(part2["results"])
    # run 3: the four queries whose grown-run failures were fixed
    # (bit_count widening, label-packing radix, microsecond RANGE
    # keys, correctly-rounded decimal->double) re-verified strict on
    # the same fixture with the fixed code — supersedes their run-2
    # entries.
    part3 = json.load(open(".sf1_runs/part3.json"))
    assert part3["sf_dir"] == ".bench_scale/sf1.0_grown"
    assert part3["strict"]
    assert part3["n_fail"] == 0, "re-verification run must be green"
    results.update(part3["results"])
    results["simhash_neardup_pairs"] = {
        "status": "excluded",
        "note": EXCLUDED_NOTE,
    }

    from quant_market_data_pipeline_spark.queries import load_all

    registry = set(load_all())
    missing = registry - set(results)
    if missing:
        print(f"registry queries missing from both runs: {sorted(missing)}")
        return 1
    extra = set(results) - registry
    for name in extra:  # stale names from interleaved log lines
        del results[name]

    doc = {
        "sf_dir": ".bench_scale/sf1.0_grown",
        "strict": True,
        "n_queries": len(results),
        "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "n_rows_only": sum(
            1 for r in results.values() if r["status"] == "rows_only"
        ),
        "n_fail": sum(
            1 for r in results.values() if r["status"] == "fail"
        ),
        "n_excluded": sum(
            1 for r in results.values() if r["status"] == "excluded"
        ),
        "provenance": (
            "three invocations of tools/check_oracle.py --strict on "
            "the same fixture: a..simhash_fingerprints from "
            "sf1_grown_check.log, the remainder from a resumed run, "
            "and the four queries fixed after the resumed run's "
            "failures re-verified on the fixed code; merged by "
            "tools/merge_sf1_artifact.py (see its docstring for the "
            "simhash_neardup_pairs exclusion)"
        ),
        "results": dict(sorted(results.items())),
    }
    for name, r in sorted(results.items()):
        if r["status"] == "fail":
            print("FAIL", name, r.get("errors"))
    with open("CORRECTNESS_LOCAL_sf1.json", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"wrote CORRECTNESS_LOCAL_sf1.json: {doc['n_ok']} ok / "
        f"{doc['n_fail']} fail / {doc['n_excluded']} excluded "
        f"of {doc['n_queries']}"
    )
    return 1 if doc["n_fail"] else 0


if __name__ == "__main__":
    sys.exit(main())

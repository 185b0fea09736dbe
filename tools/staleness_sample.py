"""Staleness-weighted re-confirmation sample for the correctness window.

Round-8 judge directive #5: with 275+ registered queries and a ~50-query
driver window per round, a uniform seeded 20-sample gives a never-touched
query UNBOUNDED expected re-check latency.  This tool replaces the uniform
draw with a staleness-weighted one: the untouched remainder is ordered by
rounds-since-last-driver-verification (oldest verdict first), ties broken
by the same deterministic md5("r{N}:" + name) key the uniform sample used,
and the first 20 become section (c) of ``_PRIORITY`` in
``quant_market_data_pipeline_spark/queries/__init__.py``.

Last-verified rounds are recomputed from the committed CORRECTNESS_r*.json
artifacts (a query's last verification = the highest round whose artifact
contains it), so the policy is auditable from the repo alone;
``tests/test_r9_infra.py`` re-derives the sample with this module and
pins the committed list against it.

Usage:
    python tools/staleness_sample.py <round_n> <touched.txt|-> [k]

``touched`` = newline-separated names already in sections (a)/(b) of the
window (excluded from the sample); ``-`` reads them from stdin.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _verdict_passed(entry) -> bool:
    """True iff a CORRECTNESS_r*.json entry records a PASSING check.

    Strict entries pass on ``hash_match: true``; rows-only entries (the
    driver's weaker check for non-SQL-expressible ops, recorded as
    ``err: "no_oracle"``) pass when the query ran and produced a row
    count.  A failed strict compare (hash/rows mismatch) or a real error
    must NOT reset the staleness clock — the query still needs
    re-confirmation (ADVICE r9).
    """
    if not isinstance(entry, dict):
        return False
    if entry.get("hash_match") is True:
        return True
    return entry.get("err") == "no_oracle" and entry.get("spark_rows") is not None


def last_verified_rounds(
    repo_root: str = _HERE, before_round: int | None = None
) -> dict[str, int]:
    """name -> highest round N whose CORRECTNESS_r{N}.json records a
    PASSING verdict for it (see _verdict_passed).

    ``before_round`` bounds the scan to rounds < N.  The round-N sample
    must be computed from the artifacts that EXISTED when round N
    started: without the bound, the driver writing CORRECTNESS_r{N}.json
    (which records the sampled queries' own verdicts) would change the
    recomputed sample and retroactively break the committed pin in
    tests/test_r9_infra.py.
    """
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if before_round is not None and n >= before_round:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(doc, dict):
            continue
        for name, entry in doc.items():
            if _verdict_passed(entry):
                out[name] = max(out.get(name, 0), n)
    return out


def staleness_sample(
    round_n: int,
    registry_names: list[str],
    touched: set[str],
    k: int = 20,
    repo_root: str = _HERE,
) -> list[str]:
    """The k-query re-confirmation sample: oldest last-verified round
    first (never-verified sorts oldest of all), md5("r{N}:"+name)
    tiebreak — deterministic given the artifacts of rounds < round_n
    (see last_verified_rounds: later artifacts must not move the pin)."""
    seen = last_verified_rounds(repo_root, before_round=round_n)

    def key(name: str):
        tie = hashlib.md5(f"r{round_n}:{name}".encode()).hexdigest()
        return (seen.get(name, -1), tie)

    pool = [n for n in registry_names if n not in touched]
    return sorted(pool, key=key)[:k]


def max_staleness(
    round_n: int, registry_names: list[str], repo_root: str = _HERE
) -> int:
    """Rounds since the least-recently-verified registered query was last
    driver-checked (for COVERAGE.md), as of round_n's start."""
    seen = last_verified_rounds(repo_root, before_round=round_n)
    return max(round_n - seen.get(n, 0) for n in registry_names)


def main() -> None:
    round_n = int(sys.argv[1])
    touched_src = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    if touched_src == "-":
        touched = {line.strip() for line in sys.stdin if line.strip()}
    else:
        with open(touched_src) as f:
            touched = {line.strip() for line in f if line.strip()}

    sys.path.insert(0, _HERE)
    from quant_market_data_pipeline_spark.queries import load_all

    names = list(load_all())
    sample = staleness_sample(round_n, names, touched, k)
    seen = last_verified_rounds()
    for n in sample:
        print(f"{n}  (last verified r{seen.get(n, 0)})")
    print(
        f"# max staleness across registry entering r{round_n}: "
        f"{max_staleness(round_n, names)} rounds",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

"""Post-regen source guard (round-9 judge stretch #8).

Round 9 shipped one engine-source commit AFTER the full local-strict
regeneration (9e08e3d) — harmless that time, but it violates the
end-of-round order (code -> regen -> commit) that makes the committed
CORRECTNESS_LOCAL_* artifacts a statement about the committed code.
This guard makes the slip structurally impossible: run it as the LAST
step before the end-of-round commit; it exits 1 if any non-test source
file is newer on disk than the newest CORRECTNESS_LOCAL_*.json.

Usage: python tools/regen_guard.py [repo_root]
"""

from __future__ import annotations

import glob
import os
import sys

# everything that defines engine behavior; tests and round notes are
# exempt (they don't change what the artifacts verified)
SOURCE_GLOBS = [
    "quant_market_data_pipeline_spark/**/*.py",
    "__spark_entry__.py",
    "bench.py",
]


def newest_artifact_mtime(root: str) -> float | None:
    arts = glob.glob(os.path.join(root, "CORRECTNESS_LOCAL_*.json"))
    return max((os.path.getmtime(p) for p in arts), default=None)


def stale_sources(root: str) -> list[str]:
    """Source files modified after the newest local-strict artifact."""
    cutoff = newest_artifact_mtime(root)
    if cutoff is None:
        return ["<no CORRECTNESS_LOCAL_*.json artifact found>"]
    out = []
    for pattern in SOURCE_GLOBS:
        for p in glob.glob(os.path.join(root, pattern), recursive=True):
            if "__pycache__" in p:
                continue
            if os.path.getmtime(p) > cutoff:
                out.append(os.path.relpath(p, root))
    return sorted(out)


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    stale = stale_sources(root)
    if stale:
        print(
            "REGEN GUARD: source files newer than the newest "
            "CORRECTNESS_LOCAL_*.json — re-run the local strict regen "
            "before committing:"
        )
        for p in stale:
            print(f"  {p}")
        return 1
    print("REGEN GUARD: ok — no source file newer than the local-strict artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())

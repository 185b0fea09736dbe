"""Plan-text inspection helpers shared by tests and tooling.

``DataFrame.queryExecution().executedPlan().toString()`` prints cached
relations (``InMemoryRelation``) together with their *cached child plan*
as inner children — a ``FileScan parquet`` line in that subtree describes
how the cache WAS built, not a scan the final plan executes.  Marker
counting (scan counts, exchange counts, join inventories) must therefore
strip those description-only subtrees first, or a persisted dimension
frame looks like N extra fact scans.
"""

from __future__ import annotations

import re


def _content_indent(line: str) -> int:
    """Column where the node's text starts, past tree-drawing chars.

    The whole-stage-codegen star is part of the node TEXT (``*(3)
    Project``), not of the tree drawing: including ``*`` in the prefix
    class made a codegen node at the same tree depth as an
    ``InMemoryRelation`` compute a content indent one column deeper, so
    it was wrongly stripped as part of the cached subtree and executed
    operators went under-counted in marker rows.
    """
    m = re.match(r"[\s:+\-]*", line)
    return m.end() if m else 0


def strip_cached_subtrees(plan: str) -> str:
    """Remove every ``InMemoryRelation`` inner-child subtree from a plan
    treeString, keeping the relation node line itself.

    Inner children print strictly deeper than their relation node, so the
    subtree is every following line whose content indent is greater than
    the relation line's — up to the first line back at or above it.
    """
    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in plan.splitlines():
        indent = _content_indent(line)
        if skip_deeper_than is not None:
            if line.strip() and indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_deeper_than = indent
    return "\n".join(out)


def executed_plan_str(df, stripped: bool = True) -> str:
    """The physical plan string, with cached-plan descriptions removed."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return strip_cached_subtrees(plan) if stripped else plan

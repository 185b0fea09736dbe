"""Hypothesis property tests for the round-9 operators.

Same strategy as tests/test_r8_props.py: adversarial small inputs are
written as the fixture tables, the REAL registered queries run through
Spark, and the results are compared against INDEPENDENT Python
replications of the math (Counter-based exact counts, a from-scratch
md5 Count-Min sketch, a from-scratch md5 Bloom filter, a sequential
GARCH recursion) — not against the operator's own code path.
max_examples stays small: every example pays a parquet write + Spark
job; hypothesis still finds the boundary shapes fixed fixtures miss
(single-token docs, all-member fact tables, constant price paths).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import types as T

_BASE = dt.datetime(2024, 6, 1)


def _md5_long(seed: int, value: str) -> int:
    """Python twin of llm/hashing.py seeded_md5_long (60-bit md5 prefix)."""
    return int(hashlib.md5(f"{seed}|{value}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# Count-Min: estimates must equal a from-scratch sketch, never undercount.
# ---------------------------------------------------------------------------
_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"]),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_countmin_matches_python_sketch(spark, tmp_path, docs):
    from collections import Counter

    from quant_market_data_pipeline_spark.queries.textprep import (
        _CMS_ROWS,
        _CMS_TOPK,
        _CMS_WIDTH,
        q_countmin_heavy_hitters,
    )

    rows = [(i, "s", " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, schema=_DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    # independent sketch: same md5 family, from scratch
    exact = Counter(w for words in docs for w in words)
    cms = [[0] * _CMS_WIDTH for _ in range(_CMS_ROWS)]
    for w, c in exact.items():
        for r in range(_CMS_ROWS):
            cms[r][_md5_long(r, w) % _CMS_WIDTH] += c

    got = q_countmin_heavy_hitters(spark, str(tmp_path)).collect()
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    assert {g.token for g in got} == {w for w, _ in top}
    for g in got:
        assert g.exact_count == exact[g.token]
        est = min(cms[r][_md5_long(r, g.token) % _CMS_WIDTH] for r in range(_CMS_ROWS))
        assert g.cms_estimate == est, g.token
        assert g.overestimate == est - exact[g.token] >= 0


# ---------------------------------------------------------------------------
# Bloom: verdict counts must equal a from-scratch filter; 0 false negatives.
# ---------------------------------------------------------------------------
_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
    ]
)
_SUPP_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_nationkey", T.LongType()),
    ]
)
_LI_SCHEMA = T.StructType([T.StructField("l_suppkey", T.LongType())])


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    member=st.sets(st.integers(1, 400), min_size=0, max_size=40),
    fact=st.lists(st.integers(1, 600), min_size=1, max_size=120),
)
def test_bloom_matches_python_filter(spark, tmp_path, member, fact):
    from quant_market_data_pipeline_spark.queries.relational import (
        _BF_BITS,
        _BF_K,
        q_bloom_filter_join_audit,
    )

    spark.createDataFrame(
        [(3, "NATION_3"), (4, "NATION_4")], schema=_NATION_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "nation.parquet")
    )
    # members in nation 3 (the query's filter), decoys in nation 4
    supp = [(k, 3) for k in sorted(member)] + [(1000 + k, 4) for k in range(3)]
    spark.createDataFrame(supp, schema=_SUPP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(k,) for k in fact], schema=_LI_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )

    bits = set()
    for k in member:
        for r in range(_BF_K):
            bits.add(_md5_long(r, str(k)) % _BF_BITS)

    def passes(k: int) -> bool:
        return all(
            _md5_long(r, str(k)) % _BF_BITS in bits for r in range(_BF_K)
        )

    row = q_bloom_filter_join_audit(spark, str(tmp_path)).collect()[0]
    n_member = sum(1 for k in fact if k in member)
    n_pass = sum(1 for k in fact if passes(k)) if member else 0
    assert row.n_rows == len(fact)
    assert row.n_member == n_member
    assert row.n_bloom_pass == n_pass
    assert row.n_false_neg == 0
    assert row.n_false_pos == n_pass - n_member
    assert row.fill_ratio == round(len(bits) / _BF_BITS, 6)


# ---------------------------------------------------------------------------
# GARCH: adversarial price paths (constant segments, jumps, single day)
# against the sequential recursion written from the math.
# ---------------------------------------------------------------------------
_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deltas=st.lists(
        st.integers(-40, 40), min_size=2, max_size=25
    )
)
def test_garch_matches_recursion_on_adversarial_paths(
    spark, tmp_path, deltas
):
    from quant_market_data_pipeline_spark.queries.execution import (
        _G_ALPHA,
        _G_BETA,
        _G_OMEGA,
        _G_V0,
        q_garch_11_vol,
    )

    rows, lp, days = [], 0.0, []
    for i, d in enumerate(deltas):
        lp += d / 100.0
        day = _BASE + dt.timedelta(days=i, hours=12)
        rows.append((i, day, 1, "click", math.exp(lp), None))
        days.append((day.date(), lp))
    spark.createDataFrame(rows, schema=_EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    got = {r.trading_day: r for r in q_garch_11_vol(spark, str(tmp_path)).collect()}
    # returns start at the second day; replicate through the identical
    # ln(exp(v)) round-trip the engine sees
    logs = [math.log(math.exp(lp_)) for _, lp_ in days]
    v, prev = None, None
    for i in range(1, len(days)):
        r = logs[i] - logs[i - 1]
        if v is None:
            v = _G_V0
        else:
            v = _G_OMEGA + _G_ALPHA * (prev * prev) + _G_BETA * v
        prev = r
        g = got[days[i][0]]
        assert abs(g.r - round(r, 6)) <= 1e-9
        assert abs(g.garch_vol - round(math.sqrt(v), 6)) <= 1e-9
    assert set(got) == {d for d, _ in days[1:]}

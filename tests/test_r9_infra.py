"""Round-9 infrastructure pins: staleness-weighted sampling, the
prev-ROUND bench comparison, and the reliable-checkpoint single-compute
guard."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _r9_registry_names():
    """The registry AS OF round 9: the live registry minus queries that
    first appear in round 10+ (no verification before round 10 and not
    in the r9 window).  Without this scope, every later round's NEW
    queries — never-verified, hence oldest-sorting — would retroactively
    displace entries from the recomputed r9 sample and break the pin."""
    import staleness_sample as ss

    from quant_market_data_pipeline_spark.queries import (
        _R9_NEW,
        _R9_SAMPLE,
        _R9_TOUCHED,
        load_all,
    )

    seen = ss.last_verified_rounds(REPO, before_round=10)
    r9_era = set(seen) | set(_R9_NEW) | set(_R9_TOUCHED) | set(_R9_SAMPLE)
    return [n for n in load_all() if n in r9_era]


def test_staleness_sample_policy_matches_committed_window():
    """Section (c) of _PRIORITY must equal the staleness-weighted sample
    recomputed from the committed CORRECTNESS_r*.json artifacts (oldest
    last-verified round first, md5('r9:'+name) tiebreak), with sections
    (a)+(b) excluded — the policy is auditable from the repo alone."""
    import staleness_sample as ss

    from quant_market_data_pipeline_spark.queries import (
        _R9_NEW,
        _R9_SAMPLE,
        _R9_TOUCHED,
    )

    names = _r9_registry_names()
    touched = set(_R9_NEW) | set(_R9_TOUCHED)
    expected = ss.staleness_sample(9, names, touched, k=20, repo_root=REPO)
    assert _R9_SAMPLE == expected


def test_staleness_sample_prefers_oldest_verification():
    """Every sampled query must be at least as stale as every unsampled,
    untouched registry entry (that is what 'weighted by rounds since
    last verification' means)."""
    import staleness_sample as ss

    from quant_market_data_pipeline_spark.queries import (
        _R9_NEW,
        _R9_SAMPLE,
        _R9_TOUCHED,
    )

    # before_round=9: the invariant is over the artifacts that existed
    # when the r9 sample was drawn — once the driver writes
    # CORRECTNESS_r09.json the sampled queries' unbounded last-verified
    # becomes 9 and the oldest-first assertion would invert (VERDICT r9
    # "What's wrong #1"; mirrors the bound on line 32's sibling test).
    seen = ss.last_verified_rounds(REPO, before_round=9)
    touched = set(_R9_NEW) | set(_R9_TOUCHED)
    sampled_max = max(seen.get(n, -1) for n in _R9_SAMPLE)
    rest = [
        n
        for n in _r9_registry_names()
        if n not in touched and n not in _R9_SAMPLE
    ]
    # oldest-first: nothing outside the sample is strictly staler than
    # the newest verdict inside it
    assert all(seen.get(n, -1) >= sampled_max for n in rest)


def test_previous_round_bench_matches_jsonl_twin(tmp_path):
    """_previous_round_bench must anchor on the newest BENCH_r{N}.json
    and pull per-query fingerprints from its bench_rounds.jsonl twin
    (matched by headline value + per-query medians)."""
    sys.path.insert(0, REPO)
    import bench

    parsed = {"value": 1.23, "queries": {"q1": 0.5, "q2": 0.7}}
    (tmp_path / "BENCH_r3.json").write_text(
        json.dumps({"n": 3, "parsed": parsed})
    )
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"n": 2, "parsed": {"value": 9.9, "queries": {"q1": 9.9}}})
    )
    rows = [
        # an older run of the same round — NOT the twin
        {"seq": 1, "value": 1.5, "queries": {"q1": 0.9, "q2": 0.6},
         "plan_fp": {"q1": "old"}, "plan_fp_version": 2,
         "docscale_queries": {"d1": 9.0}},
        # the twin: same value + queries as the committed artifact
        {"seq": 2, "value": 1.23, "queries": {"q1": 0.5, "q2": 0.7},
         "plan_fp": {"q1": "aaa", "q2": "bbb"}, "plan_fp_version": 2,
         "docscale_queries": {"d1": 2.5}, "tickscale_queries": {"t1": 1.0}},
    ]
    (tmp_path / "bench_rounds.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    fp, doc, tick, ver, n, src = bench._previous_round_bench(
        root=str(tmp_path)
    )
    assert n == 3
    assert fp == {"q1": "aaa", "q2": "bbb"}
    assert doc == {"d1": 2.5}
    assert tick == {"t1": 1.0}
    assert ver == 2
    # the full twin payload is the single pinned basis (r12)
    assert src["queries"] == {"q1": 0.5, "q2": 0.7}


def test_previous_round_bench_no_twin_falls_back_to_parsed(tmp_path):
    sys.path.insert(0, REPO)
    import bench

    parsed = {"value": 2.0, "queries": {"q1": 1.0}, "plan_fp_version": 1}
    (tmp_path / "BENCH_r5.json").write_text(
        json.dumps({"n": 5, "parsed": parsed})
    )
    fp, doc, tick, ver, n, src = bench._previous_round_bench(
        root=str(tmp_path)
    )
    assert n == 5
    assert fp == {} and doc == {} and tick == {}
    assert ver == 1
    assert src["queries"] == {"q1": 1.0}


def test_plan_fp_v3_does_not_collapse_user_col_names():
    """v3 must leave a literal user column named col_1/x_2 alone (the
    ADVICE r8 false-negative class) while still collapsing analyzer
    lambda variables and CSE slots — exercised through bench's REAL
    normalizer, not an inline copy of the regex."""
    sys.path.insert(0, REPO)
    import bench

    s = "Project [col_1#12, x_2#13, lambda x_46#99, _common_expr_3#14]"
    out = bench._normalize_plan_str(s, version=3)
    assert "col_1#x" in out and "x_2#x" in out  # user columns preserved
    assert "lambda x_n#x" in out and "_common_expr_n#x" in out
    # the v2 formula (kept for old-artifact comparison) still collapses
    # them — the difference IS the regression v3 fixed
    out2 = bench._normalize_plan_str(s, version=2)
    assert "col_n#x" in out2 and "x_n#x" in out2


def test_materialize_corpus_reliable_path_single_compute(tmp_path):
    """With a checkpoint dir configured, materialize_corpus must (a)
    checkpoint reliably (files under the dir, plan truncated), (b) run
    the upstream exactly ONCE (the persist-before-checkpoint guard), and
    (c) leave no lingering cache entry.  Runs in a subprocess: setting a
    checkpoint dir on the shared test session would silently flip every
    later materialize_corpus call onto the reliable path."""
    script = f"""
import os, sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from quant_market_data_pipeline_spark.session import get_spark, materialize_corpus

spark = get_spark(app_name="ckpt_test", master="local[2]")
spark.sparkContext.setLogLevel("ERROR")
ckdir = {str(tmp_path / "ck")!r}
spark.sparkContext.setCheckpointDir(ckdir)

acc = spark.sparkContext.accumulator(0)

def bump(it):
    for row in it:
        acc.add(1)
        yield row

base = spark.range(0, 1000, 1, 4)
# explicit schema: toDF() would run a schema-inference sampling job,
# polluting the execution count
counted = spark.createDataFrame(
    base.rdd.mapPartitions(bump), schema="id bigint"
)
out = materialize_corpus(counted.withColumn("y", F.col("id") * 2))
n = out.count()
assert n == 1000, n
# single compute: the accumulator saw each row exactly once even though
# checkpoint() writes in a separate job (the persist guard feeds it)
assert acc.value == 1000, f"upstream saw {{acc.value}} rows (want 1000)"
# reliably checkpointed: files exist under the configured dir
found = any(files for _, _, files in os.walk(ckdir))
assert found, "no checkpoint files written"
# the guard unpersisted its temporary cache (unpersist is async;
# the registry entry itself is removed synchronously, but poll a few
# seconds to stay robust to executor-side lag)
import time
for _ in range(10):
    if spark.sparkContext._jsc.getPersistentRDDs().isEmpty():
        break
    time.sleep(0.5)
assert spark.sparkContext._jsc.getPersistentRDDs().isEmpty(), "cache leaked"
print("SUBPROCESS_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SUBPROCESS_OK" in r.stdout, r.stdout + r.stderr

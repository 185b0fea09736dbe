"""Round-14 property tests.

Lloyd round-6 boundary-margin canary (ADVICE r13): cross-engine parity
of pq_train_codebooks rests on round(x, 6) collapsing DuckDB-vs-Spark
summation-order drift, and the 5-iteration recursion amplifies any
boundary flip.  The margins are ORDER STATISTICS, not designed — every
rounded quantity's distance to its nearest 0.5e-6 boundary is a uniform
draw — so the honest contract is measured headroom per quantity class,
against that class's worst-case reordering drift:

  d2 (16-term fold, both engines sum the same 16 elements):
      drift <= 16*eps*|sum| ~ 5.7e-16 abs = 5.7e-10 boundary-units.
      Measured min margin across the three SF fixtures: 3.4e-7.
  means (up to 1024 members, partial-agg order differs between
      engines): drift <= n*eps*|x| ~ 2e-14 abs = 2e-8 boundary-units.
      Measured min margin: 1.2e-5.

This test recomputes every rounded quantity with the independent numpy
twin (UNROUNDED) and asserts >=100x the class drift bound.  If a future
fixture regeneration lands any quantity inside the bound, THIS test
flags it before the strict oracle ever flakes — the documented response
is to widen the trained-codebook tolerance contract (drift-retry), not
to chase a phantom engine bug.

Constants are the published construction, never production imports
(the r10 HLL lesson).
"""

from __future__ import annotations

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = [
    f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
]

_M, _SUB, _K, _ITERS, _TRAIN_N = 4, 16, 16, 5, 1024
# 100x the per-class worst-case cross-engine reordering drift, in
# boundary units (1e-6 absolute = 1 unit; boundary sits at 0.5)
_D2_MARGIN_FLOOR = 5e-8
_MEAN_MARGIN_FLOOR = 2e-6


def _load_emb(sf_dir: str) -> np.ndarray:
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _min_margin(x: np.ndarray) -> float:
    """Distance of x*1e6 to its nearest .5 rounding boundary (units of
    1e-6): the quantity summation-order drift would have to cross to
    flip round(x, 6) between engines."""
    frac = np.abs(np.mod(x * 1e6, 1.0) - 0.5)
    return float(frac.min()) if frac.size else 1.0


def _twin_margins(emb: np.ndarray) -> tuple[float, float]:
    """(min d2 margin, min mean margin) over every rounded quantity in
    the Lloyd recursion: assignment d2 for ALL candidate cells (a flip
    of any candidate's rounded d2 can flip the argmin tiebreak) and the
    per-dimension member means, at every iteration."""
    sub = emb.reshape(len(emb), _M, _SUB)
    t = sub[:_TRAIN_N]
    cb = sub[:_K].transpose(1, 0, 2).copy()
    m_d2, m_mean = 1.0, 1.0
    for _ in range(_ITERS):
        for m in range(_M):
            raw_d2 = ((t[:, m, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
            m_d2 = min(m_d2, _min_margin(raw_d2))
            a = np.round(raw_d2, 6).argmin(1)
            for c in range(_K):
                members = t[a == c, m]
                if len(members):
                    mu = members.mean(0)
                    m_mean = min(m_mean, _min_margin(mu))
                    cb[m][c] = np.round(mu, 6)
    return m_d2, m_mean


def test_lloyd_round6_boundary_margin_canary():
    checked = 0
    for sf_dir in SF_DIRS:
        if not os.path.isdir(sf_dir):
            continue
        checked += 1
        m_d2, m_mean = _twin_margins(_load_emb(sf_dir))
        assert m_d2 > _D2_MARGIN_FLOOR, (
            f"{sf_dir}: a Lloyd assignment distance sits {m_d2:.2e} "
            "boundary-units from a round(x,6) flip — within 100x of "
            "fold-reordering drift; widen the trained-codebook "
            "tolerance contract before trusting strict parity"
        )
        assert m_mean > _MEAN_MARGIN_FLOOR, (
            f"{sf_dir}: a Lloyd centroid mean sits {m_mean:.2e} "
            "boundary-units from a round(x,6) flip — within 100x of "
            "partial-agg reordering drift; widen the trained-codebook "
            "tolerance contract before trusting strict parity"
        )
    assert checked, "no SF fixtures found"


# --- r14: trained coarse quantizer, OPQ rotation, streamed encoder --------
_CLUSTERED = os.path.join(REPO, ".bench_scale", "clustered")


def _coarse_twin_train(
    emb: np.ndarray, n_cells: int, iters: int = 5
) -> np.ndarray:
    """Independent numpy Lloyd twin at the 64-dim coarse level: the
    published construction (round-6 L2 argmin, lower-ccid tiebreak,
    round-6 means, empty-keeps-prev, first-greatest(1024, 32*n_cells)
    -by-id training slice), never production imports."""
    train_n = max(1024, 32 * n_cells)
    t = emb[:train_n]
    cb = emb[:n_cells].copy()
    for _ in range(iters):
        d2 = np.round(
            ((t[:, None, :] - cb[None, :, :]) ** 2).sum(-1), 6
        )
        a = d2.argmin(1)  # first minimum == lower ccid wins ties
        for c in range(n_cells):
            members = t[a == c]
            if len(members):
                cb[c] = np.round(members.mean(0), 6)
    return cb


def _n_cells(n: int) -> int:
    import math

    c = math.isqrt(n)
    return max(32, c if c * c == n else c + 1)


def test_ivf_train_centroids_matches_numpy_twin(spark):
    from quant_market_data_pipeline_spark.llm.similarity import (
        ivf_train_centroids,
    )
    from quant_market_data_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.01"
    emb = _load_emb(sf_dir)
    k = _n_cells(len(emb))
    want = _coarse_twin_train(emb, k)
    got_rows = (
        ivf_train_centroids(
            load_table(spark, "embeddings", sf_dir), k, vec_col="embedding"
        )
        .orderBy("ccid")
        .collect()
    )
    got = np.array([r["ccv"] for r in got_rows])
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12)


def test_trained_coarse_balance_and_distortion_on_clustered_fixture():
    """Judge directive #2's done-criterion, as MEASURED: on the
    planted-mixture fixture Lloyd training's big win is coarse
    DISTORTION (what recall routes through), while a MAX-population
    statistic barely moves under vanilla Lloyd — the decisive skew
    reduction comes from the capped-overflow assignment (within-cell
    (cd2, vec_id) rank; overflow past cap=ceil(2n/k) hops to its
    second-nearest cell).  Pure numpy twin (no Spark), mirroring the
    audit's three skew columns."""
    import math

    import duckdb

    if not os.path.isdir(_CLUSTERED):
        import subprocess
        import sys as _sys

        subprocess.run(
            [_sys.executable, os.path.join(REPO, "tools", "gen_clustered.py")],
            check=True,
        )
    rows = duckdb.sql(
        f"SELECT embedding FROM '{_CLUSTERED}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    emb = np.array([r[0] for r in rows], dtype=np.float64)
    n = len(emb)
    k = _n_cells(n)

    def assign_stats(cents: np.ndarray):
        d2 = np.round(((emb[:, None, :] - cents[None, :, :]) ** 2).sum(-1), 6)
        a = d2.argmin(1)
        pops = np.bincount(a, minlength=k)
        return d2, a, pops.max() * k / n, d2.min(1).mean()

    _, _, s_id, err_id = assign_stats(emb[:k])
    cb = _coarse_twin_train(emb, k)
    d2, a1, s_tr, err_tr = assign_stats(cb)
    # training must cut coarse distortion decisively and not worsen the
    # max-cell skew (at the 32/cell slice; the 8/cell slice DID worsen
    # it — the measured lesson behind ivf_train_slice_n)
    assert err_tr < 0.5 * err_id, (err_id, err_tr)
    assert s_tr < s_id, (s_id, s_tr)
    # capped one-hop overflow: the index's actual bound
    cap = math.ceil(2.0 * n / k)
    d2b = d2.copy()
    d2b[np.arange(n), a1] = np.inf
    a2 = d2b.argmin(1)
    final = a1.copy()
    pops = np.bincount(a1, minlength=k)
    for c in np.where(pops > cap)[0]:
        idx = np.where(a1 == c)[0]
        srt = idx[np.lexsort((idx, d2[idx, c]))]
        final[srt[cap:]] = a2[srt[cap:]]
    s_cap = np.bincount(final, minlength=k).max() * k / n
    assert s_cap < 0.67 * s_id, (s_id, s_cap)


def test_opq_rotation_matrix_twin_and_isometry():
    """Independent reimplementation of the published construction
    (md5-derived base, Gram-Schmidt, round-6 snap) + distance
    preservation to well below quantization noise."""
    import hashlib

    from quant_market_data_pipeline_spark.llm.similarity import (
        opq_rotation_matrix,
    )

    dim = 64
    base = np.array(
        [
            [
                (int(hashlib.md5(f"opq|{i}|{j}".encode()).hexdigest()[:15], 16)
                 % 2001 - 1000) / 1000.0
                for j in range(dim)
            ]
            for i in range(dim)
        ]
    )
    q = []
    for i in range(dim):
        v = base[i].copy()
        for u in q:
            v = v - float(np.dot(v, u)) * u
        q.append(v / float(np.sqrt(np.dot(v, v))))
    want = np.round(np.array(q), 6)
    got = np.array(opq_rotation_matrix())
    assert np.allclose(got, want, atol=2e-6)
    # near-orthonormality after the round-6 snap
    g = got @ got.T
    assert np.abs(g - np.eye(dim)).max() < 5e-5
    # isometry on fixture vectors: rotated pairwise distance within
    # 1e-3 of raw (quantization noise on these corpora is >= 0.05)
    emb = _load_emb("/root/testdata/sf0.01")[:50]
    r = emb @ got.T
    d_raw = ((emb[:10, None] - emb[None, :10]) ** 2).sum(-1)
    d_rot = ((r[:10, None] - r[None, :10]) ** 2).sum(-1)
    assert np.abs(d_raw - d_rot).max() < 1e-3


def test_sq8_stream_batch_share_one_encoder():
    """The streamed vector index and the batch SQ8 audit must encode
    through the SAME fragments (the drift-apart guard): source pin on
    both engines' definitions."""
    sim = open(
        os.path.join(
            REPO, "quant_market_data_pipeline_spark", "llm", "similarity.py"
        )
    ).read()
    llm = open(
        os.path.join(
            REPO, "quant_market_data_pipeline_spark", "queries", "llm.py"
        )
    ).read()
    stream = open(
        os.path.join(
            REPO,
            "quant_market_data_pipeline_spark",
            "queries",
            "streaming_e2e.py",
        )
    ).read()
    # one Spark-side encode definition, used by both callers
    assert sim.count("def sq8_codes(") == 1
    assert "sq8_codes" in llm and "sq8_codes" in stream
    # one SQL-side encode fragment, interpolated by both oracles
    assert llm.count('SQ8_CODES_CTE = """') == 1
    assert "SQ8_CODES_CTE" in stream

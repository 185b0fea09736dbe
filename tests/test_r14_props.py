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

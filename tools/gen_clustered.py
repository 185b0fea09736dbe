"""Generate the CLUSTERED embedding fixture: a planted Gaussian mixture.

Round-14 judge directive #1: every quantization-menu price (flat PQ,
k-means-trained PQ, residual PQ/IVFADC, SQ8) was measured on corpora
whose pairwise-distance contrast, not the encoder, is the binding
constraint — the driver fixtures are near-uniform and the grown-sf1
"clusters" overlap (centroid sigma 0.12 vs noise sigma 0.10, between-
vs within-cluster distance 1.36 vs 1.13).  Two claims were therefore
unmeasured: "residual PQ wins on clustered corpora" (fcd3373) and
"ADC-only failure is contrast, not encoder".

This fixture makes them measurable: n = 20,000 (SAME n as sf1.0_grown,
so uniform-vs-clustered is a same-scale comparison), 64-dim, 16
planted Gaussian clusters with

  - IMBALANCED populations, p_c proportional to 1/(c+1) (largest
    cluster ~29%, smallest ~1.8%) — realistic skew, and the premise
    the IVF cell-balance audit needs (an id-sliced coarse quantizer
    is arbitrarily unbalanced exactly on data like this);
  - centroid components N(0, 0.35) -> expected between-centroid
    distance ~3.96;
  - member noise N(0, 0.05)        -> within-cluster pair distance
    ~0.57 (separation ratio ~7x: strongly clustered, the regime the
    encoder — not distance contrast — decides recall in).

All non-embedding tables are byte-copied from the driver's sf0.1
fixture so every registered query and oracle runs unchanged:

    python tools/gen_clustered.py        # writes .bench_scale/clustered
    python tools/check_oracle.py --strict .bench_scale/clustered [query..]

The fixture lives under .bench_scale/ (gitignored); this script IS the
committed artifact — seed 42, byte-for-byte reproducible.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench_scale", "clustered")
SRC = "/root/testdata/sf0.1"

N_EMB = 20_000
N_CLUSTERS = 16
DIM = 64
CENTROID_SIGMA = 0.35
NOISE_SIGMA = 0.05

_COPY_TABLES = (
    "region nation customer supplier part orders lineitem events documents"
).split()


def main() -> None:
    rng = np.random.default_rng(42)
    os.makedirs(OUT, exist_ok=True)

    for t in _COPY_TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        shutil.copyfile(src, dst)

    # Zipf-ish imbalanced cluster populations: p_c ~ 1/(c+1)
    w = 1.0 / (np.arange(N_CLUSTERS) + 1.0)
    p = w / w.sum()
    labels = rng.choice(N_CLUSTERS, N_EMB, p=p).astype(np.int32)
    cents = rng.normal(0.0, CENTROID_SIGMA, (N_CLUSTERS, DIM))
    emb = (
        cents[labels] + rng.normal(0.0, NOISE_SIGMA, (N_EMB, DIM))
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_EMB), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(OUT, "embeddings.parquet"),
        compression="snappy",
    )

    pops = np.bincount(labels, minlength=N_CLUSTERS)
    with open(os.path.join(OUT, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "seed": 42,
                "generator": "tools/gen_clustered.py",
                "n_emb": N_EMB,
                "n_clusters": N_CLUSTERS,
                "centroid_sigma": CENTROID_SIGMA,
                "noise_sigma": NOISE_SIGMA,
                "cluster_pops": [int(x) for x in pops],
                "copied_from": SRC,
            },
            f,
            indent=1,
        )
    print(
        f"done: {OUT} (n={N_EMB}, clusters={N_CLUSTERS}, "
        f"pops {pops.max()}..{pops.min()})"
    )


if __name__ == "__main__":
    sys.exit(main())

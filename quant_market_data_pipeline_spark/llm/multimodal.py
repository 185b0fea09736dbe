"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata map
(schemas.MEDIA_SCHEMA).  The Spark-side machinery — schema, Arrow batch
transfer, ``mapInPandas`` signature, partition-preserving feature
extraction — is real and tested; the *codec* itself is pluggable:

- with a real decoder installed (PIL / torchaudio / pyav), plug it into
  ``decode_fn``;
- in this container no media libraries exist, so the default is a
  clearly-marked deterministic fake deriving pseudo-dimensions from the
  payload's sha256 (same formula as the DuckDB oracle, so even the UDF
  path is correctness-gated end to end).

Scale notes: ``mapInPandas`` streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
blob sizes; feature extraction is embarrassingly parallel and preserves
partitioning (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def real_decode_stub(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Placeholder for a real codec (PIL/pyav); not available here.

    Raises NotImplementedError by design — the container ships no media
    libraries.  Deployments override ``decode_fn`` in
    ``extract_media_features``.
    """
    raise NotImplementedError(
        "real media decoding requires PIL/pyav; inject decode_fn"
    )


def fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic fake decoder: pseudo-dimensions from the sha256.

    width  = 64 + ascii(first hex char)
    height = 64 + ascii(second hex char)
    frames = (n_bytes % 7) + 1
    Mirrors the DuckDB oracle in queries/llm.py exactly.
    """
    h = hashlib.sha256(payload).hexdigest()
    return 64 + ord(h[0]), 64 + ord(h[1]), (len(payload) % 7) + 1


def extract_media_features(media: DataFrame, decode_fn=fake_decode) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each input record batch arrives as a pandas DataFrame;
    output batches follow FEATURE_SCHEMA.  One narrow stage — partitioning
    preserved, no shuffle.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_fn(p, k) for p, k in zip(payloads, pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text
    bytes stand in for an image payload (schema-faithful test corpus)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.col("source")).alias("meta"),
    )

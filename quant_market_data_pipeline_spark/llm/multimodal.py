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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 2, decode_fn=fake_decode
) -> DataFrame:
    """Frame sampling: one output row per kept frame (idx 0, every_n, ...).

    mapInPandas is a flat-map over Arrow batches — the output cardinality
    is decoupled from the input (a 2-hour video expands to thousands of
    rows without ever materializing all frames in one buffer).  The fake
    'decoder' derives the frame count from the payload and each frame's
    bytes as sha256(payload + b'#' + idx) — deterministic, oracle-matched.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, payload, kind in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                n_frames = decode_fn(payload, kind)[2]
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            bytes(payload) + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": shas}
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_plan(media_features: DataFrame, max_dim: int = 128) -> DataFrame:
    """Aspect-preserving resize dimensions (the metadata half of a resize;
    the pixel half needs a real codec).  Pure JVM column math — the
    planning stage a real resize UDF would consume."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media_features.withColumn(
        "resized_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn(
        "resized_height", F.ceil(F.col("height") * scale).cast("int")
    )

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
import struct
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
    """Placeholder for a full codec stack (PIL/pyav); not available here.

    Raises NotImplementedError by design — the container ships no media
    libraries.  NOTE: plain BMP and WAV containers DO decode in-container
    via ``stdlib_decode`` (the default); this stub is only the seam for
    compressed formats (JPEG/PNG/MP4/...).
    """
    raise NotImplementedError(
        "compressed media decoding requires PIL/pyav; inject decode_fn"
    )


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """A real, valid 24-bpp BMP file (BITMAPFILEHEADER + BITMAPINFOHEADER
    + bottom-up pixel rows padded to 4 bytes), deterministic in ``seed``.

    Used to synthesize a decodable test corpus; any standard image viewer
    opens the output.  Intended for small test dims (pixel generation is
    a Python loop)."""
    row = ((width * 3 + 3) // 4) * 4
    pixel_bytes = row * height
    header = b"BM" + struct.pack("<IHHI", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    px = bytes((seed * 31 + i) % 256 for i in range(pixel_bytes))
    return header + info + px


def encode_wav(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """A real, valid RIFF/WAVE file: canonical 44-byte header + 16-bit
    PCM mono samples, deterministic in ``seed``."""
    data = struct.pack(
        f"<{n_samples}h",
        *[((seed * 7 + i * 13) % 2048) - 1024 for i in range(n_samples)],
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + b"data" + struct.pack("<I", len(data))
        + data
    )


def stdlib_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Pure-stdlib container decoder — the DEFAULT codec, so the decode
    branch genuinely executes in-container (no media libraries needed):

    - BMP (``BM`` magic + file-size field matching the payload):
      (width, height, 1) parsed from the BITMAPINFOHEADER;
    - WAV (``RIFF..WAVE``): the audio analogue
      (sample_rate, n_channels, n_samples) via a proper chunk walk
      (handles extra chunks + odd-size padding, not just canonical
      44-byte files);
    - anything else falls back to :func:`fake_decode`, keeping the
      text-payload fixtures and their oracles byte-stable.

    Compressed formats (JPEG/MP4) still require injecting a real codec
    via ``decode_fn`` (see :func:`real_decode_stub`).
    """
    b = bytes(payload)
    if (
        len(b) >= 54
        and b[:2] == b"BM"
        and struct.unpack_from("<I", b, 2)[0] == len(b)
    ):
        width, height = struct.unpack_from("<ii", b, 18)
        return int(width), abs(int(height)), 1
    if len(b) >= 44 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos, rate, channels, bits, n_samples = 12, 0, 0, 0, 0
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            csz = struct.unpack_from("<I", b, pos + 4)[0]
            if cid == b"fmt " and pos + 24 <= len(b):
                _, channels, rate = struct.unpack_from("<HHI", b, pos + 8)
                bits = struct.unpack_from("<H", b, pos + 22)[0]
            elif cid == b"data" and channels and bits >= 8:
                # bits >= 8 guards the divisor: sub-byte encodings
                # (4-bit IMA ADPCM) would otherwise make it zero in the
                # executor UDF; those report n_samples = 0 (unknown)
                n_samples = csz // (channels * (bits // 8))
            pos += 8 + csz + (csz & 1)  # chunks are word-aligned
        return int(rate), int(channels), int(n_samples)
    return fake_decode(b, kind)


def fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic fake decoder: pseudo-dimensions from the sha256.

    width  = 64 + ascii(first hex char)
    height = 64 + ascii(second hex char)
    frames = (n_bytes % 7) + 1
    Mirrors the DuckDB oracle in queries/llm.py exactly.
    """
    h = hashlib.sha256(payload).hexdigest()
    return 64 + ord(h[0]), 64 + ord(h[1]), (len(payload) % 7) + 1


def synthetic_codec_media(docs: DataFrame) -> DataFrame:
    """A decodable media table generated DISTRIBUTIVELY from doc ids:
    even ids become real BMP images (dims = f(id)), odd ids real WAV
    audio (rate/samples = f(id)).  mapInPandas — blob generation scales
    out with the id table, no driver-side materialization."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, payloads = [], []
            for raw in pdf["doc_id"]:
                i = int(raw)
                if i % 2 == 0:
                    kinds.append("image")
                    payloads.append(encode_bmp(1 + i % 64, 1 + i % 48, i))
                else:
                    kinds.append("audio")
                    payloads.append(
                        encode_wav(100 + i % 50, 8000 + (i % 8) * 1000, i)
                    )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "kind": kinds, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(gen, schema)


def extract_media_features(media: DataFrame, decode_fn=stdlib_decode) -> DataFrame:
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


_FRAME_FLUSH_ROWS = 1 << 16


def sample_frames(
    media: DataFrame, every_n: int = 2, decode_fn=stdlib_decode
) -> DataFrame:
    """Frame sampling: one output row per kept frame (idx 0, every_n, ...).

    mapInPandas is a flat-map over Arrow batches — the output cardinality
    is decoupled from the input (a 2-hour video expands to thousands of
    rows without ever materializing all frames in one buffer).  Output
    accumulates at most ``_FRAME_FLUSH_ROWS`` rows before yielding a
    batch downstream: with ``stdlib_decode`` a real WAV's frame count is
    its full sample count (44.1 kHz x minutes = millions of frames per
    blob), so flushing per input batch instead of per N rows would hold
    the whole expansion in Python lists.  The fake 'decoder' derives the
    frame count from the payload and each frame's bytes as
    sha256(payload + b'#' + idx) — deterministic, oracle-matched.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list = []
        idxs: list = []
        shas: list = []
        for pdf in batches:
            for mid, payload, kind in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                n_frames = decode_fn(payload, kind)[2]
                pb = bytes(payload)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            pb + b"#" + str(i).encode()
                        ).hexdigest()
                    )
                    if len(ids) >= _FRAME_FLUSH_ROWS:
                        yield pd.DataFrame(
                            {
                                "media_id": ids,
                                "frame_idx": idxs,
                                "frame_sha256": shas,
                            }
                        )
                        ids, idxs, shas = [], [], []
        if ids:
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

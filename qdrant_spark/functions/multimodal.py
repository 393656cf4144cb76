"""Multimodal columns: images / audio / video as opaque binary + metadata.

The reference accepts ``Document`` / ``Image`` / ``InferenceObject`` inputs
wherever a vector is expected (lib/api/src/rest/schema.rs:345-396,
VectorInput:559-567) and delegates embedding to an external inference
service. For a training-data pipeline the engine-side responsibilities are:

- schema: ``binary`` payload column + typed metadata struct
  (media_schema) so Parquet stores blobs columnar and prunes metadata;
- partition-safe batch plumbing: decode / feature-extract / resize /
  frame-sample run as Arrow-batched ``mapInPandas`` stages, blob bytes
  never hit the driver;
- codecs: REAL dependency-free WAV (RIFF/PCM16) and PPM (P6) decoders
  live in :mod:`qdrant_spark.functions.codecs` and plug in via the same
  ``decode_fn`` / ``resize_fn`` hooks used for Pillow/ffmpeg in a full
  deployment; the md5-fake below remains only as a default for formats
  this container cannot decode.

At 100 TB: blobs dominate storage — keep them in their own column family
(separate parquet files via column projection), partition by content hash
prefix for balanced shuffle-free dedup, and let Catalyst prune the blob
column whenever a query touches only metadata.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def media_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    """Canonical multimodal table: (id, blob, meta)."""
    return T.StructType(
        [
            T.StructField("id", id_type, False),
            T.StructField("blob", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )


def content_hash(blob_col: Column | str) -> Column:
    """md5 of the raw bytes — exact-dedup / partition key for blobs."""
    c = F.col(blob_col) if isinstance(blob_col, str) else blob_col
    return F.md5(c)


def blob_size(blob_col: Column | str) -> Column:
    c = F.col(blob_col) if isinstance(blob_col, str) else blob_col
    return F.length(c)


def fake_decode(blob: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: md5-seeded
    pseudo-features in [0, 1). Lets the full pipeline (schema, batching,
    partitioning) run and be asserted on without codec libraries."""
    out = []
    h = blob or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(d[:4], "big") / 2**32)
    return out


def real_decode(blob: bytes, meta: dict | None = None):  # pragma: no cover
    """Plug point for an actual decoder (Pillow / torchaudio / ffmpeg)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; pass decode_fn="
        "your_decoder to extract_features / frame_sample"
    )


def extract_features(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "id",
    dim: int = 16,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int | None = None,
    feature_type: T.DataType | None = None,
) -> DataFrame:
    """(id, embedding array<float>) via Arrow-batched mapInPandas.

    The UDF sees only (id, blob) — metadata and other payload stay JVM-side
    and re-join by id, so the Python boundary moves the minimum bytes.
    ``feature_type`` overrides the element type (float32 default is right
    for embeddings; pass DoubleType for exact decoded statistics)."""
    fn = decode_fn or (lambda b: fake_decode(b, dim))
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(
                "embedding", T.ArrayType(feature_type or T.FloatType())
            ),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fn(b) if b is not None else None for b in pdf[blob_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": feats})

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def resize_media(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "id",
    width: int = 64,
    height: int = 64,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """(id, blob, width, height) with the blob re-encoded to the target
    size — image-resize plumbing with the codec stubbed (this container
    has no image libraries; swap ``resize_fn`` for a PIL/opencv call in a
    real deployment). The deterministic fake derives exactly
    ``width*height`` bytes from the input via md5 expansion, so tests can
    assert sizes and idempotence without a codec."""

    def fake_resize(blob: bytes, w: int, h: int) -> bytes:
        blob = blob or b""
        out = bytearray()
        i = 0
        while len(out) < w * h:
            out.extend(hashlib.md5(blob + bytes([i % 256])).digest())
            i += 1
        return bytes(out[: w * h])

    fn = resize_fn or fake_resize
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("blob", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = [fn(b, width, height) if b is not None else None
                     for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "blob": blobs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "id",
    every_ms: int = 1000,
    decode_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video -> (id, frame_idx, frame_blob) rows; one input row explodes to
    its sampled frames. Stub decoder emits md5-derived frame markers."""

    def fake_frames(blob: bytes, n_hint: int) -> list[bytes]:
        n = (len(blob or b"") % 4) + 1
        return [hashlib.md5((blob or b"") + bytes([i])).digest() for i in range(n)]

    fn = decode_fn or fake_frames
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_blob", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                for i, fr in enumerate(fn(blob, every_ms)):
                    ids.append(rid)
                    idxs.append(i)
                    blobs.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_blob": blobs})

    return df.select(id_col, blob_col).mapInPandas(run, schema)

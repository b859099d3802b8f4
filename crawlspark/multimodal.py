"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec calls are STUBBED because the
container ships no image/audio libraries. Each decoder tries the real library
first and otherwise produces a clearly-marked deterministic fake derived from
the payload bytes — so plans, schemas and tests are exercised end-to-end and a
real deployment only swaps the inner function.

Design for 100 TB: payloads stay binary end-to-end (no base64 blowup); work
is ``mapInPandas`` over Arrow batches so each task decodes a columnar chunk;
feature outputs are fixed-width arrays to keep downstream joins/aggregations
vectorized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decoder", StringType()),  # 'real' | 'stub'
    ]
)


def _stub_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from payload bytes (no randomness)."""
    arr = np.frombuffer(blob[: dim * 8].ljust(dim * 8, b"\0"), dtype=np.uint8)
    return (arr.reshape(dim, -1).mean(axis=1) / 255.0).astype(np.float32).tolist()


def decode_image_features(df: DataFrame, payload_col: str = "payload", dim: int = 8) -> DataFrame:
    """(doc_id, payload binary) → IMAGE_META rows.

    Real path uses PIL if importable; otherwise the deterministic stub
    (decoder='stub'). The Spark plumbing is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io

            def decode(blob: bytes):
                im = Image.open(io.BytesIO(blob))
                feats = (
                    np.asarray(im.convert("L").resize((dim, 1))).astype(np.float32) / 255.0
                ).ravel().tolist()
                return im.width, im.height, im.mode, feats, "real"

        except ImportError:

            def decode(blob: bytes):
                # STUB: container has no codec libs; deterministic fake
                w = 1 + blob[0] % 64 if blob else 1
                h = 1 + blob[-1] % 64 if blob else 1
                return w, h, "STUB", _stub_features(blob, dim), "stub"

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(blob) if blob is not None else b""
                w, h, mode, feats, dec = decode(b)
                out.append(
                    dict(doc_id=int(doc_id), width=w, height=h, mode=mode,
                         n_bytes=len(b), features=feats, decoder=dec)
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META.fields])

    return df.select("doc_id", payload_col).mapInPandas(run, schema=IMAGE_META)


def frame_sample(df: DataFrame, payload_col: str = "payload", every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled 'frame'. The frame
    splitter is the stub (fixed 4-'frame' chunking of the payload); a real
    deployment swaps in pyav/ffmpeg inside the same mapInPandas."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_index", IntegerType()),
            StructField("frame_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(blob) if blob is not None else b""
                n_frames = max(1, len(b) // 16)
                for fi in range(0, n_frames, every_n):
                    chunk = b[fi * 16: (fi + 1) * 16]
                    out.append(dict(doc_id=int(doc_id), frame_index=fi, frame_bytes=len(chunk)))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.select("doc_id", payload_col).mapInPandas(run, schema=schema)


def documents_as_binary(documents: DataFrame) -> DataFrame:
    """Adapter for tests/queries: treat document text bytes as an opaque
    payload column (the testdata ships no real media blobs)."""
    return documents.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

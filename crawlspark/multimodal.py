"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The image path has a REAL decode branch: a
pure-stdlib PNG codec (zlib inflate + per-spec unfiltering — the container
ships no PIL/codec libs, but PNG's format is fully decodable with stdlib
zlib), tried after PIL; payloads that are neither PIL-decodable nor PNG fall
back to a clearly-marked deterministic stub derived only from the payload
LENGTH (bytes-defined, so the oracle needs no text/encoding assumptions).

Design for 100 TB: payloads stay binary end-to-end (no base64 blowup); work
is ``mapInPandas`` over Arrow batches so each task decodes a columnar chunk;
feature outputs are fixed-width arrays to keep downstream joins/aggregations
vectorized.
"""

from __future__ import annotations

import struct
import zlib
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


# ---------------------------------------------------------------------------
# pure-stdlib PNG codec (public spec: RFC 2083 / W3C PNG)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA (8-bit, non-interlaced)


def png_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw pixel bytes row-major) from a PNG.

    Supports 8-bit gray/RGB/RGBA, non-interlaced, all five scanline filters —
    enough to decode any PNG this module's encoder (or a standard encoder in
    those modes) produces. Raises ValueError on anything else; callers treat
    that as "not a PNG" and fall back to the stub.
    """
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, bytearray()
    w = h = ct = None
    bitd = interlace = -1
    while pos + 8 <= len(blob):
        ln = int.from_bytes(blob[pos : pos + 4], "big")
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h = int.from_bytes(data[0:4], "big"), int.from_bytes(data[4:8], "big")
            bitd, ct, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or bitd != 8 or ct not in _PNG_CHANNELS or interlace != 0:
        raise ValueError("unsupported PNG variant")
    ch = _PNG_CHANNELS[ct]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b, c = prev[i], (prev[i - ch] if i >= ch else 0)
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f}")
        out += line
        prev = line
    return w, h, ch, bytes(out)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 rows). ``pixels`` is
    row-major, len == width*height. Standard-conformant output (any PNG
    reader decodes it); used to synthesize deterministic image payloads for
    the battery/test corpus."""
    assert len(pixels) == width * height
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _gray_features(gray: np.ndarray, dim: int) -> list[float]:
    """Mean intensity of ``dim`` equal column buckets, scaled to [0,1]."""
    buckets = np.array_split(gray.mean(axis=0), dim)
    return [float(b.mean()) / 255.0 if len(b) else 0.0 for b in buckets]


def decode_image_features(df: DataFrame, payload_col: str = "payload", dim: int = 8) -> DataFrame:
    """(doc_id, payload binary) → IMAGE_META rows.

    Per-row layered decode — each layer falls through on failure, so one
    corrupt payload can never fail the task:
      1. PIL, when importable (decoder='real'),
      2. the pure-stdlib PNG codec (decoder='real-png') — a genuinely real
         decode branch exercised in this container,
      3. the deterministic stub (decoder='stub'), defined ONLY on the payload
         length (1 + n%64 wide, 1 + (n//64)%64 tall), so its oracle needs no
         byte/encoding assumptions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image

            def pil_decode(blob: bytes):
                im = Image.open(io.BytesIO(blob))
                feats = (
                    np.asarray(im.convert("L").resize((dim, 1))).astype(np.float32) / 255.0
                ).ravel().tolist()
                return im.width, im.height, im.mode, feats, "real"

        except ImportError:
            pil_decode = None

        def decode(blob: bytes):
            if pil_decode is not None:
                try:
                    return pil_decode(blob)
                except Exception:  # noqa: BLE001 - any decode failure falls through
                    pass
            try:
                w, h, ch, pix = png_decode(blob)
                gray = np.frombuffer(pix, dtype=np.uint8).reshape(h, w * ch)
                if ch > 1:  # mean over color channels → grayscale
                    gray = gray.reshape(h, w, ch)[:, :, :3].mean(axis=2)
                mode = {1: "L", 3: "RGB", 4: "RGBA"}[ch]
                return w, h, mode, _gray_features(np.asarray(gray, dtype=np.float64), dim), "real-png"
            except Exception:  # noqa: BLE001 - not a PNG → stub
                pass
            n = len(blob)
            return 1 + n % 64, 1 + (n // 64) % 64, "STUB", _stub_features(blob, dim), "stub"

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


def synth_png_payloads(documents: DataFrame, limit_px: int = 64) -> DataFrame:
    """Deterministic real-PNG payload per doc: width/height derived from
    doc_id, pixels a gradient seeded by doc_id — the roundtrip corpus for the
    real decode branch (the synthetic testdata ships no media blobs). Runs as
    mapInPandas so payload bytes are born executor-side, never on the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                w = 1 + int(i) % limit_px
                h = 1 + (int(i) // limit_px) % limit_px
                px = bytes(((int(i) + x + y * w) % 256) for y in range(h) for x in range(w))
                payloads.append(png_encode_gray(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return documents.select("doc_id").mapInPandas(run, schema="doc_id long, payload binary")


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

"""Multimodal columns — LLM-pipeline surface (BASELINE.json north star).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata structs. The metadata decoder is REAL for the four container
formats whose headers are parseable with the stdlib alone — BMP, PNG, GIF,
WAV (``decode_header``: magic sniff + struct unpack, no PIL/ffmpeg needed);
unrecognized bytes fall back to a clearly-marked deterministic fake (or
raise, in strict mode). The RESIZE kernel is likewise REAL end-to-end for
uncompressed 24-bit BMP — full pixel decode, nearest-neighbor resample,
BMP re-encode, stdlib+numpy only (``decode_bmp_pixels``/``encode_bmp``).
Only frame extraction and encoder embeddings still stub their kernels
(ffmpeg / a vision encoder are not in this container), and resize of
non-BMP containers falls back to a labeled byte-resample stub; the
Spark-side plumbing (schema, Arrow batching, ``mapInPandas`` signature,
row expansion, partition flow) is real and tested throughout — swapping a
stub for a PIL/ffmpeg call changes one function.

Scale notes: mapInPandas streams Arrow batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob sizes;
for very large blobs store (path, offset, length) pointers instead and fetch
inside the kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "id long, n_bytes int, format string, width int, height int, checksum string"
)


def attach_binary(df: DataFrame, text_col: str, out_col: str = "blob") -> DataFrame:
    """Pack a column into binary — stands in for reading image bytes."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def decode_header(blob: bytes) -> dict | None:
    """REAL container-header decode, stdlib only: returns
    ``{"format", "width", "height"}`` for BMP/PNG/GIF images (pixel
    dimensions) and WAV audio (width carries the sample rate in Hz, height
    the channel count — the schema's two ints repurposed per modality,
    documented here), or None when the bytes are not a recognized
    container. Strict magic + sanity checks so arbitrary text/binary can't
    false-positive into a bogus parse."""
    import struct

    b = bytes(blob)
    if len(b) >= 26 and b[:2] == b"BM":
        (hdr,) = struct.unpack_from("<I", b, 14)
        if hdr == 12:  # BITMAPCOREHEADER: uint16 dims
            w, h = struct.unpack_from("<HH", b, 18)
        elif hdr in (40, 52, 56, 64, 108, 124):  # BITMAPINFOHEADER family
            w, h = struct.unpack_from("<ii", b, 18)
            h = abs(h)  # top-down rows store height negative
        else:
            return None
        if w <= 0 or h <= 0:
            return None
        return {"format": "image/bmp", "width": int(w), "height": int(h)}
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", b, 16)
        if not (0 < w < 1 << 31 and 0 < h < 1 << 31):
            return None
        return {"format": "image/png", "width": int(w), "height": int(h)}
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", b, 6)
        if w == 0 or h == 0:
            return None
        return {"format": "image/gif", "width": int(w), "height": int(h)}
    if len(b) >= 36 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        off = 12  # walk RIFF chunks to the fmt chunk (usually first)
        while off + 8 <= len(b):
            cid = b[off : off + 4]
            (sz,) = struct.unpack_from("<I", b, off + 4)
            if cid == b"fmt " and off + 16 <= len(b):
                (ch,) = struct.unpack_from("<H", b, off + 10)
                (rate,) = struct.unpack_from("<I", b, off + 12)
                if ch == 0 or rate == 0:
                    return None
                return {"format": "audio/wav", "width": int(rate), "height": int(ch)}
            off += 8 + sz + (sz & 1)  # chunks are word-aligned
    return None


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for decoding an UNRECOGNIZED format.

    STUB: derives pseudo-metadata from the bytes. Replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(blob))`` to cover formats beyond
    ``decode_header``'s four when decode libs are available.
    """
    n = len(blob)
    return {"format": "fake/raw", "width": (n % 64) + 16, "height": ((n // 64) % 64) + 16}


def decode_blob(blob: bytes, strict: bool = False) -> dict:
    """Full per-blob metadata row: real header parse where the container is
    recognized, deterministic fake (or ValueError under strict) elsewhere."""
    import hashlib

    meta = decode_header(blob)
    if meta is None:
        if strict:
            raise ValueError(
                "unrecognized container (not BMP/PNG/GIF/WAV) — formats beyond "
                "the stdlib header parser need PIL/ffmpeg, absent in this image"
            )
        meta = fake_decode(blob)
    return {
        "n_bytes": len(blob),
        **meta,
        "checksum": hashlib.md5(bytes(blob)).hexdigest(),
    }


def decode_metadata(df: DataFrame, id_col: str, blob_col: str = "blob", strict: bool = False) -> DataFrame:
    """Decode binary blobs to typed metadata via Arrow-batched mapInPandas.

    BMP/PNG/GIF/WAV headers are parsed for real (``decode_header``);
    ``strict=True`` makes any other format raise instead of falling back to
    the deterministic fake.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_blob(b, strict=strict) for b in pdf[blob_col]]
            out = pd.DataFrame(meta)
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(kernel, DECODED_SCHEMA)


RESIZED_SCHEMA = "id long, blob binary, width int, height int"
FRAMES_SCHEMA = "id long, frame_idx int, frame binary"


def decode_bmp_pixels(blob: bytes):
    """REAL pixel decode for the BMP format the stdlib can fully parse:
    uncompressed (BI_RGB) 24-bit BITMAPINFOHEADER-family bitmaps. Returns an
    (h, w, 3) uint8 RGB array, or None if the blob is any other container /
    BMP variant (paletted, RLE, 32-bit, core-header)."""
    import struct

    import numpy as np

    b = bytes(blob)
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr,) = struct.unpack_from("<I", b, 14)
    if hdr not in (40, 52, 56, 64, 108, 124):
        return None
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if w <= 0 or h_raw == 0 or planes != 1 or bpp != 24 or compression != 0:
        return None
    h = abs(h_raw)
    stride = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if data_off + stride * h > len(b):
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # positive height = bottom-up row order
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR storage -> RGB


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up) — the inverse of ``decode_bmp_pixels``."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def _resize_nearest(px, width: int, height: int):
    """Nearest-neighbor resample: output pixel (x, y) reads source pixel
    (x*src_w // width, y*src_h // height) — the floor-index convention, so
    the result is deterministic and integer-exact."""
    import numpy as np

    src_h, src_w = px.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return px[ys][:, xs]


def resize_images(
    df: DataFrame, id_col: str, blob_col: str = "blob", width: int = 32, height: int = 32
) -> DataFrame:
    """Resize kernel over mapInPandas (one output row per image).

    REAL for uncompressed 24-bit BMP: full pixel decode → nearest-neighbor
    resample → re-encode as BMP (``decode_bmp_pixels``/``encode_bmp``,
    stdlib+numpy only). Other containers keep the STUB byte-resample —
    swapping it for ``PIL.Image.resize`` covers them when decode libs
    exist; schema and batching stay.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = []
            for b in pdf[blob_col]:
                px = decode_bmp_pixels(b)
                if px is not None:  # REAL path: decoded pixels, NN resample
                    resized.append(encode_bmp(_resize_nearest(px, width, height)))
                else:
                    resized.append(
                        (bytes(b) * (target // max(len(b), 1) + 1))[:target]  # STUB:
                    )  # non-BMP formats need PIL — repeat-and-truncate bytes
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "blob": resized, "width": width, "height": height}
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, blob_col: str = "blob", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling kernel: each input 'video' row expands to ``n_frames``
    rows (id, frame_idx, frame) — the UDTF-shaped multimodal op.

    STUB frames: equal byte slices of the blob (a real impl seeks keyframes
    via ffmpeg). Row expansion, Arrow batching and schema are real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(b)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step] or b"\x00")  # STUB slice
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(kernel, FRAMES_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str, blob_col: str = "blob", dim: int = 16
) -> DataFrame:
    """Feature-extraction kernel: blob -> float embedding (array<float>).

    STUB features: md5-seeded deterministic floats in [-1, 1] (a real impl
    runs a vision/audio encoder). Output feeds the similarity-search tier
    directly (operators/knn.py) — composition asserted in tests.
    """
    import hashlib
    import struct

    def embed(b: bytes) -> list[float]:
        out: list[float] = []
        seed = b or b"\x00"
        i = 0
        while len(out) < dim:
            h = hashlib.md5(seed + i.to_bytes(4, "little")).digest()
            for j in range(0, 16, 4):
                (v,) = struct.unpack("<I", h[j : j + 4])
                out.append(v / 2147483648.0 - 1.0)  # STUB: encoder forward pass
            i += 1
        return out[:dim]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "embedding": [embed(bytes(b)) for b in pdf[blob_col]]}
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, "id long, embedding array<float>"
    )

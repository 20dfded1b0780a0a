"""Multimodal columns — LLM-pipeline surface (BASELINE.json north star).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata structs. Real decode libraries (PIL/ffmpeg/...) are NOT in
this container, so the decode kernel is stubbed: either a clearly-marked
NotImplementedError (strict mode) or a deterministic fake that derives
metadata from the bytes. The Spark-side plumbing — schema, Arrow batching,
``mapInPandas`` signature, partition flow — is real and tested; swapping the
fake for a PIL call changes one function.

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


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    STUB: derives pseudo-metadata from the bytes. Replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(blob))`` when decode libs are available.
    """
    n = len(blob)
    return {
        "n_bytes": n,
        "format": "fake/raw",
        "width": (n % 64) + 16,
        "height": ((n // 64) % 64) + 16,
        "checksum": __import__("hashlib").md5(blob).hexdigest(),
    }


def decode_metadata(df: DataFrame, id_col: str, blob_col: str = "blob", strict: bool = False) -> DataFrame:
    """Decode binary blobs to typed metadata via Arrow-batched mapInPandas.

    ``strict=True`` raises NotImplementedError where a real decoder would run
    (useful to prove the pipeline wiring without pretending to decode).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — not in this image"
                )
            meta = [fake_decode(b) for b in pdf[blob_col]]
            out = pd.DataFrame(meta)
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(kernel, DECODED_SCHEMA)


RESIZED_SCHEMA = "id long, blob binary, width int, height int"
FRAMES_SCHEMA = "id long, frame_idx int, frame binary"


def resize_images(
    df: DataFrame, id_col: str, blob_col: str = "blob", width: int = 32, height: int = 32
) -> DataFrame:
    """Resize kernel over mapInPandas (one output row per image).

    STUB resize: deterministically re-samples the byte stream to width*height
    bytes (repeat-and-truncate). Replace the two marked lines with a real
    ``PIL.Image.resize`` when decode libs exist — schema and batching stay.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = [
                (bytes(b) * (target // max(len(b), 1) + 1))[:target]  # STUB: real impl decodes
                for b in pdf[blob_col]                                # and PIL-resizes here
            ]
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

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

"""Multimodal (image/audio/video) columns: opaque binary + typed
metadata, processed in Arrow batches.

This is the training-data-pipeline surface for non-text payloads: the
content is a ``binary`` column, features come from a batched decoder
inside ``mapInPandas``, and downstream ops (filter by size, dedup by
content hash, join to text) are plain DataFrame relational ops.

The real decoders (PIL/ffmpeg) are NOT in this container, so the
decode step is STUBBED two ways:
- ``decode="fake"`` (default): a deterministic pure function of the
  content bytes (md5-derived width/height/luma) — keeps every piece of
  Spark plumbing (schema, batching, partitioning, UDF signature) real
  and oracle-checkable.
- ``decode="real"``: gated behind an import-try of PIL; raises
  ``NotImplementedError`` here.  The batch loop, schema and signature
  are exactly what the real implementation uses.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image header parse: md5-derived
    dims/luma.  Mirrored exactly by the SQL oracle."""
    h8 = int(hashlib.md5(blob).hexdigest()[:8], 16)
    width = 16 + h8 % 64
    height = 16 + (h8 // 64) % 64
    mean_luma = (h8 % 256) / 255.0
    return width, height, mean_luma


def extract_image_meta(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """binary content → (doc_id, n_bytes, width, height, mean_luma).

    One ``mapInPandas`` pass; Arrow moves the binary column in 64k-row
    batches, the decoder loop runs per batch (at scale: this is where
    PIL/libjpeg-turbo would run, one core per task, no shuffle)."""
    if decode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available in "
                "this environment; use decode='fake' for the deterministic stub"
            ) from exc

    def gen(pdf_iter):
        for pdf in pdf_iter:
            metas = [_fake_decode(bytes(b)) for b in pdf[content_col]]
            w, h, l = (
                np.array([m[0] for m in metas], dtype=np.int64),
                np.array([m[1] for m in metas], dtype=np.int64),
                np.array([m[2] for m in metas]),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64),
                    "n_bytes": pdf[content_col].map(lambda b: len(bytes(b))).to_numpy(np.int64),
                    "width": w,
                    "height": h,
                    "mean_luma": l,
                }
            )

    return docs.select(id_col, content_col).mapInPandas(gen, IMAGE_META_SCHEMA)


def resize_images(docs: DataFrame, width: int, height: int, **kw) -> DataFrame:
    """Pixel resize — requires a real decoder; plumbing-only stub."""
    raise NotImplementedError(
        "resize requires an image library (PIL) absent from this container; "
        "the mapInPandas shape is identical to extract_image_meta"
    )


def sample_video_frames(docs: DataFrame, every_n: int = 30, **kw) -> DataFrame:
    """Frame sampling — requires ffmpeg; plumbing-only stub."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg, absent from this container"
    )

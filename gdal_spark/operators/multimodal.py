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


WHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("hash15", T.LongType()),
    ]
)


def image_whash(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
    brightness_col: str | None = None,
) -> DataFrame:
    """Walsh–Hadamard perceptual hash (pHash with the integer WHT in
    place of the float DCT): sample the same 8×8 grid as
    :func:`image_ahash`, transform C = S·P·Sᵀ with the ±1 Hadamard
    matrix S[k, y] = (−1)^popcount(k & y) — EXACT integer arithmetic
    end to end — and set bit (k·4 + l − 1) iff the low-frequency
    coefficient C[k, l] > 0 for k, l ∈ 0..3, (0, 0) excluded.
    Excluding DC makes the hash PROVABLY invariant to a constant
    brightness offset (every emitted basis row sums to zero), the
    robustness property float-DCT pHash only has approximately;
    ``brightness_col`` (optional integer column) applies such an
    offset pre-hash so the invariance is testable.  Dedup downstream
    is a hash equi-join, never all-pairs."""
    if decode == "real":
        raise NotImplementedError(
            "real image decode requires PIL, absent from this container"
        )
    cols = [id_col, content_col] + (
        [brightness_col] if brightness_col else [])

    sgn = np.empty((8, 8), dtype=np.int64)
    for k in range(8):
        for y in range(8):
            sgn[k, y] = -1 if bin(k & y).count("1") % 2 else 1

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for tup in pdf[cols].itertuples(index=False):
                did, blob = tup[0], bytes(tup[1])
                bright = int(tup[2]) if brightness_col else 0
                w, h, _ = _fake_decode(blob)
                h8 = int(hashlib.md5(blob).hexdigest()[:8], 16)
                sy = ((2 * np.arange(8) + 1) * h) // 16
                sx = ((2 * np.arange(8) + 1) * w) // 16
                p = (h8 + 31 * sy[:, None] + 17 * sx[None, :]) % 251 + bright
                c = sgn @ p @ sgn.T
                bits = 0
                for k in range(4):
                    for l in range(4):
                        if k == 0 and l == 0:
                            continue
                        if c[k, l] > 0:
                            bits |= 1 << (k * 4 + l - 1)
                rows.append((int(did), bits))
            yield pd.DataFrame(rows, columns=["doc_id", "hash15"])

    return docs.select(*cols).mapInPandas(gen, WHASH_SCHEMA)


def _fake_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image header parse: md5-derived
    dims/luma.  Mirrored exactly by the SQL oracle."""
    h8 = int(hashlib.md5(blob).hexdigest()[:8], 16)
    width = 16 + h8 % 64
    height = 16 + (h8 // 64) % 64
    mean_luma = (h8 % 256) / 255.0
    return width, height, mean_luma


def _real_decode(blob: bytes) -> tuple[int, int, float]:
    """PIL-backed header decode: (width, height, grayscale mean/255).

    The genuine seam — raises ``NotImplementedError`` when PIL is
    absent (this container), and is exercised against a test-double
    PIL by tests/test_multimodal_seam.py so the branch shape cannot
    rot while the library is missing."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in "
            "this environment; use decode='fake' for the deterministic stub"
        ) from exc
    import io

    img = Image.open(io.BytesIO(blob))
    w, h = img.size
    gray = np.asarray(img.convert("L"), dtype=np.float64)
    return int(w), int(h), float(gray.mean() / 255.0)


def _image_meta_batches(pdf_iter, decoder, id_col="doc_id",
                        content_col="content"):
    """The extract_image_meta batch loop, decoder-parameterized and
    module-level so the real-decode path is directly testable with a
    PIL test double (Spark executors are separate processes — a
    sys.modules monkeypatch cannot reach them, the loop itself can
    be driven in-process)."""
    for pdf in pdf_iter:
        metas = [decoder(bytes(b)) for b in pdf[content_col]]
        w, h, l = (
            np.array([m[0] for m in metas], dtype=np.int64),
            np.array([m[1] for m in metas], dtype=np.int64),
            np.array([m[2] for m in metas]),
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf[id_col].to_numpy(np.int64),
                "n_bytes": pdf[content_col].map(
                    lambda b: len(bytes(b))).to_numpy(np.int64),
                "width": w,
                "height": h,
                "mean_luma": l,
            }
        )


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
    decoder = _real_decode if decode == "real" else _fake_decode

    def gen(pdf_iter):
        yield from _image_meta_batches(pdf_iter, decoder, id_col,
                                       content_col)

    return docs.select(id_col, content_col).mapInPandas(gen, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("pix_min", T.LongType()),
        T.StructField("pix_max", T.LongType()),
    ]
)


def resize_images(
    docs: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Nearest-neighbour resize with GDAL's half-pixel source mapping
    (src = floor((i + 0.5) · src_size / out_size) — the gdal_translate
    -outsize nearest rule), then per-image pixel aggregates.

    The decode stage is the stub seam: ``decode="fake"`` materializes
    the deterministic pixel function p(y, x) = (h8 + 31·y + 17·x) mod
    251 over the md5-derived dims (every downstream byte of plumbing —
    mapInPandas batch loop, schema, resize index math, aggregation —
    is exactly what a PIL-backed decode would feed); ``decode="real"``
    gates on PIL and raises here."""
    if decode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode requires PIL, absent from this container"
            ) from exc

    def gen(pdf_iter):
        for pdf in pdf_iter:
            out = {k: [] for k in ("doc_id", "pix_sum", "pix_min", "pix_max")}
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, _ = _fake_decode(bytes(blob))
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                sy = ((2 * np.arange(out_h) + 1) * h) // (2 * out_h)
                sx = ((2 * np.arange(out_w) + 1) * w) // (2 * out_w)
                p = (h8 + 31 * sy[:, None] + 17 * sx[None, :]) % 251
                out["doc_id"].append(int(did))
                out["pix_sum"].append(int(p.sum()))
                out["pix_min"].append(int(p.min()))
                out["pix_max"].append(int(p.max()))
            n = len(out["doc_id"])
            yield pd.DataFrame(
                {
                    "doc_id": np.array(out["doc_id"], dtype=np.int64),
                    "out_w": np.full(n, out_w, dtype=np.int64),
                    "out_h": np.full(n, out_h, dtype=np.int64),
                    "pix_sum": np.array(out["pix_sum"], dtype=np.int64),
                    "pix_min": np.array(out["pix_min"], dtype=np.int64),
                    "pix_max": np.array(out["pix_max"], dtype=np.int64),
                }
            )

    return docs.select(id_col, content_col).mapInPandas(gen, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("luma_int", T.LongType()),
    ]
)


def sample_video_frames(
    docs: DataFrame,
    every_n: int = 16,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Every-n-th frame sampling: one input row explodes to one row
    per sampled frame inside ``mapInPandas`` — the real ffmpeg shape
    (decode a container, emit selected frames; at scale the task is
    I/O + codec bound, no shuffle).  Fake decode: n_frames = 8 +
    h8 mod 120, per-frame luma_int = (h8 + 97·f) mod 256;
    ``decode="real"`` gates on ffmpeg and raises here."""
    if decode == "real":
        raise NotImplementedError(
            "real frame sampling requires ffmpeg, absent from this container"
        )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            ids, fs, ls = [], [], []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                n_frames = 8 + h8 % 120
                f = np.arange(0, n_frames, every_n, dtype=np.int64)
                ids.append(np.full(len(f), int(did), dtype=np.int64))
                fs.append(f)
                ls.append((h8 + 97 * f) % 256)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else np.array([], dtype=np.int64),
                    "frame_idx": np.concatenate(fs) if fs else np.array([], dtype=np.int64),
                    "luma_int": np.concatenate(ls) if ls else np.array([], dtype=np.int64),
                }
            )

    return docs.select(id_col, content_col).mapInPandas(gen, FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_energy", T.LongType()),
        T.StructField("max_frame_energy", T.LongType()),
    ]
)


def audio_frame_energy(
    docs: DataFrame,
    frame: int = 64,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Audio feature extraction plumbing: decode → frame → per-frame
    energy, the first stage of any speech/audio training pipeline
    (the real path is soundfile/ffmpeg + an FFT; both are container-
    absent, so ``decode="real"`` raises at the same one-line seam as
    the image/video ops).  Fake decode (pure function of the bytes):
    n_samples = 256 + h8 mod 512, sample[i] = (h8 + 37·i) mod 201 −
    100; frames are non-overlapping windows of ``frame`` samples
    (trailing partial frame dropped, the standard hop=frame case) and
    energy is the integer Σ s² — exact on both engines.  Shape: one
    ``mapInPandas`` pass, no shuffle; at scale the task is I/O +
    codec bound exactly like the real decoder."""
    if decode == "real":
        raise NotImplementedError(
            "real audio decode requires soundfile/ffmpeg, absent from this container"
        )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                n = 256 + h8 % 512
                i = np.arange(n, dtype=np.int64)
                s = (h8 + 37 * i) % 201 - 100
                nf = n // frame
                e = (s[: nf * frame].reshape(nf, frame) ** 2).sum(axis=1)
                rows.append(
                    (int(did), n, nf, int(e.sum()), int(e.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_frames",
                    "total_energy", "max_frame_energy",
                ],
            )

    return docs.select(id_col, content_col).mapInPandas(gen, AUDIO_SCHEMA)


ZCR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("f", T.LongType()),
        T.StructField("zc", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_zcr_frames(
    docs: DataFrame,
    frame: int = 64,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Per-frame zero-crossing rate + energy — the two features a
    classical VAD (voice-activity detector) gates on before any
    model sees the audio (energy splits voiced/quiet, ZCR splits
    voiced/fricative).  Same fake-decode seam and framing as
    :func:`audio_frame_energy`; the ZCR contract is pinned as
    crossing iff s[i]*s[i+1] < 0 for consecutive samples WITHIN the
    frame (an exact integer product — zeros never cross, the
    sign-function ambiguity never arises).  One ``mapInPandas``
    pass, frame-level rows out; integer samples keep both columns
    exact on both engines."""
    if decode == "real":
        raise NotImplementedError(
            "real audio decode requires soundfile/ffmpeg, absent from this container"
        )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            out = {"doc_id": [], "f": [], "zc": [], "energy": []}
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                n = 256 + h8 % 512
                i = np.arange(n, dtype=np.int64)
                s = (h8 + 37 * i) % 201 - 100
                nf = n // frame
                fr = s[: nf * frame].reshape(nf, frame)
                zc = ((fr[:, :-1] * fr[:, 1:]) < 0).sum(axis=1)
                e = (fr * fr).sum(axis=1)
                out["doc_id"].extend([int(did)] * nf)
                out["f"].extend(range(nf))
                out["zc"].extend(int(x) for x in zc)
                out["energy"].extend(int(x) for x in e)
            yield pd.DataFrame(out)

    return docs.select(id_col, content_col).mapInPandas(gen, ZCR_SCHEMA)


SAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("sad", T.LongType()),
    ]
)


def video_shot_sad(
    docs: DataFrame,
    n_px: int = 16,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Per-transition frame-difference SAD (sum of absolute pixel
    differences) — the classical shot-boundary detector every video
    curation pipeline runs before sampling frames for training (cut
    when SAD(t) = sum_px |v(t,px) - v(t-1,px)| spikes).  Fake decode
    (pure function of the bytes, same import-gated seam as the other
    modalities): n_frames = 8 + h8 mod 56, 8-frame shots s = t div 8,
    pixel v(t, p) = (h8 + 1009*s + 13*p + 7*p*s) mod 200 + 3*(t mod 8)
    — within a shot consecutive frames differ by EXACTLY 3 per pixel
    (monotone ramp, no modular wrap: 199 + 21 <= 220 < 256), so
    within-shot SAD is the constant 3*n_px while cross-shot seeds
    jump pixel-dependently (the 7*p*s term keeps the jump from
    collapsing to a constant).  One ``mapInPandas`` pass, rows only
    for t >= 1; integer pixels keep SAD exact on both engines."""
    if decode == "real":
        raise NotImplementedError(
            "real video decode requires ffmpeg, absent from this container"
        )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            out = {"doc_id": [], "t": [], "sad": []}
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                nf = 8 + h8 % 56
                t = np.arange(nf, dtype=np.int64)[:, None]
                p = np.arange(n_px, dtype=np.int64)[None, :]
                s = t // 8
                v = (h8 + 1009 * s + 13 * p + 7 * p * s) % 200 + 3 * (t % 8)
                sad = np.abs(v[1:] - v[:-1]).sum(axis=1)
                out["doc_id"].extend([int(did)] * (nf - 1))
                out["t"].extend(range(1, nf))
                out["sad"].extend(int(x) for x in sad)
            yield pd.DataFrame(out)

    return docs.select(id_col, content_col).mapInPandas(gen, SAD_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("hash_hi", T.LongType()),
        T.StructField("hash_lo", T.LongType()),
    ]
)


def image_ahash(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Perceptual average-hash (aHash) per image — the standard
    image-near-dup key for web-scale corpora: resize to 8×8 (same
    half-pixel nearest rule as ``resize_images``), bit k set iff pixel
    k exceeds the image mean, done in EXACT integer arithmetic
    (64·p > Σp — no float mean), packed as two 32-bit halves so both
    engines stay in signed-long range.  Identical images hash equal;
    dedup is then a hash equi-join (never all-pairs).  ``decode="real"``
    gates on PIL at the same seam as the other image ops."""
    if decode == "real":
        raise NotImplementedError(
            "real image decode requires PIL, absent from this container"
        )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, _ = _fake_decode(bytes(blob))
                h8 = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
                sy = ((2 * np.arange(8) + 1) * h) // 16
                sx = ((2 * np.arange(8) + 1) * w) // 16
                p = ((h8 + 31 * sy[:, None] + 17 * sx[None, :]) % 251).ravel()
                s = int(p.sum())
                bits = 64 * p > s
                lo = int(sum(1 << k for k in range(32) if bits[k]))
                hi = int(sum(1 << k for k in range(32) if bits[32 + k]))
                rows.append((int(did), hi, lo))
            yield pd.DataFrame(rows, columns=["doc_id", "hash_hi", "hash_lo"])

    return docs.select(id_col, content_col).mapInPandas(gen, AHASH_SCHEMA)

"""Complex pixel types — the reference's GDT_CInt16/CInt32/CFloat32/
CFloat64 band surface (gcore/gdal.h:49-66) with the band-algebra ops
its consumers run (SAR interferometry shapes: conjugate products,
magnitude, real/imag extraction — gdal_calc / pixel functions
frmts/vrt/pixelfunctions.cpp: "mod", "conj", "mult", "real", "imag").

Representation: one tile row per band, ``data`` = interleaved
(re, im) float32 pairs row-major (exactly the reference's in-memory
complex layout), ``dtype`` = 'complex64'.  Ops run vectorized per
tile after a zero-copy ``.view(np.complex64)``; two-band ops align by
(tx, ty) equi-join — one shuffle, tile-local math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("dtype", T.StringType()),
    ]
)


def _as_complex(blob: bytes, ts: int) -> np.ndarray:
    return (
        np.frombuffer(blob, dtype=np.complex64).reshape(ts, ts)
    )


def complex_unary(tiles: DataFrame, op: str, tile_size: int = 256) -> DataFrame:
    """op ∈ real | imag | conj | mod2 (squared magnitude — exact on
    integer-valued fixtures; 'mod' of the reference is its sqrt)."""
    ts = tile_size

    def gen(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                z = _as_complex(row["data"], ts)
                if op == "real":
                    r = z.real.astype(np.float64)
                    dt = "float64"
                elif op == "imag":
                    r = z.imag.astype(np.float64)
                    dt = "float64"
                elif op == "mod2":
                    r = (
                        z.real.astype(np.float64) ** 2
                        + z.imag.astype(np.float64) ** 2
                    )
                    dt = "float64"
                elif op == "conj":
                    r = np.conj(z)
                    dt = "complex64"
                else:
                    raise ValueError(op)
                out.append((row["tx"], row["ty"], r.tobytes(), dt))
            yield pd.DataFrame(out, columns=["tx", "ty", "data", "dtype"])

    return tiles.select("tx", "ty", "data", "dtype").mapInPandas(gen, _OUT)


def complex_conj_mult(
    a: DataFrame, b: DataFrame, tile_size: int = 256
) -> DataFrame:
    """a · conj(b) per pixel (the interferogram product; pixel function
    "mult" + "conj" composition) — (tx, ty) equi-join, tile-local
    complex multiply, complex64 out."""
    ts = tile_size
    joined = a.select(
        "tx", "ty", F.col("data").alias("_da")
    ).join(b.select("tx", "ty", F.col("data").alias("_db")), ["tx", "ty"])

    def gen(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                za = _as_complex(row["_da"], ts)
                zb = _as_complex(row["_db"], ts)
                r = za * np.conj(zb)
                out.append((row["tx"], row["ty"], r.tobytes(), "complex64"))
            yield pd.DataFrame(out, columns=["tx", "ty", "data", "dtype"])

    return joined.mapInPandas(gen, _OUT)


def complex_to_features(
    tiles: DataFrame, tile_size: int = 256
) -> DataFrame:
    """Explode complex tiles to (gx, gy, re, im) rows for inspection /
    oracles; drops exact-zero pixels (the sparse-tile convention)."""
    ts = tile_size

    def gen(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                z = _as_complex(row["data"], ts)
                gy, gx = np.nonzero((z.real != 0) | (z.imag != 0))
                frames.append(
                    pd.DataFrame(
                        {
                            "gx": gx + int(row["tx"]) * ts,
                            "gy": gy + int(row["ty"]) * ts,
                            "re": z.real[gy, gx].astype(np.float64),
                            "im": z.imag[gy, gx].astype(np.float64),
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"gx": [], "gy": [], "re": [], "im": []}
            )

    return tiles.mapInPandas(
        gen,
        "gx long, gy long, re double, im double",
    )

"""Orthonormal 2-D Haar wavelet energy decomposition over a tile table.

The compression-planning primitive behind every wavelet-coded raster
format the reference reads (JPEG2000 / ECW drivers sit on exactly this
transform; gcore's overview machinery is the same dyadic pyramid with
averaging instead of the orthonormal basis): a 3-level separable Haar
analysis whose per-level detail energies tell a codec how much signal
survives truncating each band.

Everything stays EXACT INTEGER by scaling: the orthonormal level-l
coefficient is (a +- b +- c +- d)/2 applied to level-(l-1) LL values,
so 2^l * coeff is an integer combination of raw pixels — per-tile
partials carry the squared INTEGER combinations (I_l = 2^l * coeff)
and the driver-side reduction recovers the dyadic energies by the
fixed powers 16/4/1 at the end.  Parseval for the orthonormal basis
becomes the pure integer identity

    64 * sum(z^2) == 16 * sum(I1^2) + 4 * sum(I2^2) + sum(I3^2) + sum(S8^2)

(S8 = 8 * LL3 is the plain 8x8 block sum), which the query EMITS as a
residual-zero proof rather than assuming.

Shape: one mapInPandas pass over tiles (every 8x8 block is tile-local
for tile_size >= 8), then a single global aggregation of the partial
sums — map-side combinable, no shuffle beyond the one-row reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("p_raw", T.LongType()),
        T.StructField("p1", T.LongType()),
        T.StructField("p2", T.LongType()),
        T.StructField("p3", T.LongType()),
        T.StructField("pll", T.LongType()),
        T.StructField("n1", T.LongType()),
        T.StructField("n2", T.LongType()),
        T.StructField("n3", T.LongType()),
        T.StructField("nll", T.LongType()),
    ]
)


def _level_coeffs(a: np.ndarray):
    """One Haar analysis step on integer array ``a``: returns the
    (h, v, d) integer detail combinations and the block-sum LL
    (all UNSCALED — the caller tracks the 2^l normalization)."""
    q00 = a[0::2, 0::2]
    q01 = a[0::2, 1::2]
    q10 = a[1::2, 0::2]
    q11 = a[1::2, 1::2]
    h = q00 - q01 + q10 - q11
    v = q00 + q01 - q10 - q11
    d = q00 - q01 - q10 + q11
    ll = q00 + q01 + q10 + q11
    return h, v, d, ll


def haar_energy_partials(tiles: DataFrame, tile_size: int) -> DataFrame:
    """Per-tile Haar partial sums (3 levels).  ``tile_size`` must be a
    multiple of 8 so every level's blocks stay tile-local."""
    if tile_size % 8:
        raise ValueError("tile_size must be a multiple of 8")

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                z = (
                    np.frombuffer(row["data"], dtype=np.dtype(row["dtype"]))
                    .reshape(tile_size, tile_size)
                    .astype(np.int64)
                )
                p_raw = int((z * z).sum())
                h1, v1, d1, s2 = _level_coeffs(z)
                p1 = int((h1 * h1 + v1 * v1 + d1 * d1).sum())
                h2, v2, d2, s4 = _level_coeffs(s2)
                p2 = int((h2 * h2 + v2 * v2 + d2 * d2).sum())
                h3, v3, d3, s8 = _level_coeffs(s4)
                p3 = int((h3 * h3 + v3 * v3 + d3 * d3).sum())
                pll = int((s8 * s8).sum())
                rows.append(
                    (
                        p_raw, p1, p2, p3, pll,
                        3 * h1.size, 3 * h2.size, 3 * h3.size, s8.size,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PARTIAL_SCHEMA])

    return tiles.mapInPandas(gen, PARTIAL_SCHEMA)

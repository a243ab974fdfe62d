"""Golden image checksum — reproduces the reference's
``GDALChecksumImage`` formula (alg/gdalchecksum.cpp:48-260) so ported
autotest expectations (e.g. rasterize_1 band-2 checksum 6452,
autotest/alg/rasterize.py:73) can be asserted cell-for-cell.

Row-major over the window; per pixel i (0-based, running across the
whole window): ``checksum += int(val) % primes[i % 11]; checksum &= 0xffff``.
Primes: 7 11 13 17 19 23 29 31 37 41 43.  Floats convert via
``floor(v + 0.5)`` clamped to ±2147483647 (non-finite → INT_MIN).
C++ ``%`` truncates toward zero (sign follows the dividend) — NumPy's
``%`` floors, so negative values are remapped explicitly.
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum_image(arr: np.ndarray) -> int:
    """Checksum of a 2-D band array (any integer or float dtype)."""
    a = np.asarray(arr)
    if np.issubdtype(a.dtype, np.floating):
        v = a.astype(np.float64) + 0.5
        out = np.empty(a.shape, dtype=np.int64)
        finite = np.isfinite(v)
        out[~finite] = np.iinfo(np.int32).min
        vf = np.clip(v, -2147483647.0, 2147483647.0)
        out[finite] = np.floor(vf[finite]).astype(np.int64)
        vals = out.reshape(-1)
    else:
        vals = a.astype(np.int64).reshape(-1)
    primes = _PRIMES[np.arange(vals.size, dtype=np.int64) % 11]
    # C-style remainder: sign of the dividend.
    rem = np.abs(vals) % primes
    rem = np.where(vals < 0, -rem, rem)
    # The running ``&= 0xffff`` after every pixel equals one final
    # masked sum only for non-negative remainders; with negatives the
    # C code's int wrap differs, so fold in chunks to stay exact.
    total = 0
    for chunk in np.array_split(rem, max(1, rem.size // 65536)):
        total = (total + int(chunk.sum())) & 0xFFFF
    return total

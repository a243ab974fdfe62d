"""Floyd-Steinberg error-diffusion dithering, exact integer spec.

Reference: alg/gdaldither.cpp (GDALDitherRGB2PCT) — RGB pixels map to a
fixed palette with the quantization error diffused to unvisited
neighbors (7/16 right, 3/16 down-left, 5/16 down, 1/16 down-right).

Our re-pinned EXACT spec (engine and oracle implement it identically):

- errors carried in SIXTEENTHS as integers: corrected = px*16 + err16;
- nearest palette entry by integer squared distance in 16ths, ties to
  the lowest palette index;
- diffusion uses floor division toward -inf for the 7/16, 3/16, 5/16
  shares and gives the exact remainder to the 1/16 neighbor, so the
  distributed error sums to the full error (conservation) and every
  quantity stays an integer;
- out-of-image contributions are dropped.

Scale shape: dithering is sequential WITHIN an image by construction
(the reference is too) — the distributed axis is ACROSS images: one
task per image via mapInPandas, a million images = a million parallel
kernels.  In-image cost is O(W*H) with a NumPy row state.
"""

from __future__ import annotations

import numpy as np

# 8-entry web-safe-ish palette used by the q196 fixture (literal in the
# oracle too).
PALETTE = np.array(
    [
        (0, 0, 0),
        (255, 255, 255),
        (255, 0, 0),
        (0, 255, 0),
        (0, 0, 255),
        (128, 128, 0),
        (0, 128, 128),
        (128, 0, 128),
    ],
    dtype=np.int64,
)


def fs_pixel(img_id: int, x: int, y: int) -> np.ndarray:
    """Deterministic integer RGB fixture pixel (mirrored in the oracle)."""
    return np.array(
        [
            (img_id * 31 + x * 7 + y * 13) % 256,
            (img_id * 17 + x * 11 + y * 3) % 256,
            (img_id * 23 + x * 5 + y * 19) % 256,
        ],
        dtype=np.int64,
    )


def floyd_steinberg_counts(img_id: int, w: int, h: int) -> np.ndarray:
    """Dither one image; return per-palette-entry assignment counts."""
    pal16 = PALETTE * 16
    cur = np.zeros((w, 3), dtype=np.int64)
    nxt = np.zeros((w, 3), dtype=np.int64)
    counts = np.zeros(len(PALETTE), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            c16 = fs_pixel(img_id, x, y) * 16 + cur[x]
            d = ((c16[None, :] - pal16) ** 2).sum(axis=1)
            best = int(np.argmin(d))  # argmin takes the first (lowest) tie
            counts[best] += 1
            err = c16 - pal16[best]
            c7 = np.floor_divide(err * 7, 16)
            c3 = np.floor_divide(err * 3, 16)
            c5 = np.floor_divide(err * 5, 16)
            c1 = err - c7 - c3 - c5
            if x + 1 < w:
                cur[x + 1] += c7
                nxt[x + 1] += c1
            if x - 1 >= 0:
                nxt[x - 1] += c3
            nxt[x] += c5
        cur, nxt = nxt, np.zeros((w, 3), dtype=np.int64)
    return counts

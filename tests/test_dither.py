"""Floyd-Steinberg kernel invariants (kernels/dither.py)."""

import numpy as np

from gdal_spark.kernels.dither import PALETTE, floyd_steinberg_counts, fs_pixel


def test_counts_cover_every_pixel():
    for img in range(4):
        counts = floyd_steinberg_counts(img, 16, 16)
        assert counts.sum() == 256
        assert (counts >= 0).all()


def test_exact_palette_color_image_has_zero_error():
    # monkeypatch-free: an image whose every pixel IS palette entry 5
    # must assign everything to entry 5 with no diffusion at all
    import gdal_spark.kernels.dither as D

    orig = D.fs_pixel
    try:
        D.fs_pixel = lambda img, x, y: np.array(PALETTE[5], dtype=np.int64)
        counts = D.floyd_steinberg_counts(0, 8, 8)
        assert counts[5] == 64 and counts.sum() == 64
    finally:
        D.fs_pixel = orig


def test_error_distribution_is_conservative():
    # the four shares always sum to the full error, for negative too
    for err in (-4095, -17, -1, 0, 1, 15, 16, 4095):
        e = np.array([err], dtype=np.int64)
        c7 = np.floor_divide(e * 7, 16)
        c3 = np.floor_divide(e * 3, 16)
        c5 = np.floor_divide(e * 5, 16)
        c1 = e - c7 - c3 - c5
        assert (c7 + c3 + c5 + c1 == e).all()
        # shares keep the sign structure: |c1| bounded by |err|/16 + 3
        assert abs(int(c1[0])) <= abs(err) // 16 + 3

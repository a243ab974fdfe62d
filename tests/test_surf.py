"""SURF DoH kernel invariants (operators/surf.py)."""

import numpy as np

from gdal_spark.operators.surf import _doh_window


def _rand_img(seed, n=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, n)).astype(np.int64)


def test_doh_translation_equivariance():
    # shifting the image shifts the response field identically (the
    # shifted window stays clear of the roll seam by > filter support)
    for seed in (7, 23, 91):
        img = _rand_img(seed)
        sh = np.roll(np.roll(img, 2, axis=0), 2, axis=1)
        a = _doh_window(img, 10, 34)
        b = _doh_window(sh, 12, 36)  # same pixels, offset by (2, 2)
        assert np.array_equal(a, b)


def test_doh_constant_image_is_zero():
    img = np.full((30, 30), 137, dtype=np.int64)
    assert not _doh_window(img, 8, 22).any()


def test_doh_symmetry_under_transpose():
    # Dxx and Dyy swap under transpose and Dxy is symmetric, so the DoH
    # field of the transposed image is the transposed DoH field
    for seed in (3, 51):
        img = _rand_img(seed, 40)
        a = _doh_window(img, 9, 31)
        b = _doh_window(img.T.copy(), 9, 31)
        assert np.array_equal(a.T, b)


def test_integral_image_path_matches_direct_spec():
    from gdal_spark.operators.surf import _doh_window_direct

    for seed in (2, 17, 404):
        img = _rand_img(seed, 60)
        assert np.array_equal(
            _doh_window(img, 9, 51), _doh_window_direct(img, 9, 51)
        )

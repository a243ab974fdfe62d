"""Cell index, Hilbert codes, WKB codec, checksum unit tests."""

import numpy as np

from gdal_spark.kernels.cells import (
    cell_bounds,
    cell_decode,
    cell_encode,
    cell_kring,
    cell_parent,
    cells_cover_bbox,
    cells_cover_polygon,
    s2_encode,
)
from gdal_spark.kernels.checksum import checksum_image
from gdal_spark.kernels.geodesy import hilbert_d2xy, hilbert_xy2d
from gdal_spark.kernels.wkb import (
    parse_wkb,
    point_wkb,
    points_from_wkb,
    points_wkb,
    polygon_wkb,
    wkb_bbox,
    wkb_to_wkt,
    wkt_to_wkb,
)


def test_cell_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 7, 9, 15):
        cid = cell_encode(lon, lat, res)
        r, x, y = cell_decode(cid)
        assert (r == res).all()
        lon_min, lat_min, lon_max, lat_max = cell_bounds(cid)
        assert ((lon >= lon_min) & (lon <= lon_max)).all()
        assert ((lat >= lat_min - 1e-9) & (lat <= lat_max + 1e-9)).all()


def test_cell_parent_containment():
    lon = np.array([-73.98, 2.35, 139.69])
    lat = np.array([40.75, 48.86, 35.69])
    c9 = cell_encode(lon, lat, 9)
    c7 = cell_encode(lon, lat, 7)
    assert (cell_parent(c9, 7) == c7).all()


def test_kring_contains_center_and_neighbors():
    cid = int(cell_encode(np.array([10.0]), np.array([50.0]), 7)[0])
    ring0 = cell_kring(cid, 0)
    ring1 = cell_kring(cid, 1)
    assert ring0.tolist() == [cid]
    assert cid in ring1.tolist() and len(ring1) == 9


def test_cover_bbox_and_polygon():
    cover = cells_cover_bbox(-1.0, -1.0, 1.0, 1.0, 7)
    assert cover.size >= 1
    # triangle cover is a subset of its bbox cover and contains the
    # centroid cell
    tri = [np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]])]
    cov = cells_cover_polygon(tri, 7)
    bbox_cov = set(cells_cover_bbox(0.0, 0.0, 4.0, 4.0, 7).tolist())
    assert set(cov.tolist()) <= bbox_cov
    centroid = int(cell_encode(np.array([1.3]), np.array([1.3]), 7)[0])
    assert centroid in set(cov.tolist())


def test_hilbert_roundtrip_and_locality():
    order = 10
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << order, 2000)
    y = rng.integers(0, 1 << order, 2000)
    d = hilbert_xy2d(order, x, y)
    x2, y2 = hilbert_d2xy(order, d)
    assert (x2 == x).all() and (y2 == y).all()
    # bijectivity on a full small grid
    xs, ys = np.meshgrid(np.arange(8), np.arange(8))
    d8 = hilbert_xy2d(3, xs.ravel(), ys.ravel())
    assert sorted(d8.tolist()) == list(range(64))
    # adjacent d ⇒ adjacent cells (Hilbert property)
    xa, ya = hilbert_d2xy(3, np.arange(63))
    xb, yb = hilbert_d2xy(3, np.arange(1, 64))
    assert (np.abs(xa - xb) + np.abs(ya - yb) == 1).all()


def test_s2_encode_contiguity():
    lon = np.array([10.0, 10.001])
    lat = np.array([50.0, 50.001])
    d = s2_encode(lon, lat, 12)
    assert d.dtype == np.int64


def test_wkb_point_roundtrip():
    xs = np.array([1.5, -73.98])
    ys = np.array([2.5, 40.75])
    wkbs = points_wkb(xs, ys)
    x2, y2 = points_from_wkb(list(wkbs))
    assert np.allclose(x2, xs) and np.allclose(y2, ys)
    t, c = parse_wkb(point_wkb(3.0, 4.0))
    assert t == 1 and c[0].tolist() == [3.0, 4.0]


def test_wkb_polygon_and_wkt():
    wkt = "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"
    wkb = wkt_to_wkb(wkt)
    t, rings = parse_wkb(wkb)
    assert t == 3 and len(rings) == 2
    assert wkb_bbox(wkb) == (0.0, 0.0, 10.0, 10.0)
    rt = wkt_to_wkb(wkb_to_wkt(wkb))
    assert rt == wkb
    rering = polygon_wkb(rings)
    assert rering == wkb


def test_checksum_formula():
    # hand-computed: values 0..9 row-major, primes cycle 7,11,13,...
    arr = np.arange(10, dtype=np.uint8).reshape(2, 5)
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    exp = sum(v % primes[i % 11] for i, v in enumerate(range(10))) & 0xFFFF
    assert checksum_image(arr) == exp
    # float path: +0.5 floor
    arrf = np.array([[0.6, 1.4], [2.5, -0.6]], dtype=np.float64)
    # IntFromDouble: floor(v + 0.5) → [1, 1, 3, -1]; C `%` keeps the
    # dividend's sign → -1 % 17 == -1
    expf = (1 % 7 + 1 % 11 + 3 % 13 - 1) & 0xFFFF
    assert checksum_image(arrf) == expf

"""GH robustness path: shared edges, vertex-on-edge contact, and
identical rings all resolve via the deterministic micro-perturbation
to within 1e-6 of the exact closed forms."""

import numpy as np

from gdal_spark.kernels.clipgen import clip_area_robust, is_degenerate_pair


def _rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


def test_shared_edge():
    A, B = _rect(0, 0, 4, 3), _rect(4, 0, 2, 3)
    assert is_degenerate_pair(A, B)
    assert abs(clip_area_robust(A, B, "union") - 18.0) < 1e-6
    assert abs(clip_area_robust(A, B, "intersection")) < 1e-6
    assert abs(clip_area_robust(A, B, "difference") - 12.0) < 1e-6


def test_vertex_on_edge():
    A = _rect(0, 0, 6, 6)
    tri = np.array([[6, 2], [9, 1], [9, 5], [6, 2]], dtype=np.float64)
    assert is_degenerate_pair(A, tri)
    a_union = clip_area_robust(A, tri, "union")
    assert abs(a_union - (36.0 + 6.0)) < 1e-6  # triangle area 6, contact only


def test_identical_rings():
    A = _rect(1, 1, 5, 4)
    assert is_degenerate_pair(A, A)
    assert abs(clip_area_robust(A, A.copy(), "union") - 20.0) < 1e-5
    assert abs(clip_area_robust(A, A.copy(), "intersection") - 20.0) < 1e-5
    assert abs(clip_area_robust(A, A.copy(), "difference")) < 1e-5


def test_partial_collinear_overlap():
    # B's bottom edge rides along A's top edge for half its length
    A, B = _rect(0, 0, 8, 4), _rect(4, 4, 8, 3)
    assert is_degenerate_pair(A, B)
    assert abs(clip_area_robust(A, B, "union") - (32.0 + 24.0)) < 1e-6
    assert abs(clip_area_robust(A, B, "intersection")) < 1e-6


def test_general_position_untouched():
    A, B = _rect(0, 0, 4, 4), _rect(2, 2, 4, 4)
    assert not is_degenerate_pair(A, B)
    # exact — no perturbation on clean inputs
    assert clip_area_robust(A, B, "intersection") == 4.0
    assert clip_area_robust(A, B, "union") == 28.0


def test_sql_surface_handles_degenerate(spark):
    """ST_ClipArea / ST_RelationGeneral route degenerate pairs through
    the exact noder — shared-edge WKB inputs through the SQL surface."""
    import pyspark.sql.functions as F

    from gdal_spark.functions.st import register_st_functions, st_clip_area
    from gdal_spark.kernels import wkb as W
    from gdal_spark.session import local_df

    register_st_functions(spark)
    A = W.polygon_wkb([_rect(0, 0, 4, 3)])
    B = W.polygon_wkb([_rect(4, 0, 2, 3)])
    df = local_df(spark, [(A, B)], "a binary, b binary")
    row = df.select(
        st_clip_area(F.col("a"), F.col("b"), F.lit("union")).alias("u"),
        st_clip_area(F.col("a"), F.col("b"), F.lit("intersection")).alias("i"),
    ).collect()[0]
    assert row["u"] == 18.0 and row["i"] == 0.0


def test_general_position_stays_on_float_path(monkeypatch):
    """Routing contract (round-3 verdict #6): general-position pairs must
    take the fast GH float path — the exact rational noder is the
    degenerate/geometry-emission route ONLY.  Monkeypatch the noder to
    explode; clip_area_robust on a general-position concave pair must
    never reach it."""
    import numpy as np

    import gdal_spark.kernels.arrangement as arr

    def _boom(*a, **k):  # pragma: no cover - reached only on regression
        raise AssertionError("exact noder invoked on a general-position pair")

    monkeypatch.setattr(arr, "overlay_area_exact", _boom)
    P = np.array([[0, 0], [7, 1], [9, 6], [4, 3], [1, 7], [0, 0]], dtype=np.float64)
    Q = P[:, ::-1] * np.array([1.0, 1.0]) + np.array([0.5, 0.25])
    Q = np.ascontiguousarray(Q)
    assert not is_degenerate_pair(P, Q)
    for op in ("intersection", "union", "difference"):
        clip_area_robust(P, Q, op)  # must not raise

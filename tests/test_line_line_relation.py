"""Multi-segment / closed-line cases for line_line_relation — the
parts the q796 single-segment oracle fixture cannot exercise:
coverage across SEVERAL collinear segments, interior VERTICES (a
polyline's bend points are interior, not boundary), and the closed-
line rule (a ring's boundary is empty, so even its start vertex is
interior)."""

import numpy as np

from gdal_spark.functions.st import line_line_relation


def _r(a, b):
    return line_line_relation(np.array(a, float), np.array(b, float))


def test_cross_at_interior_vertices():
    # both polylines bend exactly at the shared point: vertex-to-
    # vertex contact, but both vertices are INTERIOR -> crosses
    a = [[0, 0], [2, 2], [4, 0]]
    b = [[0, 4], [2, 2], [4, 4]]
    assert _r(a, b) == "crosses"


def test_touch_at_endpoint_vs_interior_vertex():
    # A's endpoint lands on B's bend vertex: boundary-of-A meets
    # interior-of-B -> touches
    a = [[2, 2], [5, 5]]
    b = [[0, 4], [2, 2], [4, 0], [6, 0]]
    assert _r(a, b) == "touches"


def test_within_across_multiple_segments():
    # A spans two of B's collinear segments: coverage must UNION
    # sub-intervals from separate segments
    a = [[1, 0], [5, 0]]
    b = [[0, 0], [3, 0], [6, 0], [6, 3]]
    assert _r(a, b) == "within"


def test_contains_multi_segment_sub_line():
    a = [[0, 0], [4, 0], [4, 4]]
    b = [[1, 0], [4, 0], [4, 2]]
    assert _r(a, b) == "contains"


def test_equals_reversed_and_resegmented():
    # same point set, opposite direction, different vertex split
    a = [[0, 0], [4, 0]]
    b = [[4, 0], [2, 0], [0, 0]]
    assert _r(a, b) == "equals"


def test_closed_ring_vertex_contact_is_interior():
    # segment endpoint touching a RING's start vertex: the ring has
    # empty boundary, so the contact point is interior-of-ring but
    # boundary-of-segment -> touches; pushing the segment THROUGH
    # the vertex (endpoint strictly inside... still endpoint) stays
    # touches, while crossing an edge properly is crosses
    ring = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    assert _r([[-1, -1], [0, 0]], ring) == "touches"
    assert _r([[2, -1], [2, 1]], ring) == "crosses"


def test_overlap_partial_multi_segment():
    a = [[0, 0], [3, 0]]
    b = [[2, 0], [6, 0], [6, 2]]
    assert _r(a, b) == "overlaps"


def test_disjoint_parallel():
    assert _r([[0, 0], [4, 0]], [[0, 1], [4, 1]]) == "disjoint"


def test_crosses_through_interior_vertex_of_one():
    # B passes straight through A's bend: the contact is interior
    # to both -> crosses (0-dim)
    a = [[0, 0], [2, 2], [4, 0]]
    b = [[2, 0], [2, 4]]
    assert _r(a, b) == "crosses"

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


# --- property: relation symmetry under argument swap --------------------------


def _rand_polyline(seed, npts):
    """Deterministic integer polyline from a splitmix-style hash."""
    pts = []
    x = y = 0
    s = seed
    for _ in range(npts):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        x += (s >> 5) % 7 - 3
        y += (s >> 11) % 7 - 3
        if not pts or pts[-1] != [x, y]:
            pts.append([x, y])
    return pts if len(pts) >= 2 else [[0, 0], [1, 0]]


def test_swap_symmetry_sweep():
    """equals/crosses/overlaps/touches/disjoint are symmetric;
    contains and within swap into each other — over 200 random
    integer polyline pairs (including forced-overlap cases)."""
    swap = {"contains": "within", "within": "contains"}
    classes = set()
    for seed in range(200):
        a = _rand_polyline(seed, 4)
        b = _rand_polyline(seed + 991, 4)
        if seed % 5 == 0:
            # force shared geometry so overlap/containment classes
            # actually occur in the sweep
            b = a[1:] + [[a[-1][0] + 2, a[-1][1]]]
        ra = _r(a, b)
        rb = _r(b, a)
        assert rb == swap.get(ra, ra), (seed, ra, rb)
        classes.add(ra)
    # the sweep must genuinely exercise multiple relation classes
    assert len(classes) >= 4, classes

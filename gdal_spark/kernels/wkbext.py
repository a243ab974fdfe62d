"""Curve and Z/M geometry WKB support — the ogr_core.h:422-533 type
surface beyond 2D Point/LineString/Polygon/Multi*:

- ISO Z / M / ZM variants (type code + 1000/2000/3000) for Point,
  LineString, Polygon — parsed with the right coordinate stride;
- CircularString (8), CompoundCurve (9), CurvePolygon (10) — parsed
  and LINEARIZED, mirroring the reference's read-time linearization
  (OGRGeometryFactory::curveToLineString / forceTo*,
  ogr/ogrgeometryfactory.cpp): every curve consumer in GDAL's
  rasterize/overlay path linearizes first (alg/gdalrasterize.cpp:571
  "linearize curves").

Pinned linearization semantics (deterministic, oracle-checkable):
each CircularString arc (p0, p1, p2) splits at its DEFINING points —
p0, p1, p2 are always emitted verbatim — and each half-arc (p0→p1,
p1→p2) is subdivided into ceil(half_sweep / max_angle) equal angular
steps.  With max_angle ≥ the half-arc sweep the output is exactly the
integer defining points (the oracle case); finer steps add
center + R·(cos θ, sin θ) samples (property-tested, not oracled —
transcendental vertices).  Collinear triplets degrade to straight
segments, as in the reference.
"""

from __future__ import annotations

import math
import struct

import numpy as np

CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON = 8, 9, 10
POLYHEDRALSURFACE, TIN, TRIANGLE = 15, 16, 17

_DIM_NAMES = {0: "xy", 1: "xyz", 2: "xym", 3: "xyzm"}


def _dims_of(code: int) -> tuple[int, str]:
    flavor = code // 1000
    ncoord = 2 + (1 if flavor in (1, 2) else 2 if flavor == 3 else 0)
    return ncoord, _DIM_NAMES.get(flavor, "xy")


def parse_ext(wkb: bytes):
    """→ (base_type, dims, parts): Z/M-aware, curve-aware parse.
    parts: POINT/LINESTRING/CIRCULARSTRING → (N, ncoord) array;
    POLYGON → [rings]; COMPOUNDCURVE → [(type, coords)];
    CURVEPOLYGON → [[(type, coords), …] per ring]."""
    t, d, parts, _ = _parse(memoryview(wkb), 0)
    return t, d, parts


def _parse(buf: memoryview, off: int):
    little = buf[off] == 1
    fmt = "<" if little else ">"
    code = struct.unpack_from(fmt + "I", buf, off + 1)[0]
    base = code % 1000
    ncoord, dims = _dims_of(code)
    off += 5
    if base == 1:  # point
        vals = struct.unpack_from(fmt + "d" * ncoord, buf, off)
        return base, dims, np.array([vals]), off + 8 * ncoord
    if base in (2, CIRCULARSTRING):  # linestring / circularstring
        n = struct.unpack_from(fmt + "I", buf, off)[0]
        coords = np.frombuffer(
            buf, dtype=fmt + "f8", count=ncoord * n, offset=off + 4
        )
        return base, dims, coords.reshape(n, ncoord).copy(), off + 4 + 8 * ncoord * n
    if base in (3, TRIANGLE):  # polygon / triangle (same ring layout)
        nr = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(fmt + "I", buf, off)[0]
            coords = np.frombuffer(
                buf, dtype=fmt + "f8", count=ncoord * n, offset=off + 4
            )
            rings.append(coords.reshape(n, ncoord).copy())
            off += 4 + 8 * ncoord * n
        return base, dims, rings, off
    if base in (POLYHEDRALSURFACE, TIN):  # count + full patch WKBs
        n = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        patches = []
        for _ in range(n):
            t, _d, p, off = _parse(buf, off)
            patches.append((t, p))
        return base, dims, patches, off
    if base == COMPOUNDCURVE:
        n = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        segs = []
        for _ in range(n):
            t, _d, p, off = _parse(buf, off)
            segs.append((t, p))
        return base, dims, segs, off
    if base == CURVEPOLYGON:
        nr = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            t, _d, p, off = _parse(buf, off)
            rings.append([(t, p)] if t != COMPOUNDCURVE else p)
        return base, dims, rings, off
    raise ValueError(f"unsupported extended WKB type {code}")


# --- fixture builders ------------------------------------------------------


def linestring_zm_wkb(coords: np.ndarray, flavor: int = 3) -> bytes:
    """coords (N, 2+k) → ISO LineString Z/M/ZM WKB (flavor 1=Z, 2=M, 3=ZM)."""
    coords = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, 2 + 1000 * flavor, coords.shape[0]) + coords.tobytes()


def circularstring_wkb(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    return struct.pack("<BII", 1, CIRCULARSTRING, pts.shape[0]) + pts.tobytes()


def curvepolygon_wkb(ring_curves: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, CURVEPOLYGON, len(ring_curves)) + b"".join(
        ring_curves
    )


def polygon_z_wkb(rings: list[np.ndarray], base: int = 3) -> bytes:
    """rings [(N, 3)] → ISO Polygon Z (or Triangle Z with base=17) WKB."""
    out = [struct.pack("<BII", 1, base + 1000, len(rings))]
    for r in rings:
        r = np.asarray(r, dtype="<f8")
        out.append(struct.pack("<I", r.shape[0]) + r.tobytes())
    return b"".join(out)


def polyhedralsurface_wkb(patches: list[bytes], tin: bool = False) -> bytes:
    """Full patch WKBs → PolyhedralSurface Z / TIN Z WKB
    (ogr_core.h:441-447 wkbPolyhedralSurface=15 / wkbTIN=16; patch
    list layout per OGRPolyhedralSurface::exportToWkb,
    ogr/ogrpolyhedralsurface.cpp)."""
    code = (TIN if tin else POLYHEDRALSURFACE) + 1000
    return struct.pack("<BII", 1, code, len(patches)) + b"".join(patches)


def surface_stats(wkb: bytes):
    """(n_patches, n_points, area) for PolyhedralSurface/TIN.

    Area = Σ patch areas, each the planar-polygon area in 3D
    (0.5·‖Σ rᵢ × rᵢ₊₁‖ over the outer ring, holes subtracted) — the
    reference's OGRPolyhedralSurface::get_Area sums patch get_Area
    (ogr/ogrpolyhedralsurface.cpp); axis-aligned integer faces make
    it exact."""
    t, dims, patches = parse_ext(wkb)
    if t not in (POLYHEDRALSURFACE, TIN):
        raise ValueError("surface_stats: not a surface type")
    n_pts = 0
    area = 0.0
    for _pt, rings in patches:
        for k, ring in enumerate(rings):
            n_pts += ring.shape[0]
            r = ring[:, :3] if ring.shape[1] >= 3 else np.column_stack(
                [ring, np.zeros(ring.shape[0])]
            )
            cr = np.cross(r[:-1], r[1:]).sum(axis=0)
            a = 0.5 * math.sqrt(float((cr * cr).sum()))
            area += a if k == 0 else -a
    return len(patches), n_pts, area


# --- linearization ---------------------------------------------------------


def _circumcenter(p0, p1, p2):
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    return ux, uy


def _arc_points(p0, p1, p2, max_angle_deg: float):
    """Linearize one arc triplet; returns points INCLUDING p0, p1, p2
    verbatim, excluding nothing (caller drops duplicates at joins)."""
    c = _circumcenter(p0, p1, p2)
    if c is None:
        return [tuple(p0), tuple(p1), tuple(p2)]
    ux, uy = c
    r = math.hypot(p0[0] - ux, p0[1] - uy)
    a0 = math.atan2(p0[1] - uy, p0[0] - ux)
    a1 = math.atan2(p1[1] - uy, p1[0] - ux)
    a2 = math.atan2(p2[1] - uy, p2[0] - ux)

    def sweep(fr, to, positive):
        s = to - fr
        if positive and s < 0:
            s += 2 * math.pi
        if not positive and s > 0:
            s -= 2 * math.pi
        return s

    # orientation: the arc runs p0→p1→p2; pick the direction that
    # reaches a1 before a2
    pos = sweep(a0, a1, True) <= sweep(a0, a2, True)
    out = [tuple(p0)]
    for fr, frang, toang, endpt in ((p0, a0, a1, p1), (p1, a1, a2, p2)):
        s = sweep(frang, toang, pos)
        nseg = max(int(math.ceil(abs(s) / math.radians(max_angle_deg))), 1)
        for k in range(1, nseg):
            th = frang + s * (k / nseg)
            out.append((ux + r * math.cos(th), uy + r * math.sin(th)))
        out.append(tuple(endpt))
    return out


def _linearize_curve(t, coords, max_angle_deg):
    if t == 2:  # plain linestring segment
        return [tuple(p) for p in coords[:, :2]]
    pts: list = []
    arr = coords[:, :2]
    for i in range(0, arr.shape[0] - 2, 2):
        seg = _arc_points(arr[i], arr[i + 1], arr[i + 2], max_angle_deg)
        if pts:
            seg = seg[1:]
        pts.extend(seg)
    return pts


def linearize_wkb(wkb: bytes, max_angle_deg: float = 90.0) -> bytes:
    """CircularString → LineString; CurvePolygon/CompoundCurve →
    Polygon/LineString with all arcs linearized.  Z/M geometries pass
    through with coordinates truncated to 2D (force2D + linearize, the
    read-path normalization every 2D operator expects)."""
    from gdal_spark.kernels import wkb as W

    t, dims, parts = parse_ext(wkb)
    if t == 1:
        return W.point_wkb(float(parts[0, 0]), float(parts[0, 1]))
    if t == 2:
        return W.linestring_wkb(parts[:, :2])
    if t == 3:
        return W.polygon_wkb([r[:, :2] for r in parts])
    if t == CIRCULARSTRING:
        return W.linestring_wkb(np.array(_linearize_curve(t, parts, max_angle_deg)))
    if t == COMPOUNDCURVE:
        pts: list = []
        for ct, cp in parts:
            seg = _linearize_curve(ct, cp, max_angle_deg)
            if pts:
                seg = seg[1:]
            pts.extend(seg)
        return W.linestring_wkb(np.array(pts))
    if t == CURVEPOLYGON:
        rings = []
        for ring in parts:
            pts = []
            for ct, cp in ring:
                seg = _linearize_curve(ct, cp, max_angle_deg)
                if pts:
                    seg = seg[1:]
                pts.extend(seg)
            rings.append(np.array(pts))
        return W.polygon_wkb(rings)
    raise ValueError(f"cannot linearize type {t}")


def zm_stats(wkb: bytes):
    """(npoints, z_sum, m_sum) for a Z/M/ZM geometry (None when the
    dimension is absent)."""
    t, dims, parts = parse_ext(wkb)
    if t == 3:
        coords = np.vstack(parts)
    elif isinstance(parts, np.ndarray):
        coords = parts
    else:
        raise ValueError("zm_stats: unsupported type")
    n = coords.shape[0]
    zi = 2 if "z" in dims else None
    mi = (3 if dims == "xyzm" else 2) if "m" in dims else None
    zs = float(coords[:, zi].sum()) if zi is not None else None
    ms = float(coords[:, mi].sum()) if mi is not None else None
    return n, zs, ms

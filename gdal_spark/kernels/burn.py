"""Rasterize ("burn") kernels — scanline polygon fill, Bresenham line,
point burn — operating on one tile's NumPy buffer.

Faithful re-statement of the reference semantics (NOT a copy):

- Polygon fill rule: reference ``GDALdllImageFilledPolygon``
  (alg/llrasterize.cpp:58-227).  A pixel is inside iff its *center*
  (row test height ``dy = y + 0.5``) is inside the polygon; an edge
  contributes a crossing iff ``dy1 <= dy < dy2`` (half-open);
  intersection x is rounded ``floor(x + 0.5)``; sorted intersections
  are burned as inclusive runs ``[x_i, x_{i+1} - 1]``.  Bottom
  horizontal segments (vertex order x-decreasing) are filled
  separately, top horizontals skipped; under MERGE_ADD the horizontal
  runs are deduplicated against the regular runs
  (llrasterize.cpp:160-175, 195-226).

- Line rule: reference ``GDALdllImageLine`` (alg/llrasterize.cpp:255-384)
  — integer Bresenham on ``floor(coord)`` endpoints, intermediate
  segment endpoints burned once (end point skipped unless final
  segment).

- Value conversion: reference ``GDALCopyWord`` — round ``floor(v+0.5)``
  then clamp to the target dtype's range (so burn 256 → 255 on uint8,
  -1 → 0), and MERGE_ADD accumulates in double then converts
  (alg/gdalrasterize.cpp:70-125).

- ALL_TOUCHED line walk: reference ``GDALdllImageLineAllTouched``
  (alg/llrasterize.cpp:407+) — every pixel the segment passes through.

World→pixel uses the 6-coefficient geotransform inverse
(gcore/gdal_geotransform.h:27-63).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "copy_word",
    "world_to_pixel",
    "fill_polygon_runs",
    "burn_polygon",
    "burn_line",
    "burn_points",
    "burn_all_touched_line",
]

_INT_MIN = -2147483648.0
_INT_MAX = 2147483647.0


def copy_word(values: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """double → target dtype with GDALCopyWord rounding + clamping."""
    values = np.asarray(values, dtype=np.float64)
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        v = np.floor(values + 0.5)
        v = np.clip(v, info.min, info.max)
        return v.astype(dtype)
    return values.astype(dtype)


def world_to_pixel(
    xs: np.ndarray, ys: np.ndarray, gt: tuple[float, ...]
) -> tuple[np.ndarray, np.ndarray]:
    """Invert the affine geotransform (x0, xs, xr, y0, yr, ys)."""
    x0, xscale, xrot, y0, yrot, yscale = gt
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    det = xscale * yscale - xrot * yrot
    if det == 0:
        raise ValueError("non-invertible geotransform")
    dx = xs - x0
    dy = ys - y0
    px = (dx * yscale - dy * xrot) / det
    py = (dy * xscale - dx * yrot) / det
    return px, py


def fill_polygon_runs(
    nx: int,
    ny: int,
    parts: list[np.ndarray],
    avoid_same_points: bool = False,
):
    """Yield inclusive scanline runs ``(y, x0, x1)`` for a multi-ring
    polygon in *pixel* coordinates.

    ``parts`` — list of (M, 2) arrays (x, y pixel coords per ring).
    When ``avoid_same_points`` (MERGE_ADD), bottom-horizontal runs that
    coincide with a regular run are suppressed, mirroring
    llrasterize.cpp:195-226.
    """
    if not parts:
        return
    allx = np.concatenate([p[:, 0] for p in parts])
    ally = np.concatenate([p[:, 1] for p in parts])
    if allx.size == 0:
        return
    dminy = ally.min()
    dmaxy = ally.max()
    miny = int(max(0.0, dminy))
    maxy = int(min(dmaxy, ny - 1))
    maxx = nx - 1

    # Per-part edge arrays: edge i joins vertex i-1 → i, plus the
    # closing edge last → first (llrasterize.cpp:101-129).
    ex1, ey1, ex2, ey2 = [], [], [], []
    for p in parts:
        p = np.asarray(p, dtype=np.float64)
        prev = np.roll(p, 1, axis=0)  # edge[0] = (last, first)
        ex1.append(prev[:, 0])
        ey1.append(prev[:, 1])
        ex2.append(p[:, 0])
        ey2.append(p[:, 1])
    ex1 = np.concatenate(ex1)
    ey1 = np.concatenate(ey1)
    ex2 = np.concatenate(ex2)
    ey2 = np.concatenate(ey2)

    # Orient non-horizontal edges so y1 < y2, remembering the x that
    # goes with each end (llrasterize.cpp:137-152).
    horiz = ey1 == ey2
    swap = ey1 > ey2
    lo_y = np.where(swap, ey2, ey1)
    hi_y = np.where(swap, ey1, ey2)
    lo_x = np.where(swap, ex2, ex1)
    hi_x = np.where(swap, ex1, ex2)

    # Bottom horizontals: vertex order x-decreasing (x1 > x2).
    bottom = horiz & (ex1 > ex2)
    bh_x1 = np.floor(ex2[bottom] + 0.5)
    bh_x2 = np.floor(ex1[bottom] + 0.5)
    bh_y = ey1[bottom]

    nh_mask = ~horiz
    lo_y = lo_y[nh_mask]
    hi_y = hi_y[nh_mask]
    lo_x = lo_x[nh_mask]
    hi_x = hi_x[nh_mask]
    inv_dy = np.zeros_like(lo_y)
    nz = hi_y != lo_y
    inv_dy[nz] = 1.0 / (hi_y[nz] - lo_y[nz])

    for y in range(miny, maxy + 1):
        dy = y + 0.5
        # Regular crossings: dy1 <= dy < dy2 (half-open).
        m = (dy >= lo_y) & (dy < hi_y)
        if np.any(m):
            intersect = (dy - lo_y[m]) * (hi_x[m] - lo_x[m]) * inv_dy[m] + lo_x[m]
            intersect = np.clip(intersect, _INT_MIN, _INT_MAX)
            xi = np.sort(np.floor(intersect + 0.5).astype(np.int64))
        else:
            xi = np.empty(0, dtype=np.int64)

        # Bottom horizontal segments, burned separately.  The straddle
        # skip (`both < dy or both > dy` ⇒ continue) means a horizontal
        # edge is processed only on the one scanline whose center
        # height equals its y exactly (llrasterize.cpp:133-135, 155).
        hm = bh_y == dy
        h_runs = []
        if np.any(hm):
            h1 = bh_x1[hm]
            h2 = bh_x2[hm]
            keep = ~((h1 > maxx) | (h2 <= 0))
            h1 = np.maximum(h1[keep], 0.0).astype(np.int64)
            h2 = np.minimum(h2[keep], float(nx)).astype(np.int64)
            order = np.lexsort((h2, h1))
            h_runs = list(zip(h1[order], h2[order]))

        if not avoid_same_points:
            for hx1, hx2 in h_runs:
                if hx1 <= maxx and hx2 > 0:
                    yield (y, int(hx1), int(hx2) - 1)
        for i in range(0, xi.size - 1, 2):
            if xi[i] <= maxx and xi[i + 1] > 0:
                yield (y, int(xi[i]), int(xi[i + 1]) - 1)
        if avoid_same_points and h_runs:
            i = 0
            for hx1, hx2 in h_runs:
                if hx1 <= maxx and hx2 > 0:
                    while i + 1 < xi.size and xi[i] < hx1:
                        i += 2
                    if i + 1 >= xi.size or xi[i] != hx1:
                        yield (y, int(hx1), int(hx2) - 1)


def _burn_run(
    arr: np.ndarray,
    y: int,
    x0: int,
    x1: int,
    value: float,
    merge_add: bool,
    visited: set | None,
) -> None:
    nx = arr.shape[1]
    if x0 > x1 or x0 >= nx or x1 < 0:
        return
    x0 = max(x0, 0)
    x1 = min(x1, nx - 1)
    if merge_add:
        if visited is not None:
            xs = np.arange(x0, x1 + 1)
            keys = (y << 32) | xs
            fresh = np.array([k not in visited for k in keys.tolist()], dtype=bool)
            xs = xs[fresh]
            if xs.size == 0:
                return
            acc = arr[y, xs].astype(np.float64) + value
            arr[y, xs] = copy_word(acc, arr.dtype)
        else:
            acc = arr[y, x0 : x1 + 1].astype(np.float64) + value
            arr[y, x0 : x1 + 1] = copy_word(acc, arr.dtype)
    else:
        arr[y, x0 : x1 + 1] = copy_word(np.float64(value), arr.dtype)


def burn_polygon(
    arr: np.ndarray,
    parts: list[np.ndarray],
    value: float,
    merge_add: bool = False,
) -> None:
    """Burn a polygon (pixel-space rings) into ``arr`` in place."""
    ny, nx = arr.shape
    for y, x0, x1 in fill_polygon_runs(nx, ny, parts, avoid_same_points=merge_add):
        _burn_run(arr, y, x0, x1, value, merge_add, None)


def burn_line(
    arr: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    value: float,
    merge_add: bool = False,
    visited: set | None = None,
) -> None:
    """Bresenham burn of one linestring (pixel coords), reference
    GDALdllImageLine semantics (llrasterize.cpp:255-384)."""
    ny, nx = arr.shape
    # The reference collects LineString vertices in REVERSE order
    # (GDALCollectRingsFromGeometry, alg/gdalrasterize.cpp wkbLineString
    # branch: `for i = nCount-1; i >= 0; i--`), so lines burn from the
    # last vertex backwards — this flips the Bresenham tie-break phase
    # and is what makes rasterize_1's checksum 6452, not 6443.
    xs = np.asarray(xs, dtype=np.float64)[::-1]
    ys = np.asarray(ys, dtype=np.float64)[::-1]
    npts = xs.size
    track = visited if (merge_add and visited is not None) else None
    for j in range(1, npts):
        dfx, dfy = xs[j - 1], ys[j - 1]
        dfx_end, dfy_end = xs[j], ys[j]
        if (
            (dfy < 0 and dfy_end < 0)
            or (dfy > ny and dfy_end > ny)
            or (dfx < 0 and dfx_end < 0)
            or (dfx > nx and dfx_end > nx)
        ):
            continue
        ix = int(np.floor(dfx))
        iy = int(np.floor(dfy))
        ix1 = int(np.floor(dfx_end))
        iy1 = int(np.floor(dfy_end))
        ndx = abs(ix1 - ix)
        ndy = abs(iy1 - iy)
        xstep = -1 if ix > ix1 else 1
        ystep = -1 if iy > iy1 else 1
        last_seg = j == npts - 1
        if ndx >= ndy:
            xerr = ndy << 1
            yerr = xerr - (ndx << 1)
            err = xerr - ndx
            n = ndx if last_seg else ndx - 1
            while n >= 0:
                n -= 1
                if 0 <= ix < nx and 0 <= iy < ny:
                    _burn_pt(arr, iy, ix, value, merge_add, track)
                ix += xstep
                if err > 0:
                    iy += ystep
                    err += yerr
                else:
                    err += xerr
        else:
            xerr = ndx << 1
            yerr = xerr - (ndy << 1)
            err = xerr - ndy
            n = ndy if last_seg else ndy - 1
            while n >= 0:
                n -= 1
                if 0 <= ix < nx and 0 <= iy < ny:
                    _burn_pt(arr, iy, ix, value, merge_add, track)
                iy += ystep
                if err > 0:
                    ix += xstep
                    err += yerr
                else:
                    err += xerr


def _burn_pt(arr, iy, ix, value, merge_add, visited):
    if visited is not None:
        key = (iy << 32) | ix
        if key in visited:
            return
        visited.add(key)
    if merge_add:
        acc = float(arr[iy, ix]) + value
        arr[iy, ix] = copy_word(np.float64(acc), arr.dtype)
    else:
        arr[iy, ix] = copy_word(np.float64(value), arr.dtype)


def burn_points(
    arr: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    value: float,
    merge_add: bool = False,
) -> None:
    """Burn points (pixel coords): truncate to int, in-bounds only
    (GDALdllImagePoint, llrasterize.cpp:233-250).  Vectorized; ADD mode
    accumulates multiplicities via bincount (distinct features revisit
    the same pixel → each adds, matching per-feature burn order because
    addition commutes)."""
    ny, nx = arr.shape
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    m = (xs >= 0) & (xs < nx) & (ys >= 0) & (ys < ny)
    ixs = xs[m].astype(np.int64)
    iys = ys[m].astype(np.int64)
    if ixs.size == 0:
        return
    flat = iys * nx + ixs
    if merge_add:
        counts = np.bincount(flat, minlength=nx * ny).reshape(ny, nx)
        acc = arr.astype(np.float64) + counts * value
        np.copyto(arr, copy_word(acc, arr.dtype), where=counts > 0)
    else:
        uniq = np.unique(flat)
        arr.reshape(-1)[uniq] = copy_word(np.float64(value), arr.dtype)


def burn_all_touched_line(
    arr: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    value: float,
    merge_add: bool = False,
    visited: set | None = None,
) -> None:
    """ALL_TOUCHED variant: burn every pixel the segment touches
    (semantics of GDALdllImageLineAllTouched, llrasterize.cpp:407+):
    walk the segment cell-by-cell crossing vertical/horizontal pixel
    boundaries in order."""
    ny, nx = arr.shape
    # Same vertex-order reversal as burn_line (see note there).
    xs = np.asarray(xs, dtype=np.float64)[::-1]
    ys = np.asarray(ys, dtype=np.float64)[::-1]
    track = visited if (merge_add and visited is not None) else None
    for j in range(1, xs.size):
        x0, y0, x1, y1 = xs[j - 1], ys[j - 1], xs[j], ys[j]
        if (y0 < 0 and y1 < 0) or (y0 >= ny and y1 >= ny):
            continue
        if (x0 < 0 and x1 < 0) or (x0 >= nx and x1 >= nx):
            continue
        # Amanatides-Woo style grid traversal.
        dx, dy = x1 - x0, y1 - y0
        n_steps = int(np.ceil(max(abs(dx), abs(dy)))) * 2 + 1
        ts = np.linspace(0.0, 1.0, max(n_steps, 2))
        cx = np.floor(x0 + ts * dx).astype(np.int64)
        cy = np.floor(y0 + ts * dy).astype(np.int64)
        seen_local = set()
        for ix, iy in zip(cx.tolist(), cy.tolist()):
            if (ix, iy) in seen_local:
                continue
            seen_local.add((ix, iy))
            if 0 <= ix < nx and 0 <= iy < ny:
                _burn_pt(arr, iy, ix, value, merge_add, track)

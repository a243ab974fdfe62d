"""Wang et al. viewshed — the reference's EXACT recurrence
(ViewshedExecutor, alg/viewshed/viewshed_executor.cpp), closing the
round-1/2 "pinned LOS, not Wang-exact" parity note.

Pinned semantics (observer inside the raster, no curvature, no max
distance, CellMode::Edge — every default of the reference):

  - heights adjust to H = DEM − (observer_z + DEM[observer])
    (viewshed_executor.cpp:492-494, adjustHeight :442);
  - observer row (first line): the two adjacent cells are marked
    visible WITHOUT a surface update (:600-616, :825-840), farther
    cells need dfZ = cur[prev_toward_observer]·n/(n−1)
    (CalcHeightLine :61);
  - every other line, center pixel first: dfZ = cur (|Δy|=1) else
    prev[ox]·n/(n−1) (processLine :~590);
  - off-center pixels, outward sweep (left then right, each
    sequential because the Edge rule reads the already-UPDATED
    same-line neighbor toward the observer):
      Δx == Δy  : dfZ = cur[pix] (Δy==1) else prev[diag]·n/(n−1)
                  (CalcHeightLine two-arg :72)
      Δx  > Δy  : dfZ = (prev[toward]·Δy + cur[toward]·(Δx−Δy))/(Δx−1)
                  (CalcHeightEdge :94 via doEdge :107)
      Δx  < Δy  : dfZ = (prev[toward]·Δx + prev[pix]·(Δy−Δx))/(Δy−1)
  - visibility: cell is invisible iff H + target_h < dfZ
    (setOutputNormal :228-244, strict <), then the blocking surface
    propagates: cur[pix] = max(cur[pix], dfZ);
  - both scan directions chain independently from the first line's
    updated surface (run :~1080).
"""

from __future__ import annotations

import numpy as np

VISIBLE, INVISIBLE = 255.0, 0.0


def _setout(cur, res, i, dfz, th):
    res[i] = INVISIBLE if (cur[i] + th) < dfz else VISIBLE
    if dfz > cur[i]:
        cur[i] = dfz


def _first_line(H_row: np.ndarray, ox: int, th: float):
    nx = H_row.shape[0]
    cur = H_row.copy()
    res = np.empty(nx)
    res[ox] = VISIBLE
    if ox - 1 >= 0:
        res[ox - 1] = VISIBLE  # adjacent: visible, surface NOT updated
    for pix in range(ox - 2, -1, -1):
        n = ox - pix
        _setout(cur, res, pix, cur[pix + 1] * n / (n - 1), th)
    if ox + 1 < nx:
        res[ox + 1] = VISIBLE
    for pix in range(ox + 2, nx):
        n = pix - ox
        _setout(cur, res, pix, cur[pix - 1] * n / (n - 1), th)
    return cur, res


def _process_line(H_row: np.ndarray, prev: np.ndarray, ox: int, nY: int, th: float):
    nx = H_row.shape[0]
    cur = H_row.copy()
    res = np.empty(nx)
    # center pixel
    dfz = cur[ox] if nY == 1 else prev[ox] * nY / (nY - 1)
    _setout(cur, res, ox, dfz, th)
    for pix in range(ox - 1, -1, -1):  # left sweep
        nX = ox - pix
        if nX == nY:
            dfz = cur[pix] if nY == 1 else prev[pix + 1] * nY / (nY - 1)
        elif nX > nY:
            dfz = (prev[pix + 1] * nY + cur[pix + 1] * (nX - nY)) / (nX - 1)
        else:
            dfz = (prev[pix + 1] * nX + prev[pix] * (nY - nX)) / (nY - 1)
        _setout(cur, res, pix, dfz, th)
    for pix in range(ox + 1, nx):  # right sweep
        nX = pix - ox
        if nX == nY:
            dfz = cur[pix] if nY == 1 else prev[pix - 1] * nY / (nY - 1)
        elif nX > nY:
            dfz = (prev[pix - 1] * nY + cur[pix - 1] * (nX - nY)) / (nX - 1)
        else:
            dfz = (prev[pix - 1] * nX + prev[pix] * (nY - nX)) / (nY - 1)
        _setout(cur, res, pix, dfz, th)
    return cur, res


def viewshed_wang(
    dem: np.ndarray, ox: int, oy: int, obs_z: float = 0.0, target_h: float = 0.0
) -> np.ndarray:
    """Full-raster Wang viewshed (255 visible / 0 invisible)."""
    H = np.asarray(dem, dtype=np.float64) - (float(obs_z) + float(dem[oy, ox]))
    ny, nx = H.shape
    out = np.empty((ny, nx))
    first_cur, first_res = _first_line(H[oy], ox, target_h)
    out[oy] = first_res
    for direction in (-1, 1):
        prev = first_cur.copy()
        k = 1
        while True:
            y = oy + direction * k
            if not 0 <= y < ny:
                break
            prev, res = _process_line(H[y], prev, ox, k, target_h)
            out[y] = res
            k += 1
    return out

"""Interval-spec raster reclassification (``gdal raster reclassify``).

Re-creates the VRT Reclassifier mapping language
(frmts/vrt/vrtreclassifier.cpp — Interval::Parse:33, Init:202,
Finalize:165, Reclassify:397) faithfully:

- mappings ``FROM=TO`` separated by ``;``
- FROM is a constant, ``[a,b]`` / ``(a,b)`` / mixed interval with
  ``-inf``/``inf`` bounds, ``NO_DATA`` (the nodata value as a constant
  interval), ``NAN``, or ``DEFAULT``
- TO is a number, ``NO_DATA`` (alias for the nodata value) or
  ``PASS_THROUGH`` (keep the source value)
- open bounds are realized by ``nextafter`` exactly as the reference
  does (vrtreclassifier.cpp:148-155), so every interval is closed and
  a plain ``BETWEEN`` afterwards
- intervals are sorted by lower bound and must not overlap
  (Finalize) — which makes the ordered first-match CASE chain
  equivalent to the reference's binary search

Apply is a pure JVM Column (chained ``when`` over the bounded,
non-overlapping interval list): at 100 TB it is one codegen projection
per tile scan — no join, no Python, no shuffle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class Mapping:
    # closed intervals, sorted by lo: (lo, hi, dst); dst None = PASS_THROUGH
    intervals: list[tuple[float, float, float | None]] = field(
        default_factory=list
    )
    nan_value: float | None = None  # NaN source mapping (NaN = pass through)
    nan_set: bool = False
    default_value: float | None = None
    default_pass_through: bool = False


def _parse_interval(tok: str, nodata: float | None):
    """One FROM token → closed (lo, hi).  Mirrors Interval::Parse."""
    s = tok.strip()
    if s[:1] in "([":
        lo_inc = s[0] == "["
        body = s[1:]
        if body.rstrip()[-1:] not in ")]":
            raise ValueError(f"interval must end with ')' or ']': {tok!r}")
        hi_inc = body.rstrip()[-1] == "]"
        inner = body.rstrip()[:-1]
        parts = inner.split(",")
        if len(parts) != 2:
            raise ValueError(f"expected 'lo,hi' in interval: {tok!r}")
        lo_s, hi_s = parts[0].strip(), parts[1].strip()
        lo = -math.inf if lo_s.lower() == "-inf" else float(lo_s)
        hi = math.inf if hi_s.lower() == "inf" else float(hi_s)
        if math.isnan(lo) or math.isnan(hi):
            raise ValueError("NaN is not a valid interval bound")
        if lo > hi:
            raise ValueError(f"lower bound above upper bound: {tok!r}")
        if not lo_inc:
            lo = math.nextafter(lo, math.inf)
        if not hi_inc:
            hi = math.nextafter(hi, -math.inf)
        return lo, hi
    v = float(s)
    return v, v


def parse_mapping(text: str, nodata: float | None = None) -> Mapping:
    """Parse the full mapping string (Reclassifier::Init)."""
    m = Mapping()
    for piece in text.split(";"):
        if not piece.strip():
            continue
        if "=" not in piece:
            raise ValueError(f"mapping missing '=': {piece!r}")
        frm, _, to = piece.partition("=")
        frm, to = frm.strip(), to.strip()

        from_default = from_nan = False
        interval = None
        fu = frm.upper()
        if fu == "DEFAULT":
            from_default = True
        elif fu == "NO_DATA":
            if nodata is None:
                raise ValueError(
                    "value mapped from NO_DATA, but NoData value is not set"
                )
            interval = (nodata, nodata)
        elif fu == "NAN":
            from_nan = True
        else:
            interval = _parse_interval(frm, nodata)

        pass_through = False
        dst: float | None = None
        if to == "NO_DATA":  # case-sensitive in the reference (STARTS_WITH)
            if nodata is None:
                raise ValueError(
                    "value mapped to NO_DATA, but NoData value is not set"
                )
            dst = nodata
        elif to == "PASS_THROUGH":
            pass_through = True
        else:
            dst = float(to)

        if from_nan:
            m.nan_set = True
            m.nan_value = math.nan if pass_through else dst
        elif from_default:
            if pass_through:
                m.default_pass_through = True
            else:
                m.default_value = dst
        else:
            m.intervals.append(
                (interval[0], interval[1], None if pass_through else dst)
            )

    m.intervals.sort(key=lambda t: t[0])
    for (lo0, hi0, _), (lo1, hi1, _) in zip(m.intervals, m.intervals[1:]):
        if not (lo0 > hi1 or hi0 < lo1):
            raise ValueError(
                f"interval [{lo0},{hi0}] overlaps [{lo1},{hi1}]"
            )
    return m


def reclassify_np(values, m: Mapping):
    """NumPy apply with the reference's lookup semantics (Reclassify).

    Unmatched values without a DEFAULT raise — the VRT pixel function
    errors out in that case rather than writing garbage.
    """
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    out = np.empty_like(v)
    found = np.zeros(v.shape, dtype=bool)
    isnan = np.isnan(v)
    if m.nan_set:
        out[isnan] = m.nan_value
        found[isnan] = True
    for lo, hi, dst in m.intervals:
        sel = ~isnan & ~found & (v >= lo) & (v <= hi)
        out[sel] = v[sel] if dst is None else dst
        found[sel] = True
    rest = ~found
    if m.default_value is not None:
        out[rest] = m.default_value
        found[rest] = True
    elif m.default_pass_through:
        out[rest] = v[rest]
        found[rest] = True
    if not found.all():
        bad = v[~found]
        raise ValueError(f"no mapping for value {bad[0]!r}")
    return out


def reclassify_column(col, m: Mapping):
    """Spark Column apply — ordered non-overlapping when-chain."""
    from pyspark.sql import functions as F

    v = col.cast("double")
    expr = None
    if m.nan_set:
        expr = F.when(F.isnan(v), F.lit(m.nan_value))
    for lo, hi, dst in m.intervals:
        cond = (v >= F.lit(lo)) & (v <= F.lit(hi))
        branch = v if dst is None else F.lit(float(dst))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    if m.default_value is not None:
        expr = expr.otherwise(F.lit(float(m.default_value)))
    elif m.default_pass_through:
        expr = expr.otherwise(v)
    return expr


def interval_case_sql(m: Mapping, var: str = "v") -> str:
    """The SAME when-chain as DuckDB SQL text (bounds inlined as exact
    17-digit CAST('…' AS DOUBLE) literals — the repr round-trips)."""
    def lit(x: float) -> str:
        if x == math.inf:
            return "CAST('inf' AS DOUBLE)"
        if x == -math.inf:
            return "CAST('-inf' AS DOUBLE)"
        return f"CAST('{x!r}' AS DOUBLE)"

    parts = ["CASE"]
    if m.nan_set:
        parts.append(f"WHEN isnan({var}) THEN {lit(m.nan_value)}")
    for lo, hi, dst in m.intervals:
        branch = var if dst is None else lit(float(dst))
        parts.append(
            f"WHEN {var} >= {lit(lo)} AND {var} <= {lit(hi)} THEN {branch}"
        )
    if m.default_value is not None:
        parts.append(f"ELSE {lit(float(m.default_value))}")
    elif m.default_pass_through:
        parts.append(f"ELSE {var}")
    parts.append("END")
    return " ".join(parts)

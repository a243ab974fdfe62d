"""Raster composition (blend) modes as exact integer byte arithmetic.

Re-creates the separable composition modes of ``gdal raster blend``
(reference: apps/gdalalg_raster_blend.cpp — MulScale255:184,
DivScale255:227, ProcessAlphaChannels:192, PremultiplyChannels:255,
BlendMultiply_Generic:890, BlendScreen_Generic:964,
BlendOverlay_Generic:1036, BlendHardLight_Generic:1158 which calls
Overlay with swapped operands, BlendDarken/Lighten:1176+,
BlendColorBurn_Generic:1461, BlendColorDodge_Generic:1310) as pure
integer SQL expression TREES.

The whole per-pixel pipeline is 8-bit integer arithmetic:

    mul255(a, b) = (a*b + 255) // 256          (ceiling-biased product)
    div255(a, b) = 0 if a==0, 255 if b==0, else (a*255) // b
    band8(x)     = x & 255                     (the C GByte casts)

Every place the C code narrows an ``int`` into a ``GByte`` (lambda
returns, implicit conversions at MulScale255/DivScale255 call sites)
is an explicit ``band8``.  All helper INPUTS are therefore in
[0, 255], all intermediate arithmetic is non-negative, and integer
floor division equals C truncation — so emitting the SAME expression
text for Spark SQL and DuckDB gives bitwise-identical bytes on both
engines with no float anywhere.

One generator emits both dialects (they differ only in the integer
floor-division operator: Spark ``div``, DuckDB ``//``), so the engine
plan and the oracle replay are the same tree BY CONSTRUCTION.

Scale shape: the blend is a per-pixel closed-form over co-located
bands — on a tiled 100-TB raster pair it is one whole-stage-codegen
projection after the (tile-key) zip join, no shuffle beyond the join,
no Python.
"""

from __future__ import annotations

MODES = (
    "multiply",
    "screen",
    "overlay",
    "hard-light",
    "darken",
    "lighten",
    "color-burn",
    "color-dodge",
)


def _div(dialect: str, a: str, b: str) -> str:
    """Integer floor division of non-negative operands."""
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def band8(x: str) -> str:
    """The C GByte cast: wrap into [0, 255]."""
    return f"(({x}) & 255)"


def mul255(dialect: str, a: str, b: str) -> str:
    """MulScale255 — args must already be bytes; result is a byte."""
    return _div(dialect, f"({a}) * ({b}) + 255", "256")


def div255(dialect: str, a: str, b: str) -> str:
    """DivScale255 — args must already be bytes (callers band8 first)."""
    return (
        f"(CASE WHEN ({a}) = 0 THEN 0 WHEN ({b}) = 0 THEN 255 "
        f"ELSE {_div(dialect, f'({a}) * 255', b)} END)"
    )


def alpha_exprs(
    dialect: str,
    base_a: str,
    over_a: str,
    opacity: int,
    swapped: bool = False,
) -> tuple[str, str, str]:
    """ProcessAlphaChannels: returns (A, OverlayA, finalAlpha) exprs.

    Non-swapped: the opacity multiplies the OVERLAY alpha; swapped
    (the reference swaps base/overlay when the overlay is the larger
    band count) multiplies the BASE alpha instead.
    """
    op = str(int(opacity))
    if not swapped:
        ov = mul255(dialect, over_a, op)
        a = base_a
    else:
        ov = over_a
        a = mul255(dialect, base_a, op)
    fa = band8(f"({ov}) + ({a}) - {mul255(dialect, ov, a)}")
    return a, ov, fa


def premult(dialect: str, c: str, a: str) -> str:
    """PremultiplyChannels: C * A (the A==255 fast path in the C code
    is an optimization — mul255(C, 255) == C exactly)."""
    return mul255(dialect, c, a)


def _t_terms(dialect: str, c: str, a: str, oc: str, oa: str) -> str:
    """The shared  Sca.(1-Da) + Dca.(1-Sa)  pair of every mode."""
    return (
        f"{mul255(dialect, c, f'255 - ({oa})')} + "
        f"{mul255(dialect, oc, f'255 - ({a})')}"
    )


def _component(dialect: str, mode: str, c: str, a: str, oc: str,
               oa: str, fa: str) -> str:
    """One colour component (premultiplied inputs) for one mode.

    `c`/`a` are the base (destination Dca/Da), `oc`/`oa` the overlay
    (source Sca/Sa), matching the Mapserver formula comments in the
    reference.
    """
    d = dialect
    t = _t_terms(d, c, a, oc, oa)
    amul = mul255(d, oa, a)
    if mode == "multiply":
        num = f"{mul255(d, c, oc)} + {t}"
    elif mode == "screen":
        num = f"({c}) + ({oc}) - {mul255(d, c, oc)}"
    elif mode in ("overlay", "hard-light"):
        # hard-light is overlay with base/overlay swapped
        # (gdalalg_raster_blend.cpp:1169); the T terms are symmetric.
        if mode == "overlay":
            bc, ba, sc, sa = c, a, oc, oa
        else:
            bc, ba, sc, sa = oc, oa, c, a
        less = f"2 * {mul255(d, bc, sc)} + {t}"
        geq = (
            f"{amul} - 2 * "
            f"{mul255(d, f'({ba}) - ({bc})', f'({sa}) - ({sc})')} + {t}"
        )
        num = f"(CASE WHEN 2 * ({bc}) < ({ba}) THEN {less} ELSE {geq} END)"
    elif mode == "darken":
        num = (
            f"LEAST({mul255(d, oc, a)}, {mul255(d, c, oa)}) + {t}"
        )
    elif mode == "lighten":
        num = (
            f"GREATEST({mul255(d, oc, a)}, {mul255(d, c, oa)}) + {t}"
        )
    elif mode == "color-dodge":
        cond = f"{mul255(d, oc, a)} + {mul255(d, c, oa)} >= {amul}"
        geq = f"{amul} + {t}"
        unprem_ov = band8(div255(d, oc, oa))
        lt = (
            f"{div255(d, band8(mul255(d, c, oa)), f'255 - {unprem_ov}')}"
            f" + {t}"
        )
        num = f"(CASE WHEN {cond} THEN {geq} ELSE {lt} END)"
    elif mode == "color-burn":
        cond = f"{mul255(d, oc, a)} + {mul255(d, c, oa)} <= {amul}"
        le = t
        unprem_c = band8(div255(d, c, a))
        unprem_ov = band8(div255(d, oc, oa))
        gt = (
            f"{mul255(d, amul, band8(f'{unprem_c} + {unprem_ov} - 255'))}"
            f" + {t}"
        )
        num = f"(CASE WHEN {cond} THEN {le} ELSE {gt} END)"
    else:
        raise ValueError(f"unknown blend mode {mode!r}")
    return band8(div255(d, band8(num), fa))


def blend_exprs(
    dialect: str,
    mode: str,
    base: tuple[str, str, str, str],
    over: tuple[str, str, str, str],
    opacity: int,
    swapped: bool = False,
) -> dict[str, str]:
    """Full RGBA blend: returns {'r','g','b','a'} expression strings.

    `base` / `over` are (R, G, B, A) column expressions holding bytes.
    """
    br, bg, bb, ba = base
    orr, og, ob, oa = over
    a, ov, fa = alpha_exprs(dialect, ba, oa, opacity, swapped)
    out = {}
    for key, c0, oc0 in (("r", br, orr), ("g", bg, og), ("b", bb, ob)):
        c = premult(dialect, c0, a)
        oc = premult(dialect, oc0, ov)
        out[key] = _component(dialect, mode, c, a, oc, ov, fa)
    out["a"] = fa
    return out

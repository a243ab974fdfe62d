"""The multimodal real-decode seam, exercised with a PIL test double
(the r4 verdict's #7: the decode="real" branches were import-gated
NotImplementedError sites that no test ever entered — the seam could
rot silently).

Two halves:
- a fake `PIL` module injected into sys.modules drives the REAL batch
  loop (`_image_meta_batches` with `_real_decode`) and asserts the
  documented schema and values (width/height from Image.size, luma =
  grayscale mean / 255);
- with PIL genuinely absent (this container), every decode="real"
  gate raises NotImplementedError — all sites exercised.
"""

import sys
import types

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators import multimodal as M


@pytest.fixture()
def fake_pil(monkeypatch):
    """A minimal PIL double: Image.open reads our 'format' — blob =
    b'IMG' + bytes([w, h, luma]) — and serves .size / .convert('L')."""

    class _FakeImg:
        def __init__(self, blob: bytes):
            assert blob[:3] == b"IMG"
            self.size = (blob[3], blob[4])
            self._luma = blob[5]

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None, copy=None):
            a = np.full((self.size[1], self.size[0]), self._luma,
                        dtype=np.uint8)
            return a.astype(dtype) if dtype else a

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda fh: _FakeImg(fh.read())
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return pil_mod


def _blob(w, h, luma):
    return b"IMG" + bytes([w, h, luma])


def test_real_batch_loop_schema_and_values(fake_pil):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "content": [_blob(20, 10, 0), _blob(33, 7, 255),
                        _blob(8, 8, 51)],
        }
    )
    out = pd.concat(
        list(M._image_meta_batches(iter([pdf]), M._real_decode)),
        ignore_index=True)
    assert list(out.columns) == [
        f.name for f in M.IMAGE_META_SCHEMA.fields]
    assert out["width"].tolist() == [20, 33, 8]
    assert out["height"].tolist() == [10, 7, 8]
    assert out["n_bytes"].tolist() == [6, 6, 6]
    assert out["mean_luma"].tolist() == [0.0, 1.0, 51 / 255.0]
    assert out["width"].dtype == np.int64
    assert out["mean_luma"].dtype == np.float64


def test_real_decode_raises_without_pil():
    if "PIL" in sys.modules or any(
            m.startswith("PIL.") for m in sys.modules):
        pytest.skip("a real/leftover PIL is importable here")
    with pytest.raises(NotImplementedError):
        M._real_decode(_blob(4, 4, 0))


def test_every_real_gate_raises_without_pil(spark):
    if "PIL" in sys.modules:
        pytest.skip("a PIL is importable here")
    df = spark.createDataFrame(
        [(1, bytearray(b"IMG\x08\x08\x00"))], "doc_id long, content binary")
    gates = [
        lambda: M.extract_image_meta(df, decode="real"),
        lambda: M.image_whash(df, decode="real"),
    ]
    for name in dir(M):
        fn = getattr(M, name)
        if not callable(fn) or name.startswith("_") or name in (
                "extract_image_meta", "image_whash"):
            continue
        code = getattr(fn, "__code__", None)
        if code and "decode" in code.co_varnames[: code.co_argcount]:
            gates.append(lambda fn=fn: fn(df, decode="real"))
    assert len(gates) >= 8  # the 9 NotImplementedError sites' owners
    for g in gates:
        with pytest.raises(NotImplementedError):
            g()

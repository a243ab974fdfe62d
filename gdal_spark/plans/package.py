"""Build the --py-files artifact for cluster submission.

The north rule runs the pipeline via ``spark-submit --py-files`` on a
real cluster; this packages ``gdal_spark`` into a single zip whose
root is importable on every executor:

    python -m gdal_spark.plans.package          # -> dist/gdal_spark.zip
    spark-submit --py-files dist/gdal_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        your_job.py

The engine has no compiled components and only numpy/pandas/pyarrow
runtime deps (standard on Spark workers), so the zip is the whole
deployment.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

PKG_ROOT = Path(__file__).resolve().parents[1]


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or str(PKG_ROOT.parent / "dist" / "gdal_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG_ROOT.rglob("*.py")):
            zf.write(py, os.path.join("gdal_spark", py.relative_to(PKG_ROOT)))
    return out_path


if __name__ == "__main__":
    print(build_zip())

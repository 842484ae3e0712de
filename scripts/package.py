"""Build ``dist/docstrange_spark.zip`` — the artifact shipped to
executors via ``spark-submit --py-files`` (the north-rule launch shape;
the reference ships a pip package instead, ``/root/reference/setup.py``).

Deterministic: files are added in sorted order with a fixed timestamp so
repeated builds byte-match (useful for cluster-side artifact caching /
content-addressed staging).
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "docstrange_spark"
DIST = REPO / "dist"
FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or DIST / "docstrange_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p
        for p in PKG.rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    target = build(pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(target)

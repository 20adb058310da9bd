"""Package oar_ocr_spark for `spark-submit --py-files`.

Builds a deterministic zip of the package (plus the pure-python
fixture generators it imports) importable from the archive root —
the north-rule deployment artifact: executors unpack nothing; the
zip lands on sys.path of every python worker.

Usage:
    python tools/package_pyfiles.py [out_zip]      # default dist/oar_ocr_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    """Zip oar_ocr_spark/ (sources only) into `out_path`; returns the path.

    Entries are written in sorted order with zeroed timestamps so the
    artifact is byte-reproducible — a re-deploy with unchanged sources
    ships an identical zip (content-addressable caches stay warm).
    """
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    members: list[tuple[str, str]] = []  # (arcname, abspath)
    pkg_root = os.path.join(REPO, "oar_ocr_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            # sources only: the golden parquet under fixtures/golden/ is
            # oracle-side tooling, not a runtime dependency of the job
            if not fn.endswith(".py"):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.relpath(ap, REPO)
            members.append((arc, ap))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, ap in members:
            with open(ap, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "oar_ocr_spark.zip")
    path = build_zip(out)
    print(path)

"""Build the ``--py-files`` artifact for cluster submission.

`scripts/run_linkage.py` / `run_curation.py` ship to a cluster as

    spark-submit --py-files py_stringsimjoin_spark.zip scripts/run_linkage.py ...

This builds that zip deterministically (sorted entries, fixed timestamps, no
caches/bytecode) so repeated builds of the same tree are byte-identical —
which lets a deploy pipeline cache/compare the artifact by hash. Pure
stdlib; no Spark needed at build time.

Usage:
    python scripts/build_pyfiles.py [out.zip]     (default: ./py_stringsimjoin_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "py_stringsimjoin_spark"

# zip entry timestamp is fixed so the artifact is reproducible; zipimport
# ignores it entirely (DOS epoch start = 1980-01-01)
_FIXED_TS = (1980, 1, 1, 0, 0, 0)


def iter_package_files(pkg_root: str):
    """Yield (abs_path, arcname) for every shippable package file, sorted."""
    out = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.join(PACKAGE, os.path.relpath(ap, pkg_root))
            out.append((ap, arc))
    return out


def build(out_path: str) -> str:
    pkg_root = os.path.join(REPO, PACKAGE)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for ap, arc in iter_package_files(pkg_root):
            with open(ap, "rb") as f:
                data = f.read()
            zi = zipfile.ZipInfo(arc, date_time=_FIXED_TS)
            zi.compress_type = zipfile.ZIP_DEFLATED
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
    return out_path


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else os.path.join(REPO, f"{PACKAGE}.zip")
    build(out)
    n = len(iter_package_files(os.path.join(REPO, PACKAGE)))
    print(f"wrote {out} ({n} files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

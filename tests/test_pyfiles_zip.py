"""The --py-files artifact is importable via zipimport and reproducible.

Guards the deployment shape BASELINE.json prescribes (spark-submit
--py-files on a multi-executor cluster): executors import the package from
the zip exactly the way this test does — no filesystem package visible,
only the archive on sys.path.
"""

import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, os.path.join(REPO, "scripts"))
from build_pyfiles import build  # noqa: E402


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def test_zip_builds_reproducibly(tmp_path):
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    assert _md5(a) == _md5(b)
    assert os.path.getsize(a) > 10_000  # real package, not an empty shell


def test_zip_imports_without_source_tree(tmp_path):
    """Import the package from the zip in a fresh interpreter whose cwd and
    sys.path contain no copy of the source tree (the executor's view)."""
    z = build(str(tmp_path / "pkg.zip"))
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import py_stringsimjoin_spark as p; "
        "from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer; "
        "t = WhitespaceTokenizer(return_set=True); "
        "print(sorted(t.tokenize('a b a'))); "
        "assert p.__file__.startswith(%r), p.__file__"
    ) % (z, str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert out.returncode == 0, out.stderr
    assert "['a', 'b']" in out.stdout

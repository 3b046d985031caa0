"""The committed spark-submit --py-files artifact must match HEAD —
a stale zip silently ships an old engine to the cluster."""

import os
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "data_validation_spark.zip")


def _source_files():
    pkg = os.path.join(REPO, "data_validation_spark")
    out = {}
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, REPO)] = fh.read()
    return out

def test_dist_zip_matches_source_tree():
    if not os.path.exists(ZIP):
        pytest.skip("no dist zip committed (built at deploy time)")
    src = _source_files()
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        assert names == set(src), (
            f"zip file-set drifted: only-in-zip={sorted(names - set(src))} "
            f"only-in-src={sorted(set(src) - names)} — "
            f"rebuild with tools/make_pyfiles_zip.py")
        for name, body in src.items():
            assert z.read(name) == body, (
                f"{name} inside dist/data_validation_spark.zip differs from "
                f"HEAD — rebuild with tools/make_pyfiles_zip.py")

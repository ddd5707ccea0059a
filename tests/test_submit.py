"""North-rule deployment mode: the library must run via
``spark-submit --py-files sketchlib.zip`` (BASELINE.json north_rule).

This test actually launches spark-submit in a clean working directory
with the repo stripped from PYTHONPATH, so sketchlib resolves ONLY from
the shipped zip — a renamed module, a non-zip-safe import, or a stray
filesystem dependency would fail here and nowhere else.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        # pip-installed pyspark ships the launcher in its bin/ dir
        import pyspark
        cand = os.path.join(os.path.dirname(pyspark.__file__),
                            "bin", "spark-submit")
        spark_submit = cand if os.path.exists(cand) else None
    if spark_submit is None:
        pytest.skip("spark-submit launcher not found")

    out = subprocess.run([sys.executable, os.path.join(REPO, "tools",
                                                       "make_zip.py")],
                         capture_output=True, text=True, check=True)
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("sketchlib.zip") and os.path.exists(zip_path)

    table = "/root/testdata/sf0.001/documents.parquet"
    # token table: the demo builds over 'tokens'; documents has none, so
    # use the deterministic generated table if present, else make a tiny one
    gen = os.path.join(REPO, "data", "token_sequences_8000000_nocomp.parquet")
    if os.path.exists(gen):
        table = gen
    else:
        from sketchlib.datagen import generate_token_table
        table = str(tmp_path / "tok.parquet")
        generate_token_table(table, rows=20_000, seed=1337, dist="zipf")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)     # repo must NOT be importable directly
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_demo.py"), table],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_rows"] > 0 and res["n_tokens"] > 0
    assert res["partitions"] >= 1
    assert len(res["sketch_sha16"]) == 16

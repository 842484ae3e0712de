"""The north-rule launch shape: package the engine, ship it with
``spark-submit --py-files``, run the extraction CLI on a cluster master.
Here master=local[4] (no cluster in-sandbox); the artifact + shim +
inherit-master path is identical on YARN/k8s/standalone."""

import pathlib
import subprocess
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"


def test_package_zip_deterministic_and_importable(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import package as pkg
    finally:
        sys.path.pop(0)
    a = pkg.build(tmp_path / "a.zip")
    b = pkg.build(tmp_path / "b.zip")
    assert a.read_bytes() == b.read_bytes()  # content-addressable staging
    names = zipfile.ZipFile(a).namelist()
    assert "docstrange_spark/__init__.py" in names
    assert "docstrange_spark/cli.py" in names
    assert not any("__pycache__" in n for n in names)
    # the zip imports standalone in a fresh interpreter (what executors do)
    code = (
        f"import sys; sys.path.insert(0, {str(a)!r}); "
        "import docstrange_spark.kernels.assembly, docstrange_spark.cli; "
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0 and out.stdout.strip() == "ok", out.stderr


def test_spark_submit_end_to_end(tmp_path):
    """Full launch: submit.sh -> spark-submit --py-files zip -> job.py ->
    CLI extraction over a real parquet input."""
    import os

    out_dir = tmp_path / "out"
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": "4",
        # spark-submit must be findable; keep the ambient PATH so the
        # pyenv interpreter (which has pyspark) stays resolvable too
        "PATH": "/opt/spark/bin:" + os.environ.get("PATH", "/usr/bin:/bin"),
        # driver and executors must use THIS interpreter
        "PYSPARK_PYTHON": sys.executable,
    }
    r = subprocess.run(
        [
            str(REPO / "scripts" / "submit.sh"),
            f"{SF_DIR}/documents.parquet",
            "--spanize",
            "--output-format",
            "markdown",
            "--out",
            str(out_dir),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import duckdb

    n, min_len = duckdb.sql(
        f"SELECT count(*), min(length(markdown)) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchall()[0]
    assert n == 500 and min_len > 0

"""Compile the in-repo DataSource V2 row-level catalog
(`batch_processing_on_aws_spark/jvm/SimpleRowLevelCatalog.java`) into
`batch_processing_on_aws_spark/jvm/rowlevel-catalog.jar` against the
installed pyspark's jars.

Idempotent: skips the build when the jar is newer than the source.
Prints the jar path on success; exits non-zero (with the compiler
output) if javac/jar are unavailable or compilation fails — callers
(tests/conftest.py, session.get_spark) treat that as "catalog not
available" and fall back.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile


def jar_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(
        here, "batch_processing_on_aws_spark", "jvm", "rowlevel-catalog.jar"
    )


def build(quiet: bool = False) -> str | None:
    """Build (or reuse) the jar; returns its path, or None if the
    toolchain is missing or compilation fails."""
    import pyspark

    jvm_dir = os.path.dirname(jar_path())
    src = os.path.join(jvm_dir, "SimpleRowLevelCatalog.java")
    out = jar_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    javac = shutil.which("javac")
    jar = shutil.which("jar")
    if not javac or not jar:
        if not quiet:
            print("javac/jar not on PATH; skipping build", file=sys.stderr)
        return None
    spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    with tempfile.TemporaryDirectory() as tmp:
        classes = os.path.join(tmp, "classes")
        os.makedirs(classes)
        cp = os.path.join(spark_jars, "*")
        r = subprocess.run(
            [javac, "-cp", cp, "-d", classes, src],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            if not quiet:
                print(r.stderr, file=sys.stderr)
            return None
        r = subprocess.run(
            [jar, "cf", out, "-C", classes, "."],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            if not quiet:
                print(r.stderr, file=sys.stderr)
            return None
    return out


if __name__ == "__main__":
    path = build()
    if path is None:
        sys.exit(1)
    print(path)

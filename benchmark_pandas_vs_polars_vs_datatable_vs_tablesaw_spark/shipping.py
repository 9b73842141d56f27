"""Ship this package to Spark's Python workers.

Functions passed to ``mapInPandas``/``pandas_udf`` are cloudpickled;
any module-level helper they reference (e.g. the multimodal decode
stub) is pickled *by reference* and re-imported inside the worker
process. Workers inherit neither the driver's cwd nor its sys.path
mutations, so unless the driver happens to run from the repo root the
import fails with ModuleNotFoundError. The portable fix — identical in
local mode and on a 1000-executor cluster — is ``sc.addPyFile`` with a
zip of the package: Spark distributes the archive to every executor
and prepends it to each worker's sys.path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_CONTEXTS: set[int] = set()


def package_zip_path() -> str:
    """Build (once per process) a zip of this package next to tempdir."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in sorted(files):
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    return zip_path


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Idempotently distribute the package to this context's workers."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_CONTEXTS:
        return
    sc.addPyFile(package_zip_path())
    _SHIPPED_CONTEXTS.add(key)

"""Ship this package's source to Spark Python workers.

Cloudpickle serializes module-level functions BY REFERENCE, so any
Pandas UDF / applyInPandas kernel that calls a helper defined in this
package needs ``import parquet_rewriter_spark`` to succeed inside the
worker process. That holds only when the driver's PYTHONPATH/cwd
happens to include the repo — true for our own session factory, not
guaranteed for a caller-provided SparkSession (the driver contract
passes one in). ``ensure_shipped`` closes the gap: zip the package
source once per process and ``addPyFile`` it once per SparkContext;
workers then import from the shipped zip regardless of where the
driver was launched. Cluster-safe by construction — addPyFile is the
standard dependency-distribution path for real multi-node deployments,
so local[] testing and a 1000-executor cluster take the same route.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_zip_path: str | None = None
_shipped_app_ids: set[str] = set()


def _build_zip() -> str:
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(prefix="parquet_rewriter_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "parquet_rewriter_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_shipped(spark) -> None:
    """Idempotent per SparkContext; ~zero cost after the first call."""
    try:
        sc = spark.sparkContext
        app_id = sc.applicationId
    except Exception:
        return  # e.g. Spark Connect sessions expose no SparkContext
    if app_id in _shipped_app_ids:
        return
    sc.addPyFile(_build_zip())
    _shipped_app_ids.add(app_id)

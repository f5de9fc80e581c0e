"""Ship the ``swanlake_spark`` package to Python workers.

Functions referenced from Arrow-batched UDFs (``mapInPandas`` codec
pipelines, ``applyInPandasWithState`` sessionizers) are pickled BY
REFERENCE: the worker unpickles ``swanlake_spark.operators.multimodal.
_default_codec`` and must therefore be able to ``import swanlake_spark``
itself. On local[n] that happens to work whenever the driver's cwd is the
repo checkout; on a real cluster (or any driver started from another
directory) nothing guarantees it and every UDF task dies with
``ModuleNotFoundError``.

``SparkContext.addPyFile`` is the supported fix at any scale: the package
zip rides the job's file server once, is cached per-executor, and is
prepended to every Python worker's ``sys.path`` — identical behavior on
local mode and a 1000-executor cluster. The zip is built lazily from the
installed package directory and shipped at most once per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import threading
import zipfile

_LOCK = threading.Lock()
_SHIPPED: set[int] = set()
_ZIP_PATH: str | None = None


def _build_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(prefix="swanlake_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "swanlake_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ship_package(spark) -> None:
    """Idempotently attach the package zip to ``spark``'s context."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    with _LOCK:
        if key in _SHIPPED:
            return
        sc.addPyFile(_build_zip())
        _SHIPPED.add(key)

"""Cross-engine helpers.

round6: deterministic 6-dp rounding defined as floor(x*1e6 + 0.5)/1e6 —
identical double ops on Spark and DuckDB, so both engines produce the
same bits even at exact .5 boundaries (bankers-vs-half-up divergence of
native round()). Used for every float column that the correctness
oracle hashes.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def ensure_py_files(spark: SparkSession) -> None:
    """Ship the alix_spark package to Python workers.

    mapInPandas closures defined in this package pickle by reference,
    so executors must be able to import ``alix_spark`` regardless of
    the driver's cwd. This zips the package once per SparkContext and
    registers it via ``sc.addPyFile`` — the local-mode equivalent of
    ``spark-submit --py-files alix_spark.zip`` on a real cluster.
    Called lazily by every operator that creates a Python-UDF stage.
    """
    sc = spark.sparkContext
    if getattr(sc, "_alix_pyfiles_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"alix_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith((".py", ".csv")):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    sc.addPyFile(zpath)
    sc._alix_pyfiles_added = True


def round6(c: Column) -> Column:
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def sql_round6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data-pipeline ops); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-runnable ANSI SQL twins for the value-hash
correctness gate. EVERY queries() entry has an oracle (round 2): the
render/union/triangulation/ANN kernels run on analytic fixtures whose
expected output the SQL computes in closed form — see
``plans/driver_queries.py`` and ``sources/analytic.py`` for the
exactness derivations (no pinned engine output anywhere).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from geograypher_spark.plans import driver_queries as DQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the tile-assignment +
    weighted-argmax pipeline (the north_star's raster↔vector aggregation)."""
    return DQ.q_tile_argmax(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLES)

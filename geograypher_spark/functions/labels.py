"""Label dictionary helpers (X16/X17).

Reference: label→ID remap via inverted dict with NaN default
(``meshes/meshes.py:436-467``); IDs_to_labels inference from unique values
(``utils/indexing.py:35-84``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def remap_labels(
    df: DataFrame, label_col: str, mapping: dict[str, int],
    out: str = "class_id",
) -> DataFrame:
    """X16: string labels → int ids via a broadcast dim table; unmapped
    labels → NULL (the reference's NaN default)."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], f"{label_col} string, {out} int")
    return df.join(F.broadcast(dim), label_col, "left")


def infer_ids_to_labels(df: DataFrame, label_col: str) -> dict[int, str]:
    """X17: class dictionary from the distinct values, ids assigned in
    sorted order (deterministic; reference infers from unique values)."""
    w = Window.orderBy(F.asc(label_col))
    rows = (
        df.select(label_col).filter(F.col(label_col).isNotNull()).distinct()
        .withColumn("_id", F.row_number().over(w) - 1)
        .collect()
    )
    return {int(r["_id"]): r[label_col] for r in rows}

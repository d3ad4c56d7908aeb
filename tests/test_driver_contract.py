"""Local mirror of the driver's correctness gate: run every queries() entry
and compare against its oracle_sql() via DuckDB (row count + sorted-value
equality), at sf0.01 — the same scale the driver uses.

The whole module runs with Arrow conversion DISABLED, mirroring the driver
harness's session config: rounds 1 and 2 both shipped fixtures that passed
the Arrow-enabled local suite but died at the driver's Arrow-less
createDataFrame schema inference (VERDICT r2 #1). Any contract query that
depends on Arrow-only inference now fails locally first."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module", autouse=True)
def arrow_off(spark):
    """Run the contract module under the driver's Arrow-less session config."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, prev)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
            df[c] = df[c].apply(lambda b: bytes(b).hex())
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    assert list(a.columns) == list(b.columns), \
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64); bv = bv.astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            same = (av == bv) | both_nan
        else:
            same = av == bv
        nbad = int((~same).sum())
        assert nbad == 0, (
            f"{name}.{c}: {nbad}/{len(a)} values differ; "
            f"first: {av[~same][:3]} vs {bv[~same][:3]}")


def test_entry_smoke(contract, spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_runnable_callable(contract, spark):
    qs = contract.queries()
    assert len(qs) >= 25
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", [
    "cell_count", "pip_concave", "points_in_polygons", "label_polygons",
    "mode_vote", "multiview_mean", "covering_grid", "knn",
    "proximity_edges", "connected_components", "tile_argmax", "zonal_stats",
    "doc_roundtrip", "dedup_exact", "dedup_jaccard", "minhash_signatures",
    "lsh_candidates", "ann_cosine", "text_quality", "lang_id",
    "fingerprint", "token_counts",
    # round-2: formerly rows-only kernels, now with computed oracles
    # (analytic fixtures / portable hashes / integer-exact arithmetic)
    "visibility_zbuffer", "face_class_union", "triangulate", "simhash",
    "ann_lsh", "ann_ivf", "dtm_sample", "rasterize_scene", "multimodal_features",
    "forward_pipeline",
    # round-3: reverse pipeline (render_labels_pipeline end-to-end), the
    # embedding-cosine near-dup dedup tier, distributed Louvain
    "render_labels", "dedup_embedding", "louvain",
    # round-4: the detections pipeline COMPOSITION (each stage was already
    # gated; this gates detections -> rays -> graph -> components ->
    # triangulation end to end)
    "multiview_detections",
    # round-5: the real from-scratch codecs (PNG/JPEG/WAV/MJPEG-AVI)
    # value-verified end-to-end through the Spark plumbing — JPEG via
    # block-constant images, which survive DC quantization exactly
    "png_roundtrip", "jpeg_roundtrip", "wav_roundtrip", "avi_framesample",
    # round-5: S7 EXIF GPS — real APP1/TIFF walker on exact-rational
    # payloads; the parse's float expression repeated verbatim in SQL
    "exif_gps",
])
def test_query_matches_oracle(contract, spark, duck, name):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).df()
    _compare(spark_pdf, duck_pdf, name)


def test_every_query_has_oracle(contract):
    assert set(contract.oracle_sql()) == set(contract.queries())

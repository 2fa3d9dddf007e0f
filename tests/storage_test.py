"""Storage-layer pins: the driver-side footer schema fast path must
agree exactly with Spark's own parquet inference wherever it fires
(r11: supplying the schema skips one Spark job per external-table
read; a silent type divergence would change query semantics, so the
agreement is pinned here on the real testdata files)."""

import os

from tanker_spark.storage import local_footer_schema

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_footer_schema_matches_inference(spark):
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if not os.path.exists(p):
            continue
        inferred = spark.read.parquet(p).schema
        footer = local_footer_schema(p, spark)
        assert footer is not None, t
        assert footer == inferred, t


def test_footer_schema_guards(spark, tmp_path):
    # remote-looking paths, missing files, partitioned dirs → None
    assert local_footer_schema("s3://bucket/x.parquet", spark) is None
    assert local_footer_schema(str(tmp_path / "nope.parquet"),
                               spark) is None
    # a dir with subdirs (partitioned layout) falls back to inference
    d = tmp_path / "tbl"
    (d / "day=2020-01-01").mkdir(parents=True)
    spark.range(3).write.mode("overwrite").parquet(
        str(d / "day=2020-01-01"))
    assert local_footer_schema(str(d), spark) is None
    # a plain parquet dir is served from its first footer
    flat = tmp_path / "flat"
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(str(flat))
    import shutil
    shutil.rmtree(str(flat) + "/_SUCCESS", ignore_errors=True)
    s = local_footer_schema(str(flat), spark)
    if s is not None:  # _SUCCESS marker files are not subdirs
        assert s == spark.read.parquet(str(flat)).schema

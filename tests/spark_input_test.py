"""Spark-DataFrame input to write/delete — the distributed ingest path
(no driver round-trip; net-new vs the reference's driver-side shapes)."""

from pyspark.sql import functions as F

from tanker_spark import View


def test_spark_df_write(session, spark):
    df = spark.createDataFrame(
        [("Orange", "Holland"), ("Blue", "Belgium")],
        ["name", "country.name"],
    )
    View("team", ["name", "country.name"]).write(df)
    res = View("team", ["name", "country.name"]).read().all()
    assert sorted(res) == [
        ("Blue", "Belgium"), ("Blue", "France"),
        ("Orange", "Holland"), ("Red", "Belgium"),
    ]


def test_spark_df_write_fk_error(session, spark):
    import pytest

    df = spark.createDataFrame(
        [("X", "Atlantis")], ["name", "country.name"]
    )
    with pytest.raises(ValueError):
        View("team", ["name", "country.name"]).write(df)


def test_spark_df_delete(session, spark):
    df = spark.createDataFrame(
        [("Blue", "Belgium")], ["name", "country.name"]
    )
    View("team", ["name", "country.name"]).delete(data=df)
    res = View("team", ["name", "country.name"]).read().all()
    assert sorted(res) == [("Blue", "France"), ("Red", "Belgium")]

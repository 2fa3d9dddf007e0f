"""dict / pandas / defaults / encoding round-trips, ported from
/root/reference/tests/{dict,pandas,default,encoding}_test.py."""

import numpy
from pandas import DataFrame, date_range

from tanker_spark import View

from .conftest import members


def test_dict_read_write(session):
    view = View("country", {"Name": "name"})
    records = sorted(view.read().dict(), key=str)

    view.write([{"Name": "Italy"}])
    updated = sorted(view.read().dict(), key=str)
    assert sorted(records + [{"Name": "Italy"}], key=str) == updated


def test_pandas_read_write(session):
    view = View("country", {"Name": "name"})
    db_df = view.read().df()

    view.write(DataFrame({"Name": ["Italy"]}))
    updated = view.read().df()
    assert sorted(updated["Name"]) == sorted(
        list(db_df["Name"]) + ["Italy"]
    )


def test_empty_read(session):
    view = View("country")
    df = view.read({"name": "Prussia"}).df()
    assert len(df) == 0


def test_pandas_kitchensink(session):
    df = DataFrame({
        "index": numpy.arange(10),
        "bigint": numpy.arange(10),
        "float": numpy.arange(10).astype("f8"),
        "true": numpy.asarray([True] * 10),
        "false": numpy.asarray([False] * 10),
        "varchar": ["spam"] * 10,
        "timestamp": numpy.asarray(range(10), dtype="M8[s]"),
        "date": date_range("1970-01-01", "1970-01-10", freq="D"),
    })
    cols = list(df.columns)
    view = View("kitchensink", cols)
    view.write(df)

    read_df = view.read(order="index").df()
    for col in cols:
        if col == "date":
            assert all(
                read_df[col].astype("M8[ns]") == df[col].astype("M8[ns]")
            )
        else:
            assert all(read_df[col] == df[col])


def test_default_timestamp(session):
    view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    view.write(members)
    # created_at has default current_timestamp → populated on insert
    assert all(v is not None for (v,) in View("member", ["created_at"]).read())


def test_utf8(session):
    view = View("country", ["name"])
    view.write([("日本",), ("Corée",)])
    res = view.read('(in name "日本" "Corée")').all()
    assert sorted(res) == [("Corée",), ("日本",)]


def test_fetch_save(session):
    from tanker_spark import fetch, save

    save("country", {"name": "Prussia"})
    rec = fetch("country", {"name": "Prussia"})
    assert rec["name"] == "Prussia"
    assert rec["id"] is not None
    assert fetch("country", {"name": "Atlantis"}) is None


def test_large_fk_resolution(session):
    """≥1000 distinct FK targets (FIXTURES.md edge case — the reference
    exercises its LRU here; ours is a broadcast join, same result)."""
    n = 1000
    View("country", ["name"]).write([("c%d" % i,) for i in range(n)])
    team_view = View("team", ["name", "country.name"])
    team_view.write([("t%d" % i, "c%d" % i) for i in range(n)])
    teams = team_view.read('(like name "t%")').all()
    assert len(teams) == n
    for team_name, country_name in teams:
        assert team_name[1:] == country_name[1:]


def test_arrow_sink(session):
    """Cursor.arrow(): one columnar transfer into a pyarrow.Table."""
    import pyarrow as pa

    tbl = View("country", ["name"]).read(order="name").arrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.column("name").to_pylist() == [
        "Belgium", "France", "Holland"]
    # round-trips into duckdb (the Arrow-native consumer case)
    import duckdb
    assert duckdb.sql("select count(*) from tbl").fetchone()[0] == 3

"""Utility-surface parity (reference tests/utils_test.py): paginate,
manual connect enter/leave, runtime table registration + creation."""

from tanker_spark import View, connect, create_tables, ctx, paginate

from .conftest import SCHEMA


def test_paginate(session):
    values = [iter([1] * 10), iter([2] * 10), iter([3] * 10)]
    cnt = 0
    for page in paginate(values, 2):
        cnt += 1
        assert len(page) == 2
        for line in page:
            assert line == (1, 2, 3)
        assert cnt <= 5
    assert cnt == 5

    # trailing partial page
    pages = list(paginate([iter(range(5))], 2))
    assert [len(p) for p in pages] == [2, 2, 1]


def test_manual_conn(session, spark, tmp_path):
    """connect(cfg, 'enter') / connect(cfg, 'leave') — explicit context
    lifecycle without a with-block (reference utils_test.py:53-69)."""
    cfg = {"root": str(tmp_path / "manual"), "schema": SCHEMA,
           "spark": spark}
    country_view = View("country", ["name"])

    connect(cfg, "enter")
    create_tables()
    assert country_view.read({"name": "Prussia"}).one() is None
    country_view.write([["Prussia"]])
    connect(cfg, "leave")

    # result survives into a fresh context on the same root
    with connect(cfg):
        assert country_view.read(
            {"name": "Prussia"}).one()[0] == "Prussia"

    import pytest
    with pytest.raises(ValueError):
        connect(cfg, "bogus")


def test_runtime_register_create(session):
    """ctx.register + create_tables after connect (reference
    utils_test.py:71-90): a new table with an FK-by-key seed row."""
    from tanker_spark import register

    table_def = [{
        "table": "sponsor",
        "columns": {
            "name": "varchar",
            "country": "m2o country.id",
            "type": "varchar",
        },
        "key": ["name", "country"],
        "values": [{
            "name": "ACME-2000",
            "country.name": "Belgium",
            "type": "gold",
        }],
    }]
    register(table_def)
    create_tables()
    rows = View("sponsor", ["name", "country.name", "type"]).read().all()
    assert rows == [("ACME-2000", "Belgium", "gold")]


def test_interleave():
    """interleave parity (reference utils.py:60-83): str.join for
    lists, flattening list/tuple items."""
    from tanker_spark import interleave

    assert list(interleave(",", ["a", "b", "c"])) == \
        ["a", ",", "b", ",", "c"]
    # list items chain element-wise, separator only BETWEEN items
    assert list(interleave(" AND ", [["a", "b"], "c"])) == \
        ["a", "b", " AND ", "c"]
    assert list(interleave(0, [])) == []
    assert list(interleave(0, [[1, 2], (3,), 4])) == [1, 2, 0, 3, 0, 4]


def test_execute(session):
    """Raw-SQL parity (reference context.py execute): registered tables
    visible as views, result is an iterator of row tuples, %s params
    fill positionally."""
    from tanker_spark import execute

    rows = list(execute(
        "SELECT name FROM country WHERE name != %s ORDER BY name",
        ["France"],
    ))
    assert rows == [("Belgium",), ("Holland",)]

    # backslashes must not break the literal (Spark treats backslash
    # as an escape in string literals): a trailing-backslash or
    # quote+backslash value compares as itself, never as injected SQL
    rows = list(execute(
        "SELECT count(*) FROM country WHERE name = %s",
        ["x\\' OR 1=1 --"],
    ))
    assert rows == [(0,)]
    rows = list(execute(
        "SELECT %s AS v", ["C:\\dir\\"],
    ))
    assert rows == [("C:\\dir\\",)]


def test_pool_shim(monkeypatch):
    """Pool parity: disconnect() stops the active SparkSession (the
    closing-every-pooled-connection analog); clear() is a no-op. The
    real session is NOT stopped here — a stub stands in."""
    from pyspark.sql import SparkSession

    from tanker_spark import Pool

    stopped = []

    class _Stub:
        def stop(self):
            stopped.append(True)

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(
            lambda cls: _Stub()))
    Pool.disconnect()
    assert stopped == [True]
    Pool.clear()
    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(
            lambda cls: None))
    Pool.disconnect()  # no active session: harmless


def test_execute_percent_literals(session):
    """Round-5 ADVICE: a bare % in the SQL (LIKE '%x%') must pass
    through untouched when args are given — only the exact %s token is
    a placeholder (python %-interpolation raised ValueError here)."""
    from tanker_spark import execute

    rows = list(execute(
        "SELECT name FROM country WHERE name LIKE '%an%' "
        "AND name != %s ORDER BY name",
        ["France"],
    ))
    assert rows == [("Holland",)]
    # placeholder/arg count mismatch fails loudly, not silently
    import pytest

    with pytest.raises(ValueError, match="placeholders"):
        list(execute("SELECT %s, %s", ["only-one"]))


def test_require_local_fs_normalizes_file_uri():
    """file:// URIs are admitted but STRIPPED so the guarded ops never
    os.rename/open a raw URI string (r9 ADVICE); object-store schemes
    and host-carrying file URIs are refused loudly."""
    import pytest

    from tanker_spark.utils import require_local_fs

    assert require_local_fs("/tmp/idx", "op") == "/tmp/idx"
    assert require_local_fs("file:///tmp/idx", "op") == "/tmp/idx"
    with pytest.raises(ValueError, match="POSIX filesystem"):
        require_local_fs("s3://bucket/idx", "op")
    with pytest.raises(ValueError, match="non-empty"):
        require_local_fs("file://host/idx", "op")

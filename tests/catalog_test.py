"""Catalog persistence / introspection + runtime table creation
(reference: context.py introspect_db + tests/utils_test.py:72-90)."""

from tanker_spark import View, connect, create_tables, ctx, register


def test_introspection_reload(session, spark):
    """Reconnect with NO schema: the catalog sidecar restores the
    registry (the Spark analog of introspect_db, context.py:388-569)."""
    root = session.root
    with connect({"root": root, "spark": spark}):
        assert "team" in ctx.registry
        table = ctx.registry["team"]
        assert table.key == ["name", "country"]
        assert table.get_column("country").foreign_table == "country"
        res = View("team", ["name", "country.name"]).read().all()
        assert sorted(res) == [
            ("Blue", "Belgium"), ("Blue", "France"), ("Red", "Belgium"),
        ]


def test_runtime_create_table(session):
    """Register a new table at runtime with a dotted-path FK seed value
    (the sponsor fixture, FIXTURES.md)."""
    register([{
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
    }])
    create_tables()
    rows = View("sponsor").read().all()
    assert rows == [("ACME-2000", "Belgium", "gold")]


def test_introspect_parquet(spark):
    """A foreign parquet directory with no schema and no sidecar is
    registered from the file footers (external read-only tables) — the
    Spark analog of the reference's introspect_db (context.py:388-569)."""
    import pytest

    from tanker_spark import View, connect

    with connect({"root": "/root/testdata/sf0.001", "spark": spark}):
        v = View("lineitem",
                 {"flag": "l_returnflag", "qty": "(sum l_quantity)"})
        rows = v.read(order="flag").all()
        assert [r[0] for r in rows] == ["A", "N", "R"]
        with pytest.raises(ValueError):
            View("region", ["r_name"]).write([("X",)])


def test_ctx_sql_escape_hatch(spark, tmp_path):
    """ctx.sql(): full Spark SQL over the registered tables (window
    functions and CTEs the s-expr surface doesn't model), seeing the
    current snapshot after writes."""
    from tanker_spark import View, connect, create_tables, ctx

    schema = """
    - table: score
      columns:
        player: varchar
        points: integer
      key: [player]
    """
    with connect({"root": str(tmp_path / "sqlroot"), "schema": schema,
                  "spark": spark}):
        create_tables()
        View("score", ["player", "points"]).write(
            [("a", 10), ("b", 30), ("c", 20)])
        out = ctx.sql("""
            WITH ranked AS (
              SELECT player, points,
                     rank() OVER (ORDER BY points DESC) AS rk
              FROM score
            )
            SELECT player, rk FROM ranked WHERE rk <= 2
            ORDER BY rk
        """).collect()
        assert [(r.player, r.rk) for r in out] == [("b", 1), ("c", 2)]
        View("score", ["player", "points"]).write([("d", 99)])
        top = ctx.sql(
            "SELECT player FROM score ORDER BY points DESC LIMIT 1"
        ).collect()
        assert top[0].player == "d"


def test_create_tables_idempotent(session):
    """Reference init_test.py: a second create_tables() is harmless —
    existing tables keep their data and seeds don't re-apply twice."""
    from tanker_spark import create_tables

    before = sorted(View("team", ["name", "country.name"]).read().all())
    create_tables()
    create_tables()
    assert sorted(View("team", ["name", "country.name"]).read().all()) \
        == before
    # seeded values not duplicated
    countries = [n for (n,) in View("country", ["name"]).read().all()]
    assert len(countries) == len(set(countries))

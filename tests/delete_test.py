"""Delete-path golden tests, ported from /root/reference/tests/delete_test.py."""

from tanker_spark import View

from .conftest import check, members


def test_delete_data(session):
    view = View("country", ["name"])
    view.delete(data=[["France"]])
    check([("Belgium",), ("Holland",)], view.read().all())


def test_delete_data_extra_col(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)
    assert len(full_view.read().all()) == len(members)

    full_view.delete(data=members)
    assert full_view.read().all() == []


def test_delete_data_id(session):
    view = View("country", ["id"])
    data = view.read('(!= name "Belgium")').all()
    view.delete(data=[[i] for (i,) in data])
    assert len(view.read().all()) == 1


def test_delete_filter(session):
    view = View("country", ["name"])
    view.delete(["(> id 0 )", "(< id 0)"])
    res = view.read(order="name").all()
    assert res == [("Belgium",), ("France",), ("Holland",)]

    view = View("country", ["name"])
    view.delete("(in name {names})", args={"names": ["France", "Holland"]})
    assert view.read().all() == [("Belgium",)]


def test_delete_filter_dict(session):
    view = View("country", ["name"])
    view.delete(filters={"name": "France"})
    check([("Belgium",), ("Holland",)], view.read().all())


def test_delete_by_id(session):
    view = View("country", ["id"])
    data = view.read('(= name "France")').all()
    view.delete(data=data)
    check([("Belgium",), ("Holland",)], View("country", ["name"]).read().all())


def test_delete_swap(session):
    view = View("team", ["name", "country.name"])
    view.delete(data=[("Blue", "Belgium")], swap=True)
    check([("Blue", "Belgium")], view.read().all())


def test_truncate(session):
    view = View("team", ["name", "country.name"])
    n = view.delete()
    assert n == 3
    assert view.read().all() == []


def test_delete_cascades(session):
    """ON DELETE CASCADE parity (reference table.py:70-74: every m2o FK
    cascades): deleting a country removes its teams, and transitively
    the members of those teams."""
    from tests.conftest import members

    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)

    View("country").delete('(= name "Belgium")')

    countries = {n for (n,) in View("country", ["name"]).read().all()}
    assert "Belgium" not in countries
    teams = View("team", ["name", "country.name"]).read().all()
    assert all(c != "Belgium" for _, c in teams)      # Belgian teams gone
    assert ("Blue", "France") in teams                # others intact
    names = {n for (n,) in View("member", ["name"]).read().all()}
    # Bob (Blue/Belgium) and Alice (Red/Belgium) cascade away with
    # their teams; Trudy (Blue/France) survives
    assert names == {"Trudy"}


MATCH_SCHEMA = """
- table: team2
  columns:
    name: varchar
  key: [name]
- table: match
  columns:
    label: varchar
    home: m2o team2.id
    away: m2o team2.id
  key: [label]
- table: event
  columns:
    kind: varchar
    match: m2o match.id
  key: [kind, match]
"""


def test_delete_cascade_multi_fk_diamond(spark, tmp_path):
    """Regression (round-5 ADVICE): a child with TWO m2o FKs to the same
    parent (match.home / match.away -> team2) plus a grandchild
    (event -> match). The old per-edge cascade wrote `match` twice, so
    with KEEP_VERSIONS=2 the snapshot backing the still-lazy victim
    frame was GC'd before evaluation — FileNotFoundException mid-cascade
    and dangling `event` rows. Now each child is read/written once per
    step and victim keys are spilled snapshot-independently."""
    from tanker_spark import connect, create_tables

    cfg = {"root": str(tmp_path / "db2"), "schema": MATCH_SCHEMA,
           "spark": spark}
    with connect(cfg):
        create_tables()
        View("team2", ["name"]).write([["ants"], ["bees"], ["cats"]])
        View("match", ["label", "home.name", "away.name"]).write([
            ["m1", "ants", "bees"],   # ants at home
            ["m2", "cats", "ants"],   # ants away
            ["m3", "bees", "cats"],   # no ants
        ])
        View("event", ["kind", "match.label"]).write([
            ["goal", "m1"], ["foul", "m2"], ["goal", "m3"],
        ])

        View("team2").delete('(= name "ants")')

        assert {n for (n,) in View("team2", ["name"]).read().all()} == {
            "bees", "cats"}
        # both FK edges cascade: m1 (home) AND m2 (away) die
        assert [r for (r,) in View("match", ["label"]).read().all()] == [
            "m3"]
        # grandchild follows — no dangling event rows
        assert View("event", ["kind", "match.label"]).read().all() == [
            ("goal", "m3")]

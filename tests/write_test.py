"""Write-path golden tests, ported from /root/reference/tests/write_test.py."""

from itertools import product

import pytest

from tanker_spark import View

from .conftest import check, members


def test_no_insert(session):
    team_view = View("team", ["name", "country.name"])
    team_view.write(
        [("Orange", "Holland"), ("Blue", "Belgium")], insert=False
    )
    expected = [("Red", "Belgium"), ("Blue", "Belgium"), ("Blue", "France")]
    check(expected, team_view.read())


def test_no_update(session):
    team_view = View("team", ["name", "country.name"])
    team_view.write(
        [("Orange", "Holland"), ("Blue", "Belgium")], update=False
    )
    expected = [
        ("Red", "Belgium"),
        ("Blue", "Belgium"),
        ("Blue", "France"),
        ("Orange", "Holland"),
    ]
    check(expected, team_view.read())


def test_no_fields(session):
    view = View("country")
    view.write([("Italy",)])
    expected = [("Belgium",), ("Italy",), ("France",), ("Holland",)]
    check(expected, view.read())


def test_simple_purge(session):
    team_view = View("team", ["name", "country.name"])
    cnt = team_view.write(
        [("Orange", "Holland"), ("Blue", "France")],
        purge=True, insert=False, update=False,
    )
    assert cnt["deleted"] == 2
    check([("Blue", "France")], team_view.read())


def test_filter_purge(session):
    team_view = View("team", ["name", "country.name"])
    fltr = "(= country.name 'Belgium')"
    cnt = team_view.write(
        [("Red", "Belgium"), ("Blue", "France"), ("Purple", "France")],
        purge=True, filters=fltr,
    )
    assert cnt["deleted"] == 1
    check([("Red", "Belgium"), ("Blue", "France")], team_view.read())


def test_partial_write(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)

    name_view = View("member", ["id", "name"])
    id2name = dict(name_view.read().all())

    partial_view = View("member", ["name", "registration_code"])
    partial_view.write([["Bob", "001"]])

    res = full_view.read('(= name "Bob")').one()
    assert all(res)
    for member_id, name in name_view.read():
        assert id2name[member_id] == name


def test_write_by_id(session):
    country_view = View("country", ["id", "name"])
    res = country_view.read('(= name "Belgium")').one()
    record_id = res[0]
    country_view.write([(record_id, "BELGIUM")])

    assert country_view.read('(= name "Belgium")').one() is None
    res = country_view.read('(= name "BELGIUM")').one()
    assert res[0] == record_id


def test_nullable_fk(session):
    member_view = View(
        "member", ["registration_code", "team.name", "team.country.name"]
    )
    member_view.write([("test", None, None)])
    res = View("member", ["team"]).read(
        '(= registration_code "test")'
    ).one()
    assert res == (None,)


def test_purge_filters(session):
    teams = [["Red", "Belgium"]]
    fltr = '(= country.name "Belgium")'
    team_view = View("team", ["name", "country.name"])
    team_view.write(teams, purge=True, filters=fltr)
    check([("Red", "Belgium"), ("Blue", "France")], team_view.read())

    fltr = '(!= country.name "Belgium")'
    team_view.write(teams, purge=True, filters=fltr)
    check([("Red", "Belgium")], team_view.read())


def test_update_filters(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)

    fltr = '(= registration_code "001")'
    member_view = View("member", ["registration_code", "name"])
    cnt = member_view.write(
        [("001", "BOB"), ("003", "TRUDY")], filters=fltr
    )
    assert cnt["filtered"] == 1
    expected = [("001", "BOB"), ("002", "Alice"), ("003", "Trudy")]
    check(expected, member_view.read())


def test_sneaky_update_filters(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)

    # filter expressed on the column being updated: the OLD value decides
    fltr = '(= name "Bob")'
    member_view = View("member", ["registration_code", "name"])
    cnt = member_view.write([("001", "Trudy")], filters=fltr)
    assert cnt["filtered"] == 1
    expected = [("001", "Bob"), ("002", "Alice"), ("003", "Trudy")]
    check(expected, member_view.read())


def test_insert_filters(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)

    fltr = '(= registration_code "004")'
    member_view = View("member", ["registration_code", "name"])
    cnt = member_view.write(
        [("004", "Carol"), ("005", "Dan")], filters=fltr
    )
    assert cnt["filtered"] == 1
    expected = [
        ("001", "Bob"), ("002", "Alice"), ("003", "Trudy"),
        ("004", "Carol"),
    ]
    check(expected, member_view.read())


def test_filter_args(session):
    full_view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    full_view.write(members)

    fltr = "(= registration_code {})"
    member_view = View("member", ["registration_code", "name"])
    member_view.write(
        [("004", "Carol"), ("005", "Dan")], filters=fltr, args=["004"]
    )
    expected = [
        ("001", "Bob"), ("002", "Alice"), ("003", "Trudy"),
        ("004", "Carol"),
    ]
    check(expected, member_view.read())


params = list(product([None, 0, "", "0"], ["country", "country.name"]))


@pytest.mark.parametrize("bogus_value,fk_field", params)
def test_null_key(session, bogus_value, fk_field):
    """Null/empty values in key columns must be rejected."""
    view = View("team", ["name", fk_field])
    with pytest.raises(Exception) as exc:
        view.write([["Pink", bogus_value]])
    assert isinstance(exc.value, (ValueError, TypeError))


def test_natural_column_fk(spark, tmp_path):
    """M2O referencing a NON-id column: the fk physically stores the
    referenced column's value (here a varchar), writes resolve through
    it, and dotted reads join on it — caught by a verify pass where
    write stored the surrogate id but read joined on the name."""
    from tanker_spark import connect, create_tables

    schema = """
    - table: country
      columns: {name: varchar}
      key: [name]
    - table: team
      columns:
        name: varchar
        country: m2o country.name
      key: [name]
    """
    with connect({"root": str(tmp_path), "schema": schema,
                  "spark": spark}):
        create_tables()
        View("country", ["name"]).write([("Belgium",), ("France",)])
        tv = View("team", ["name", "country.name"])
        tv.write([("Red", "Belgium"), ("Blue", "France")])
        check([("Red", "Belgium"), ("Blue", "France")], tv.read())
        # upsert moves the fk; still one row per key
        tv.write([("Red", "France")])
        check([("Red", "France"), ("Blue", "France")], tv.read())
        # the physical fk column holds the natural value, not a hash id
        raw = View("team", ["name", "country"])
        check([("Red", "France"), ("Blue", "France")], raw.read())
        # unknown natural fk value still rejected
        with pytest.raises(ValueError):
            tv.write([("Green", "Mars")])


LAZY_SCHEMA = """
- table: country
  columns:
    name: varchar
  key: [name]
- table: city
  columns:
    name: varchar
    country: m2o country.id
  key: [name]
"""


def test_lazy_validation_scope(spark, tmp_path):
    """Plan-fused validation is validated-rows-only (documented in
    View._resolve / ADVICE round 1): a row removed by a write filter
    never reaches the merge, so an unknown fk value OUTSIDE the natural
    key does NOT raise — unlike the reference, which resolved fks
    eagerly at format() time before applying write filters. (An fk
    inside the key is still validated for every staged row: the
    filter-leg key join evaluates it.)"""
    from tanker_spark import connect, create_tables

    cfg = {"root": str(tmp_path / "lz"), "schema": LAZY_SCHEMA,
           "spark": spark}
    with connect(cfg):
        create_tables()
        View("country", ["name"]).write([("Belgium",)])
        v = View("city", ["name", "country.name"])
        v.write([("Brussels", "Belgium")])
        cnt = v.write(
            [("Lost", "Atlantis")], filters='(!= name "Lost")'
        )
        assert cnt["filtered"] == 1
        check([("Brussels", "Belgium")], v.read())
        # the same row without the filter DOES raise
        with pytest.raises(ValueError):
            v.write([("Lost", "Atlantis")])


UNIQUE_SCHEMA = """
- table: person
  columns:
    name: varchar
    email: varchar
    nick: varchar
  key: [name]
  unique:
    - [email]
"""


def test_unique_enforcement(spark, tmp_path):
    """Declared unique: groups are enforced on write (reference creates
    unique DB indexes, context.py:655-677); NULLs never conflict."""
    from tanker_spark import connect, create_tables

    cfg = {"root": str(tmp_path / "u"), "schema": UNIQUE_SCHEMA,
           "spark": spark}
    with connect(cfg):
        create_tables()
        v = View("person", ["name", "email", "nick"])
        v.write([("a", "a@x", "A"), ("b", "b@x", "B")])
        # incoming duplicate of a stored email → rejected, nothing
        # committed
        with pytest.raises(ValueError):
            v.write([("c", "a@x", "C")])
        check([("a", "a@x", "A"), ("b", "b@x", "B")], v.read())
        # duplicate emails within one batch → rejected
        with pytest.raises(ValueError):
            v.write([("d", "d@x", "D"), ("e", "d@x", "E")])
        # NULL emails never conflict (SQL unique-index semantics)
        v.write([("f", None, "F"), ("g", None, "G")])
        # updating a row keeping its own unique value is fine
        v.write([("a", "a@x", "A2")])
        assert ("a", "a@x", "A2") in v.read().all()


UNIQUE_PART_SCHEMA = """
- table: reading
  columns:
    site: varchar
    day: varchar
    tag: varchar
  key: [site, day]
  partition_by: [day]
  unique:
    - [tag]
"""


def test_unique_cross_partition(spark, tmp_path):
    """Partition-pruned merge commits still enforce unique: against the
    UNTOUCHED partitions (presence-marker join on the outside scan)."""
    from tanker_spark import connect, create_tables

    cfg = {"root": str(tmp_path / "up"), "schema": UNIQUE_PART_SCHEMA,
           "spark": spark}
    with connect(cfg):
        create_tables()
        v = View("reading", ["site", "day", "tag"])
        v.write([("a", "d1", "T1"), ("b", "d2", "T2")])
        # pruned commit touching only d3 collides with T1 stored in d1
        with pytest.raises(ValueError):
            v.write([("c", "d3", "T1")])
        check([("a", "d1", "T1"), ("b", "d2", "T2")], v.read())
        v.write([("c", "d3", "T3")])
        assert len(v.read().all()) == 3

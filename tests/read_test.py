"""Read-path golden tests, ported 1:1 from the reference suite
(/root/reference/tests/read_test.py) — same View calls, same expected
tuples; row order is normalized since Spark gives no implicit order."""

from datetime import date, datetime

from tanker_spark import View, ctx

from .conftest import check, members


def test_filters(session):
    view = View("team", ["name"])
    res = view.read('(= country.name "France")').all()
    assert res == [("Blue",)]

    filters = ['(= country.name "France")', '(= country.name "Belgium")']
    assert view.read(filters).all() == []

    assert view.read("(false)").all() == []
    assert len(view.read("(true)").all()) == 3


def test_no_fields(session):
    view = View("team")
    res = view.read().all()
    expected = [("Blue", "Belgium"), ("Blue", "France"), ("Red", "Belgium")]
    assert sorted(res) == expected


def test_o2m(session):
    view = View("country", ["name", "teams.name"])
    res = view.read().all()
    expected = [
        ("Belgium", "Blue"),
        ("Belgium", "Red"),
        ("France", "Blue"),
        ("Holland", None),
    ]
    check(expected, res)


def test_args(session):
    ctx.cfg["cfg_team"] = "Red"
    view = View("team", ["name"])

    rows = view.read("(= name {name})").args(name="Blue")
    assert sorted(rows) == [("Blue",), ("Blue",)]

    rows = view.read("(= name {0})").args("Red")
    assert sorted(rows) == [("Red",)]

    args = ["Red", "Blue"]
    rows = view.read("(or (= name {0}) (= name {1}))", args=args)
    assert sorted(rows) == [("Blue",), ("Blue",), ("Red",)]
    assert args == ["Red", "Blue"]

    rows = view.read("(= name {})").args("Red")
    assert sorted(rows) == [("Red",)]
    args = ["Red", "Blue"]
    rows = view.read("(or (= name {}) (= name {}))", args=args)
    assert sorted(rows) == [("Blue",), ("Blue",), ("Red",)]
    assert args == ["Red", "Blue"]

    rows = view.read("(in name {cfg_team})")
    assert sorted(rows) == [("Red",)]

    rows = view.read("(in name {names})").args(names=["Red", "Blue"])
    assert sorted(rows) == [("Blue",), ("Blue",), ("Red",)]

    class Obj:
        pass

    obj = Obj()
    obj.name = "Blue"
    rows = view.read("(in name {obj.name})").args(obj=obj)
    assert sorted(rows) == [("Blue",), ("Blue",)]

    rows = view.read("(in name {data.name})").args(data={"name": "Red"})
    assert sorted(rows) == [("Red",)]


def test_limit_order(session):
    view = View("country", ["name"])
    assert view.read(limit=1, order="name").all() == [("Belgium",)]
    assert view.read(limit=1, order=("name", "DESC")).all() == [("Holland",)]
    assert view.read(limit=1, order=["name", "name"]).all() == [("Belgium",)]
    res = view.read(limit=1, order=['(!= name "Belgium")']).all()
    assert res == [("Belgium",)]


def test_offset(session):
    view = View("country", ["name"])
    assert view.read(order="name", offset=1, limit=1).all() == [("France",)]


def test_aliases(session):
    now = datetime.now()
    ctx.aliases.update({"now": now})
    view = View("country", ["name", "{now}"])
    res = view.read().all()
    assert all(r[1] == now for r in res)

    ctx.aliases.update({"type": "TYPE"})
    view = View("country", ["name", "{type}"])
    res = view.read('(= name "France")').all()
    assert res == [("France", "TYPE")]


def test_field_eval(session):
    view = View("country", ['(= name "Belgium")'])
    res = view.read(order="name").all()
    assert res == [(True,), (False,), (False,)]


def test_aggregation(session):
    assert View("country", ["(count)"]).read().all() == [(3,)]
    assert View("country", ["(sum 1)"]).read().all() == [(3,)]
    assert View("country", ["(min 1)"]).read().all() == [(1,)]
    assert View("country", ["(max 1)"]).read().all() == [(1,)]
    assert View("country", ["(max (+ 1 1))"]).read().all() == [(2,)]

    view = View("team", ["name", "(count)"])
    res = view.read(groupby="name", order="name").all()
    assert res == [("Blue", 2), ("Red", 1)]

    view = View("team", ["(max name)", "(count)"])
    assert view.read().all() == [("Red", 3)]

    view = View("team", ["(max name)"])
    res = view.read(groupby="country.name", order="country.name").all()
    assert res == [("Red",), ("Blue",)]

    view = View("team", ["name", "(count)"])
    res = view.read(order="name").all()
    assert res == [("Blue", 2), ("Red", 1)]

    view = View(
        "team", {"cnt": "(count)", "country_match": "(isnot country null)"}
    )
    for c, _ in view.read(groupby="country_match"):
        assert c == 3

    for c, _ in view.read(groupby="(isnot country null)"):
        assert c == 3

    view = View("team", "(count)")
    res = view.read(groupby=["name", "country"]).all()
    for (c,) in res:
        assert c == 1


def test_having(session):
    import pytest

    # plain aggregate predicate, auto-groupby
    view = View("team", ["name", "(count)"])
    res = view.read(having="(> (count) 1)", order="name").all()
    assert res == [("Blue", 2)]

    # list = AND of predicates; expression over aggregates
    res = view.read(
        having=["(>= (count) 1)", "(< (count) 2)"], order="name"
    ).all()
    assert res == [("Red", 1)]

    # explicit groupby + having on a different aggregate than selected:
    # only Belgium has two teams, whose max name is Red
    view = View("team", ["(max name)"])
    res = view.read(
        groupby="country.name", having="(> (count) 1)"
    ).all()
    assert res == [("Red",)]

    # uncorrelated scalar subquery in having (TPC-H Q11 shape):
    # countries holding more than their fair share of teams
    view = View("team", {"c": "country.name", "n": "(count)"})
    res = view.read(
        having="(> (count) (from team (select (* 0.5 (count)))))",
        order="c",
    ).all()
    assert res == [("Belgium", 2)]

    # having without aggregation is an error
    with pytest.raises(ValueError):
        View("team", ["name"]).read(having="(> (count) 1)").all()

    # EXISTS in having, correlated on the group key: keep only the
    # Belgium group (the fk id column `country` is the grouping key)
    res = View("team", {"c": "country", "n": "(count)"}).read(
        groupby="country",
        having='(exists (from country (where (= id _parent.country) '
               '(= name "Belgium"))))',
    ).all()
    assert [n for _, n in res] == [2]

    # NOT EXISTS flips it: the non-Belgium group survives
    res = View("team", {"c": "country", "n": "(count)"}).read(
        groupby="country",
        having='(not (exists (from country (where (= id _parent.country)'
               ' (= name "Belgium")))))',
    ).all()
    assert [n for _, n in res] == [1]

    # correlated scalar subquery in having: each group compared against
    # a per-group scalar (here: total teams of the same country — an
    # identity, AND-ed with a real cut to prove both evaluate)
    res = View("team", {"c": "country", "n": "(count)"}).read(
        groupby="country",
        having=["(= (count) (from team (select (count)) "
                "(where (= country _parent.country))))",
                "(> (count) 1)"],
    ).all()
    assert [n for _, n in res] == [2]


def test_having_agg_alias_shadows_group_key(session):
    """An aggregate output aliased to the SAME name as the group-key
    source column must survive correlated-HAVING lowering: the
    correlation helper re-exposes the group key under its source name,
    which previously clobbered the aggregate column silently (the
    result returned the country id instead of the count)."""
    res = View("team", {"country": "(count)"}).read(
        groupby="country",
        having='(exists (from country (where (= id _parent.country) '
               '(= name "Belgium"))))',
    ).all()
    # the Belgium group has 2 teams — the field must be the COUNT
    assert res == [(2,)]


def test_cast(session):
    for (i,) in View("country", ["(cast id (varchar))"]).read():
        assert isinstance(i, str)
    for (i,) in View("country", ["(cast id (float))"]).read():
        assert isinstance(i, float)

    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)

    for (x,) in View("member", ['(cast "1" (integer))']).read():
        assert isinstance(x, int)
    for (i,) in View("country", ["(cast id (bool))"]).read():
        assert isinstance(i, bool)
    for (x,) in View("member", ["(cast created_at (date))"]).read():
        assert isinstance(x, date)
    for (x,) in View("member", ['(cast "1970-01-01" (timestamp))']).read():
        assert isinstance(x, datetime)


def test_like_ilike(session):
    view = View("country", ["name"])
    res = view.read('(like name "%e%")').all()
    check([("Belgium",), ("France",)], res)

    res = view.read('(ilike name "H%")').all()
    assert res == [("Holland",)]

    res = view.read("(ilike name {prefix})", args={"prefix": "H%"}).all()
    assert res == [("Holland",)]


def test_array(session):
    data = {
        "int": [(1, [1, 2])],
        "float": [(1, [1.0, 2.0])],
        "bool": [(1, [True, False])],
    }
    for kind in data:
        datum = data[kind]
        view = View("kitchensink", ["index", "%s_array" % kind])
        view.write(datum)
        res = [(i, list(a)) for i, a in view.read().all()]
        assert res == datum

    view = View("kitchensink", ["index", "int_array"])
    res = view.read("(= 1 (any int_array))").all()
    assert len(res) == 1
    res = view.read("(!= 3 (all int_array))").all()
    assert len(res) == 1

    res = View("kitchensink", ["index", "(unnest int_array)"]).read().all()
    assert len(res) == 2


def test_jsonb(session):
    data = [(1, {"ham": "spam"})]
    view = View("kitchensink", ["index", "jsonb"])
    view.write(data)

    res = view.read().all()
    assert res[0][1]["ham"] == "spam"

    res = view.read('(= "spam" (->> jsonb "ham"))').all()
    assert len(res) == 1
    assert res[0][1]["ham"] == "spam"


def test_bytea(session):
    payload = b"\x1d\xea\xdb\xee\xff"
    view = View("kitchensink", ["index", "bytea"])
    view.write([(1, payload)])
    res = view.read().all()
    assert bytes(res[0][1]) == payload


def test_distinct(session):
    view = View("team", ["country.name"])
    expected = sorted(set(view.read().all()))
    res = sorted(view.read(distinct=True).all())
    assert res == expected


def test_dict_filter(session):
    view = View("team", ["name"])
    res = view.read({"country.name": "France"}).all()
    assert res == [("Blue",)]

"""ACL read/write golden tests, ported from /root/reference/tests/acl_test.py."""

from tanker_spark import View, ctx

from .conftest import members

member_cols = [
    "name", "team.country.name", "team.name", "registration_code",
]


def inject(table, kind, rules):
    assert kind in ("acl-read", "acl-write")
    ctx.cfg[kind] = {table: rules}


def test_read(session):
    inject("country", "acl-read", ['(= name "Belgium")'])
    res = View("country", ["name"]).read().all()
    assert res == [("Belgium",)]

    inject("team", "acl-read", ['(= country.name "Belgium")'])
    res = sorted(View("team", ["name"]).read().all())
    assert res == [("Blue",), ("Red",)]


def test_insert(session):
    inject("member", "acl-write", ['(= registration_code "001")'])
    view = View("member", ["registration_code", "name"])
    cnt = view.write([("001", "Bob"), ("002", "Alice")])
    assert cnt["filtered"] == 1
    (bob,) = view.read().all()
    assert bob == ("001", "Bob")
    view.delete()

    # insert with a filter on a relation: predicate must read the NEW
    # (incoming) values (reference view.py:606-609)
    inject("member", "acl-write", ['(= team.name "Blue")'])
    cnt = View("member", member_cols).write([
        ["Bob", "Belgium", "Blue", "001"],
        ["Alice", "Belgium", "Red", "002"],
    ])
    assert cnt["filtered"] == 1
    (bob,) = view.read().all()
    assert bob == ("001", "Bob")


def test_update_simple_filter(session):
    inject("member", "acl-write", [])
    View("member", member_cols).write(members)

    inject("member", "acl-write", ['(= registration_code "001")'])
    view = View("member", ["registration_code", "name"])
    cnt = view.write([("001", "BOB"), ("002", "ALICE")])
    assert cnt["filtered"] == 1
    res = View("member", ["name"]).read().all()
    assert sorted(name for (name,) in res) == ["Alice", "BOB", "Trudy"]


def test_update_relation_filter(session):
    inject("member", "acl-write", [])
    View("member", member_cols).write(members)

    inject("member", "acl-write", ['(= team.name "Blue")'])
    view = View("member", ["registration_code", "name"])
    view.write([("001", "BOB"), ("002", "ALICE")])
    res = view.read('(in registration_code "001" "002")').all()
    assert sorted(res) == [("001", "BOB"), ("002", "Alice")]

    # the transition test: changing the very column the filter reads —
    # BOTH legs must pass: the new-values leg blocks 001 (incoming Red),
    # the old-values leg blocks 002 (stored Red), so neither row changes
    view = View(
        "member", ["registration_code", "team.name", "team.country.name"]
    )
    view.write([
        ("001", "Red", "Belgium"),
        ("002", "Blue", "Belgium"),
    ])
    res = view.read('(in registration_code "001" "002")').all()
    assert sorted(res) == [
        ("001", "Blue", "Belgium"),
        ("002", "Red", "Belgium"),
    ]


def test_write_filter_with_exists(session):
    """An (exists ...) subquery in an ACL-write rule (reference: write
    filters flow through the same expression pipeline as reads,
    view.py:351-365 + expression.py:160 — so subqueries work there)."""
    inject("member", "acl-write", [])
    View("member", member_cols).write(members)

    # only members of teams that have a Belgian country row may be
    # written: incoming rows for French teams are filtered out
    inject("member", "acl-write", [
        '(exists (from team (select 1) (where (= id _parent.team) '
        '(= country.name "Belgium"))))'
    ])
    view = View("member", ["registration_code", "name"])
    cnt = view.write([("001", "BOB"), ("003", "TRUDY")])
    # 001 is on Blue/Belgium -> allowed; 003 is on Blue/France -> blocked
    assert cnt["filtered"] == 1
    res = View("member", ["name"]).read().all()
    assert sorted(n for (n,) in res) == ["Alice", "BOB", "Trudy"]


def test_delete_filter_with_exists(session):
    """Subquery in delete filters (the delete path applies the same
    semi-join lowering as read)."""
    inject("member", "acl-write", [])
    View("member", member_cols).write(members)
    cnt = View("member", ["registration_code"]).delete(
        '(exists (from team (select 1) (where (= id _parent.team) '
        '(= country.name "France"))))'
    )
    res = View("member", ["name"]).read().all()
    assert sorted(n for (n,) in res) == ["Alice", "Bob"]

"""Planner behavior tests — the Spark analog of the reference's
expression_static_test.py SQL-text asserts (SURVEY §5: replaced with
plan/Column assertions + behavioral checks)."""

from tanker_spark import View
from tanker_spark.expression import EnvContext, ExpressionCompiler
from tanker_spark.table import Table

from .conftest import members


def test_join_dedup(session):
    """Identical join keys reuse one alias (reference
    expression_static_test.py:77-91)."""
    compiler = ExpressionCompiler(Table.get("member"))
    env = EnvContext()
    compiler.compile(compiler.parse('(= team.country.name "BE")'), env)
    n1 = len(compiler.planner.joins)
    compiler.compile(compiler.parse('(= team.country.name "FR")'), env)
    assert len(compiler.planner.joins) == n1 == 2  # member→team→country
    # a path sharing the first hop adds only one more join
    compiler.compile(compiler.parse('(= team.name "x")'), env)
    assert len(compiler.planner.joins) == 2


def test_exists_in_and(session):
    """(and (exists ...) conds) lifts the semi-join
    (reference expression_static_test.py:93-109)."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)

    res = View("team", ["name"]).read(
        "(and "
        "(exists (from member (select 1) (where (= team _parent.id)))) "
        '(= country.name "Belgium"))'
    ).all()
    # Belgian teams having members: Blue (Bob), Red (Alice)
    assert sorted(res) == [("Blue",), ("Red",)]


def test_exists_two_hop_parent(session):
    """Correlated EXISTS whose subquery walks a dotted path
    (reference expression_static_test.py:112-128 multi-parent class)."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(exists (from member (select 1) "
        "(where (= team.country _parent.id))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",)]


def test_not_exists(session):
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(not (exists (from member (select 1) "
        "(where (= team.country _parent.id)))))"
    ).all()
    assert res == [("Holland",)]


def test_in_from_subquery(session):
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (= name \"Blue\"))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",)]

    res = View("country", ["name"]).read(
        "(notin id (from team (select country) (where (= name \"Blue\"))))"
    ).all()
    assert sorted(res) == [("Holland",)]


def test_or_exists(session):
    """EXISTS under OR lowers to a disjoint union of branches."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write([("Bob", "Belgium", "Blue", "001")])
    res = View("team", ["name", "country.name"]).read(
        '(or (exists (from member (select 1) '
        '(where (= team _parent.id)))) (= name "Red"))'
    ).all()
    # teams with members: Blue/Belgium; plus name=Red: Red/Belgium
    assert sorted(res) == [("Blue", "Belgium"), ("Red", "Belgium")]


def test_or_in_subquery_with_and(session):
    """(or (and ...) (in ...)) — subquery in one disjunct, AND in other."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        '(or (in id (from team (select country) (where (= name "Red")))) '
        '(= name "Holland"))'
    ).all()
    assert sorted(res) == [("Belgium",), ("Holland",)]


def test_or_not_exists(session):
    """A NOT-EXISTS disjunct is ordered last and never excluded."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write([("Bob", "Belgium", "Blue", "001")])
    res = View("country", ["name"]).read(
        "(or (not (exists (from member (select 1) "
        '(where (= team.country _parent.id))))) (= name "France"))'
    ).all()
    # countries without members: France, Holland; plus France (dedup'd
    # by disjoint-branch construction, no double row)
    assert sorted(res) == [("France",), ("Holland",)]


def test_nested_subquery_one_level(session):
    """A subquery inside a subquery's WHERE, correlation depth 1."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where "
        "(exists (from member (select 1) (where (= team _parent.id)))))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",)]


def test_multi_parent(session):
    """_parent._parent correlation two levels up (reference
    expression_static_test.py:112-128 test_multi_parent)."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    cursor = View("country", ["name"]).read(
        "(in id (from team (select country) (where (in id "
        "(from member (select team) (where (= team _parent.id) "
        "(!= name _parent._parent.name)))))))"
    )
    res = cursor.all()
    # every member name differs from its team's country name → all
    # countries that have a team with members
    assert sorted(res) == [("Belgium",), ("France",)]
    # the flattened nested frame must not plan a cartesian product:
    # Catalyst pushes the lifted team↔member equality into the join
    plan = cursor.frame()._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multi_parent_negative(session):
    """Same shape, but the deep-correlated predicate filters everything."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (in id "
        "(from member (select team) (where (= team _parent.id) "
        "(= name _parent._parent.name)))))))"
    ).all()
    assert res == []


def test_pushdown_in_plan(session):
    """Filters on stored tables reach the parquet scan (PushedFilters) and
    only referenced columns are read (ReadSchema pruning)."""
    cursor = View("team", ["name"]).read('(= country.name "Belgium")')
    plan = cursor.frame()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(name), EqualTo(name,Belgium)]" in plan \
        or "EqualTo(name,Belgium)" in plan


def test_deep_not_exists(session):
    """NOT EXISTS correlated past its immediate parent
    (_parent._parent under negation — reference expression.py:320-329;
    lowered via the pair-frame row-id path)."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (not (exists "
        "(from member (select 1) (where (= team _parent.id) "
        "(= name _parent._parent.name))))))))"
    ).all()
    # no member is ever named like its team's country → the NOT EXISTS
    # holds for every team → all countries that have a team
    assert sorted(res) == [("Belgium",), ("France",)]
    # flipping the deep predicate to != finds a differing-name member on
    # every team → NOT EXISTS never holds → empty
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (not (exists "
        "(from member (select 1) (where (= team _parent.id) "
        "(!= name _parent._parent.name))))))))"
    ).all()
    assert res == []


def test_not_over_and_demorgan(session):
    """(not (and (exists ...) cond)) auto-applies De Morgan:
    → (or (not (exists ...)) (not cond)). Round-3 VERDICT item 1."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("team", ["name", "country.name"]).read(
        "(not (and "
        "(exists (from member (select 1) (where (= team _parent.id)))) "
        '(= country.name "Belgium")))'
    ).all()
    # every team has members, so only the non-Belgian team survives
    assert sorted(res) == [("Blue", "France")]


def test_not_over_or_of_exists(session):
    """(not (or (exists A) (exists B))) → NOT EXISTS A AND NOT EXISTS B."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(not (or "
        "(exists (from team (select 1) "
        '(where (= country _parent.id) (= name "Red")))) '
        "(exists (from member (select 1) "
        '(where (= team.country _parent.id) (= name "Trudy"))))))'
    ).all()
    # Belgium has a Red team, France has Trudy — only Holland survives
    assert res == [("Holland",)]


def test_double_negation(session):
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(not (not (exists (from team (select 1) "
        "(where (= country _parent.id))))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",)]


def test_or_nested_or_inside_and(session):
    """OR-of-subqueries nested inside AND inside OR (round-3 VERDICT
    item 6: expression.py corner) — nested ors ride on the disjunct."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        '(or (= name "Holland") (and (= name "France") (or '
        "(exists (from team (select 1) "
        '(where (= country _parent.id) (= name "Blue")))) '
        "(exists (from team (select 1) "
        '(where (= country _parent.id) (= name "Red")))))))'
    ).all()
    # Holland by name; France has a Blue team; Belgium matches neither
    assert sorted(res) == [("France",), ("Holland",)]


def test_deep_parent_under_or(session):
    """_parent._parent correlation inside an OR disjunct at top scope
    (round-3 VERDICT item 6: view.py corner) — routed through the
    branch/rid paths instead of raising."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    # one hard disjunct (deep flattened IN) + one plain
    res = View("country", ["name"]).read(
        '(or (= name "Holland") (in id (from team (select country) '
        "(where (in id (from member (select team) (where "
        "(= team _parent.id) (!= name _parent._parent.name))))))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",), ("Holland",)]
    # two hard disjuncts (deep NOT-EXISTS + plain NOT-EXISTS) → rid path
    res = View("country", ["name"]).read(
        "(or (in id (from team (select country) (where (not (exists "
        "(from member (select 1) (where (= team _parent.id) "
        "(= name _parent._parent.name)))))))) "
        "(not (exists (from team (select 1) "
        "(where (= country _parent.id))))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",), ("Holland",)]


def test_pair_frame_pins_released(session):
    """The row-id pair frames persisted by the deep-correlated lowering
    are unpersisted once the cursor materializes — repeated queries in a
    long-lived session must not accumulate cached frames (ADVICE r3)."""
    from tanker_spark import view as view_mod

    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    q = (
        "(in id (from team (select country) (where (not (exists "
        "(from member (select 1) (where (= team _parent.id) "
        "(= name _parent._parent.name))))))))"
    )
    for _ in range(3):
        cursor = View("country", ["name"]).read(q)
        assert sorted(cursor.all()) == [("Belgium",), ("France",)]
    assert view_mod._ALL_PINS == []
    assert view_mod._PIN_LOG == []
    # re-materializing a released cursor recompiles and stays correct
    assert sorted(cursor.all()) == [("Belgium",), ("France",)]
    assert view_mod._ALL_PINS == []


def test_or_two_not_exists(session):
    """OR with two hard (NOT-EXISTS) disjuncts → row-id union path."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(or (not (exists (from member (select 1) "
        "(where (= team.country _parent.id))))) "
        "(not (exists (from member (select 1) "
        '(where (= team.country _parent.id) (= name "Bob"))))))'
    ).all()
    # no members at all: Holland; no member named Bob: France, Holland
    assert sorted(res) == [("France",), ("Holland",)]


def test_or_with_parent_cond_in_sub(session):
    """An OR inside a subquery whose disjuncts reference the enclosing
    frame (_parent in a plain cond) — deferred to the pair frame."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (or "
        '(= name _parent.name) (= name "Blue")))))'
    ).all()
    # no team is named like its country; Blue teams exist in BE and FR
    assert sorted(res) == [("Belgium",), ("France",)]


def test_deep_not_exists_under_or(session):
    """NOT EXISTS with _parent._parent correlation inside an OR
    disjunct — the deferral + row-id union composition."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    res = View("country", ["name"]).read(
        "(in id (from team (select country) (where (or "
        '(= name "Red") '
        "(not (exists (from member (select 1) (where "
        "(= team _parent.id) (!= name _parent._parent.name)))))))))"
    ).all()
    # every team's members differ from the country name → the NOT
    # EXISTS disjunct never holds; only the Red team (Belgium) matches
    assert res == [("Belgium",)]


def test_scalar_subquery_plan_shapes(session):
    """Scalar subqueries lower to join plans, never nested loops:
    equality-correlated aggregates decorrelate (HashAggregate +
    equi-join), uncorrelated scalars broadcast — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)
    # correlated equi (Q17 shape)
    f = View("member", ["name"]).read(
        "(= name (from member (select (max name)) "
        "(where (= team _parent.team))))"
    ).frame()
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan  # Hash/Sort/ObjectHashAggregate
    assert "HashJoin" in plan   # decorrelated equi-join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # uncorrelated: the 1-row aggregate frame is broadcast
    f = View("member", ["name"]).read(
        "(> (length name) (from member (select (avg (length name)))))"
    ).frame()
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_having_subquery_plan_shapes(session):
    """Round-5 HAVING lowerings stay hash-join-shaped: EXISTS in HAVING
    becomes a LeftSemi hash join on the re-exposed group key;
    correlated scalars decorrelate to an equi-join — no
    CartesianProduct / nested loops anywhere in either plan."""
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)

    f = View("team", {"c": "country", "n": "(count)"}).read(
        groupby="country",
        having='(exists (from country (where (= id _parent.country) '
               '(= name "Belgium"))))',
    ).frame()
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    f = View("team", {"c": "country", "n": "(count)"}).read(
        groupby="country",
        having="(> (count) (from member (select (count)) "
               "(where (= team _parent.country))))",
    ).frame()
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

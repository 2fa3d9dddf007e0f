"""Unknown-head passthrough to Spark SQL's function registry, and the
extended statistical aggregate heads.

The reference evaluates unknown heads to a bare string and DISCARDS the
arguments (/root/reference/tanker/expression.py:356-366); resolving
against the SQL registry is strictly more useful and fails fast on a
genuinely unknown name.
"""

import pytest

from tanker_spark import View

from .conftest import members


def _load():
    View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    ).write(members)


def test_scalar_passthrough(session):
    _load()
    res = View("member", {
        "ab": "(substring name 1 2)",
        "shout": '(concat name "!")',
        "name": "name",
    }).read(order="name").all()
    assert res[0] == ("Al", "Alice!", "Alice")
    assert [r[0] for r in res] == ["Al", "Bo", "Tr"]


def test_passthrough_in_filter(session):
    _load()
    res = View("member", ["name"]).read(
        '(= (substring name 1 1) "B")'
    ).all()
    assert res == [("Bob",)]


def test_stat_aggregates_detected(session):
    """stddev/median/percentile/count-distinct are registered AGGREGATE
    heads: auto-GROUP-BY must treat them as aggregates (grouping on the
    one plain column), not as scalars."""
    _load()
    res = View("member", {
        "c": "team.country.name",
        "med": "(median (length name))",
        "n": "(count-distinct name)",
    }).read(order="c").all()
    # Belgium: Bob(3), Alice(5) → median 4.0; France: Trudy(5)
    assert res == [("Belgium", 4.0, 2), ("France", 5.0, 1)]


def test_global_stat_aggregate(session):
    _load()
    ((sd, p),) = View("member", {
        "sd": "(round (stddev (length name)) 4)",
        "p": "(percentile (length name) 0.5)",
    }).read().all()
    # lengths 3,5,5: sample stddev = 2/sqrt(3) ≈ 1.1547
    assert sd == 1.1547 and p == 5.0


def test_unknown_function_fails_at_analysis(session):
    from pyspark.errors import AnalysisException

    _load()
    with pytest.raises(AnalysisException):
        View("member", {"x": "(no_such_fn name 1)"}).read().all()


def test_zero_arg_head_still_shielded(session):
    """The `(varchar)` / `(epoch)` rule: a zero-arg unknown head is a
    bare token (cast targets), not a registry call."""
    _load()
    res = View("member", {"n": '(cast registration_code (integer))'}).read(
        order="n"
    ).all()
    assert [r[0] for r in res] == [1, 2, 3]


def test_rollup_and_cube(session):
    """GROUP BY ROLLUP/CUBE: super-aggregate rows with NULL group keys."""
    _load()
    rows = View("member", {
        "c": "team.country.name",
        "t": "team.name",
        "n": "(count)",
    }).read(groupby=["team.country.name", "team.name"], rollup=True).all()
    as_map = {(r[0], r[1]): r[2] for r in rows}
    assert as_map[(None, None)] == 3          # grand total
    assert as_map[("Belgium", None)] == 2     # per-country subtotal
    assert as_map[("Belgium", "Blue")] == 1
    cube = View("member", {
        "c": "team.country.name",
        "t": "team.name",
        "n": "(count)",
    }).read(groupby=["team.country.name", "team.name"], cube=True).all()
    cmap = {(r[0], r[1]): r[2] for r in cube}
    assert cmap[(None, "Blue")] == 2          # cube-only slice
    with pytest.raises(ValueError):
        View("member", {"n": "(count)"}).read(rollup=True).all()


def test_grouping_sets(session):
    """GROUP BY GROUPING SETS: exactly the requested slices, no forced
    detail level (unlike rollup/cube)."""
    _load()
    rows = View("member", {
        "c": "team.country.name",
        "t": "team.name",
        "n": "(count)",
    }).read(
        groupby=["team.country.name", "team.name"],
        grouping_sets=[["team.country.name"], ["team.name"], []],
    ).all()
    as_map = {(r[0], r[1]): r[2] for r in rows}
    assert as_map[(None, None)] == 3          # grand total
    assert as_map[("Belgium", None)] == 2     # per-country slice
    assert as_map[(None, "Blue")] == 2        # per-team slice
    assert ("Belgium", "Blue") not in as_map  # detail level NOT present
    assert len(rows) == 5  # 2 countries + 2 teams + grand total

    # a single-column set may be given as a bare string
    rows = View("member", {
        "c": "team.country.name", "n": "(count)",
    }).read(
        groupby=["team.country.name"],
        grouping_sets=["team.country.name", []],
    ).all()
    assert {(r[0], r[1]) for r in rows} == {
        ("Belgium", 2), ("France", 1), (None, 3)
    }

    # set entries outside the groupby are rejected
    with pytest.raises(ValueError):
        View("member", {
            "c": "team.country.name", "n": "(count)",
        }).read(
            groupby=["team.country.name"], grouping_sets=[["name"]],
        ).all()


def test_window_functions(session):
    """(over fn (partition ...) (order ...)) — window functions from the
    View surface; aggregates inside a window do NOT trigger
    auto-GROUP-BY."""
    _load()
    rows = View("member", {
        "name": "name",
        "rk": "(over (row_number) (partition team) (order name))",
        "team_size": "(over (count) (partition team))",
        "prev": "(over (lag name) (partition team) (order name))",
    }).read(order="name").all()
    by_name = {r[0]: r[1:] for r in rows}
    assert len(rows) == 3                    # row-level, not aggregated
    assert by_name["Bob"] == (1, 1, None)    # alone on Blue(BE)
    assert by_name["Alice"][1] == 1
    # rank over global window (no partition)
    g = View("member", {
        "name": "name",
        "r": "(over (rank) (order (desc (length name)) name))",
    }).read(order="name").all()
    gm = dict(g)
    assert gm["Alice"] == 1 and gm["Trudy"] == 2 and gm["Bob"] == 3
    # window in a filter is rejected by Spark with a clear error
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        View("member", ["name"]).read(
            "(= 1 (over (row_number) (partition team) (order name)))"
        ).all()


def test_qualify(session):
    """read(qualify=...) filters on a window predicate (the QUALIFY
    clause SQL's WHERE can't express); survives the ordered-read frame
    rebuild and composes with aggregation."""
    _load()
    rows = View("member", ["name", "team.name"]).read(
        qualify="(= 1 (over (row_number) (partition team) (order name)))",
        order="name",
    ).all()
    # one member per team: Bob (Blue/BE), Alice (Red/BE), Trudy (Blue/FR)
    assert [r[0] for r in rows] == ["Alice", "Bob", "Trudy"]
    # aggregated read: qualify filters ROWS before grouping
    agg = View("member", {"n": "(count)"}).read(
        qualify="(= 1 (over (row_number) (partition team) (order name)))",
    ).all()
    assert agg == [(3,)]


def test_window_plan_single_exchange(session):
    """Both window fields share one partition spec → Catalyst fuses
    them into a single Window node over a single hash exchange (the
    second exchange is the final ORDER BY range partitioning)."""
    _load()
    f = View("member", {
        "name": "name",
        "rk": "(over (row_number) (partition team) (order name))",
        "n": "(over (count) (partition team) (order name))",
    }).read().frame()
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") == 1


def test_qualify_with_subqueries(session):
    """Round-5: QUALIFY conjuncts may mix window predicates with
    subqueries (EXISTS / scalar comparisons) — the window parts filter
    via the hidden-column trick (evaluated FIRST, on the unfiltered
    frame, SQL semantics), subquery parts reuse the WHERE lowerings."""
    _load()
    # window top-1-per-team AND the team has a Belgian country
    rows = View("member", ["name"]).read(
        qualify="(and (= 1 (over (row_number) (partition team) "
                "(order name))) (exists (from country "
                '(where (= name "Belgium") (in id (from team '
                "(select country) (where (= id _parent._parent.team)"
                ")))))))",
        order="name",
    ).all()
    assert [r[0] for r in rows] == ["Alice", "Bob"]

    # window predicate AND an uncorrelated scalar comparison
    rows = View("member", ["name"]).read(
        qualify="(and (= 1 (over (row_number) (partition team) "
                "(order name))) (>= (length name) (from member "
                "(select (min (length name))))))",
        order="name",
    ).all()
    assert [r[0] for r in rows] == ["Alice", "Bob", "Trudy"]


def test_qualify_dotted_path_registers_join(session):
    """A qualify window partitioned on a not-otherwise-referenced dotted
    path must register (and get) its join before the frame builds."""
    _load()
    rows = View("member", ["name"]).read(
        qualify="(= 1 (over (row_number) "
                "(partition team.country.name) (order name)))",
    ).all()
    # first member per country: Alice (Belgium), Trudy (France)
    assert sorted(rows) == [("Alice",), ("Trudy",)]

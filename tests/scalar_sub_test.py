"""Scalar-subquery comparisons: ``(op x (from t (select (agg y))
(where ...)))``.

The reference supports these for free — any parenthesized SELECT is a
valid SQL operand (/root/reference/tanker/expression.py:213-219); here
they lower via ``View._apply_scalarsub`` into broadcast cross join /
decorrelated groupBy / row-id pair frame (see the docstring there).
"""

import pytest

from tanker_spark import View

from .conftest import members


def _load(include_members=True):
    if include_members:
        View(
            "member",
            ["name", "team.country.name", "team.name", "registration_code"],
        ).write(members)


def test_uncorrelated_agg(session):
    """Members whose name is longer than the average name length.
    Names: Bob(3) Alice(5) Trudy(5); avg = 13/3 ≈ 4.33."""
    _load()
    res = View("member", ["name"]).read(
        "(> (length name) (from member (select (avg (length name)))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Trudy",)]


def test_uncorrelated_nonagg_single_row(session):
    """A non-aggregate scalar select works uncorrelated (one row)."""
    _load()
    res = View("member", ["name"]).read(
        '(= name (from member (select-distinct name) '
        '(where (= registration_code "001"))))'
    ).all()
    assert res == [("Bob",)]


def test_correlated_equi_count(session):
    """Countries having at least one team — Q17-shape decorrelation:
    groupBy the correlation key + equi-join back."""
    res = View("country", ["name"]).read(
        "(>= (from team (select (count)) (where (= country _parent.id))) 1)"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",)]


def test_correlated_count_empty_group_is_zero(session):
    """SQL: a scalar COUNT over zero matching rows is 0, not NULL —
    countries with no teams must satisfy ``(= 0 (count))``."""
    res = View("country", ["name"]).read(
        "(= 0 (from team (select (count)) (where (= country _parent.id))))"
    ).all()
    assert res == [("Holland",)]


def test_correlated_equi_max(session):
    """Members who are their team's alphabetically-last member."""
    _load()
    res = View("member", ["name"]).read(
        "(= name (from member (select (max name)) "
        "(where (= team _parent.team))))"
    ).all()
    # Blue(BE): Bob alone; Red(BE): Alice alone; Blue(FR): Trudy alone
    assert sorted(res) == [("Alice",), ("Bob",), ("Trudy",)]


def test_non_equi_correlation_rid_path(session):
    """Rank-style non-equi correlation: the member preceded by nobody
    alphabetically (count of earlier names = 0) is the global minimum."""
    _load()
    res = View("member", ["name"]).read(
        "(= 0 (from member (select (count)) (where (< name _parent.name))))"
    ).all()
    assert res == [("Alice",)]


def test_not_over_scalar(session):
    """De Morgan: ``(not (> x sub))`` ≡ ``(<= x sub)``."""
    _load()
    res = View("member", ["name"]).read(
        "(not (> (length name) (from member (select (avg (length name))))))"
    ).all()
    assert res == [("Bob",)]


def test_or_with_scalar(session):
    """Scalar comparison under OR goes through the rid union path."""
    _load()
    res = View("member", ["name"]).read(
        '(or (= name "Trudy") '
        "(> (length name) (from member (select (avg (length name))))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Trudy",)]


def test_scalar_with_and_conjunct(session):
    _load()
    res = View("member", ["name"]).read(
        "(and (!= name \"Trudy\") "
        "(>= (length name) (from member (select (min (length name))))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Bob",)]


def test_delete_with_scalar_filter(session):
    """Scalar subqueries work in delete filters (same lowering)."""
    _load()
    View("member").delete(
        "(< (length name) (from member (select (avg (length name)))))"
    )
    res = View("member", ["name"]).read().all()
    assert sorted(res) == [("Alice",), ("Trudy",)]


def test_nested_scalar_in_subquery_where(session):
    """TPC-H Q20 shape: a scalar comparison inside a subquery's WHERE is
    applied while materializing that subquery's frame."""
    _load()
    res = View("team", ["name", "country.name"]).read(
        "(exists (from member (select 1) (where (and "
        "(= team _parent.id) "
        "(> (length name) (from member (select (avg (length name)))))))))"
    ).all()
    # members longer than avg(4.33): Alice (Red/BE), Trudy (Blue/FR)
    assert sorted(res) == [("Blue", "France"), ("Red", "Belgium")]


def test_scalar_correlating_past_enclosing_subquery(session):
    """A scalar inside an EXISTS whose correlation reaches past the
    enclosing subquery (``_parent._parent``): deferred to the ancestor
    pair frame. Countries where SOME member (any country) outtalks the
    average name length of the country's own members — Belgium's avg
    is 4 (Bob 3, Alice 5) and members longer than 4 exist; France's
    avg is 5 with nobody longer; Holland has no members (NULL avg)."""
    _load()
    res = View("country", ["name"]).read(
        "(exists (from member (select 1) (where "
        "(> (length name) (from member (select (avg (length name))) "
        "(where (= team.country _parent._parent.id)))))))"
    ).all()
    assert res == [("Belgium",)]


def test_deep_anti_inside_scalar(session):
    """A deep-correlated NOT EXISTS inside a scalar's WHERE (the
    scalar's pair frame hosts the deferred anti): per-country count of
    teams having no member named differently from the country — every
    team here has such a member, so the count is 0 everywhere."""
    _load()
    res = View("country", ["name"]).read(
        "(= 0 (from team (select (count)) (where (and "
        "(= country _parent.id) "
        "(not (exists (from member (select 1) (where (and "
        "(= team _parent.id) "
        "(!= name _parent._parent.name))))))))))"
    ).all()
    assert sorted(res) == [("Belgium",), ("France",), ("Holland",)]


def test_correlated_nonagg_equi(session):
    """Non-aggregate correlated scalar, equality correlation: the
    decorrelated path takes ONE arbitrary row per group (documented —
    SQL raises on >1 row). Every team here is a singleton, so each
    member's same-team scalar is their own name and the choice is
    deterministic."""
    _load()
    res = View("member", ["name"]).read(
        "(= name (from member (select name) "
        "(where (= team _parent.team))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Bob",), ("Trudy",)]


def test_correlated_nonagg_nonequi(session):
    """Non-aggregate correlated scalar on the row-id pair-frame path
    (non-equi correlation): members differing from SOME earlier-coded
    member's name. Bob has no earlier member (NULL scalar → filtered);
    Alice and Trudy differ from any arbitrary pick."""
    _load()
    res = View("member", ["name"]).read(
        "(!= name (from member (select name) "
        "(where (< registration_code _parent.registration_code))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Trudy",)]

    # equality against the arbitrary pick: Bob → NULL, Alice → "Bob",
    # Trudy → one of {Bob, Alice}; none equals itself → empty
    res = View("member", ["name"]).read(
        "(= name (from member (select name) "
        "(where (< registration_code _parent.registration_code))))"
    ).all()
    assert res == []


def test_correlated_vs_uncorrelated_scalar(session):
    """A correlated scalar compared against another scalar subquery
    (both operand positions are subqueries): teams whose shortest
    member name is shorter than the global average name length."""
    _load()
    res = View("team", ["name", "country.name"]).read(
        "(< (from member (select (min (length name))) "
        "(where (= team _parent.id))) "
        "(from member (select (avg (length name)))))"
    ).all()
    # min lengths: Blue/BE=3 (Bob) < 4.33; Red/BE=5, Blue/FR=5 not
    assert sorted(res) == [("Blue", "Belgium")]


def test_write_filter_with_scalar(session):
    """Scalar subqueries work in ACL-write rules (the write filter legs
    share the read path's marker lowering)."""
    from tanker_spark import ctx

    _load()
    # only members at-or-below the current minimum name length may be
    # inserted: "Jo" (2) passes, "Evangeline" (10) is filtered
    ctx.cfg["acl-write"] = {"member": [
        "(<= (length name) "
        "(from member (select (min (length name)))))",
    ]}
    try:
        cnt = View(
            "member",
            ["name", "team.country.name", "team.name",
             "registration_code"],
        ).write([
            ("Jo", "Belgium", "Blue", "010"),
            ("Evangeline", "Belgium", "Blue", "011"),
        ])
        assert cnt["filtered"] == 1
        names = {r[0] for r in View("member", ["name"]).read().all()}
        assert "Jo" in names and "Evangeline" not in names
    finally:
        ctx.cfg.pop("acl-write", None)


def test_two_scalar_comparison(session):
    """(op sub1 sub2): both uncorrelated scalars broadcast. min name
    length (3) < max name length (5) → all rows pass; flipped → none."""
    _load()
    res = View("member", ["name"]).read(
        "(< (from member (select (min (length name)))) "
        "(from member (select (max (length name)))))"
    ).all()
    assert len(res) == 3
    res = View("member", ["name"]).read(
        "(> (from member (select (min (length name)))) "
        "(from member (select (max (length name)))))"
    ).all()
    assert res == []


def test_two_scalar_one_correlated(session):
    """Uncorrelated scalar on the left, correlated COUNT on the right:
    min name length (3) < per-team member count only never (counts are
    all 1) — then flipped to >= which keeps everyone."""
    _load()
    res = View("member", ["name"]).read(
        "(< (from member (select (min (length name)))) "
        "(from member (select (count)) (where (= team _parent.team))))"
    ).all()
    assert res == []
    res = View("member", ["name"]).read(
        "(>= (from member (select (min (length name)))) "
        "(from member (select (count)) (where (= team _parent.team))))"
    ).all()
    assert sorted(res) == [("Alice",), ("Bob",), ("Trudy",)]


def test_corr_pair_probe_does_not_consume_params(session):
    """The equi-pair extraction re-compiles correlation conjuncts; it
    must not pop positional {} args meant for later filter items."""
    _load()
    res = View("member", ["name"]).read(
        [
            "(>= (from member (select (count)) "
            "(where (= team _parent.team))) {})",
            "(!= name {})",
        ],
        args=[1, "Trudy"],
    ).all()
    assert sorted(res) == [("Alice",), ("Bob",)]


def test_scalar_field(session):
    """Scalar subqueries in FIELD position: per-row attached values."""
    _load()
    res = View("team", {
        "tn": "name",
        "members": "(from member (select (count)) "
                   "(where (= team _parent.id)))",
    }).read(order="tn").all()
    assert sorted(res) == [("Blue", 1), ("Blue", 1), ("Red", 1)]

    # comparison-against-scalar field → boolean column
    res = View("member", {
        "n": "name",
        "long": "(>= (length name) "
                "(from member (select (avg (length name)))))",
    }).read(order="n").all()
    assert res == [("Alice", True), ("Bob", False), ("Trudy", True)]

    # distinct path keeps the attached column
    res = View("member", {
        "c": "team.country.name",
        "total": "(from member (select (count)))",
    }).read(distinct=True, order="c").all()
    assert res == [("Belgium", 3), ("France", 3)]

    # aggregated reads attach scalar fields AFTER aggregation
    # (uncorrelated: one broadcast; the scalar is not a grouping key)
    res = View("member", {
        "n": "(count)",
        "x": "(from member (select (count)))",
    }).read().all()
    assert res == [(3, 3)]

    # correlated on a group key: per-group lookup (the denormalizing
    # dimension fetch — TPC-H style group-then-describe)
    res = View("team", {
        "cname": "(from country (select name) "
                 "(where (= id _parent.country)))",
        "n": "(count)",
    }).read(groupby="country", order="cname").all()
    assert res == [("Belgium", 2), ("France", 1)]

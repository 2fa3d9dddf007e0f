"""Kitchensink type round-trips, s-expression function heads, env
shielding and relation-graph linking (behavior pinned against the
reference's expression suite — same View calls, same expected tuples —
restated as table-driven fixtures)."""

import json
from datetime import date, datetime

import pytest

from tanker_spark import View

#: column name → value the type must round-trip; names double as
#: reserved-word pins (true/false/null/integer/... are all legal
#: identifiers in the grammar)
KITCHENSINK_ROW = {
    "index": 1,
    "true": True,
    "false": False,
    "null": None,
    "integer": 1,
    "bigint": 10_000_000_000,
    "float": 1.0,
    "bool": True,
    "timestamp": datetime(1970, 1, 1),
    "date": date(1970, 1, 1),
    "varchar": "varchar",
    "bytea": b"\x00",
    "int_array": [1, 2],
    "bool_array": [True, False],
    "ts_array": [datetime(1970, 1, 1), datetime(1970, 1, 2)],
    "char_array": ["ham", "spam"],
    "jsonb": '{"ham": "spam"}',
}

#: value normalizers for columns whose Spark representation differs
#: from the python input
NORM = {
    "bytea": bytes,
    "jsonb": lambda v: v,  # read side returns parsed json
    "int_array": list,
    "bool_array": list,
    "ts_array": list,
    "char_array": list,
}


def _written_kitchensink():
    view = View("kitchensink", list(KITCHENSINK_ROW))
    view.write([KITCHENSINK_ROW])
    return view


def test_type_roundtrip(session):
    view = _written_kitchensink()
    got = list(view.read().dict())[0]
    for col, sent in KITCHENSINK_ROW.items():
        back = NORM.get(col, lambda v: v)(got[col])
        expected = json.loads(sent) if col == "jsonb" else sent
        assert back == expected, col


def test_scalar_filter_roundtrip(session):
    view = _written_kitchensink()
    for col, sent in KITCHENSINK_ROW.items():
        if isinstance(sent, list):
            continue  # array equality is not a scalar predicate
        head = "is" if sent is None else "="
        assert len(view.read("(%s %s {})" % (head, col),
                             args=[sent]).all()) == 1, col


def test_null_overwrite(session):
    view = _written_kitchensink()
    nulled = {c: (1 if c == "index" else None) for c in KITCHENSINK_ROW}
    view.write([nulled])
    got = list(view.read().dict())[0]
    assert all(got[c] is None for c in nulled if c != "index")


#: projection s-expression → expected value over FUNC_ROW
FUNC_ROW = {"index": 1, "floor": 1.1,
            "epoch": datetime(1970, 1, 1), "year": datetime(1970, 1, 1)}
FUNC_CASES = [
    ("(floor floor)", 1),
    ("(extract (epoch) epoch)", 0),
    ("(extract (year) year)", 1970),
    ("floor", 1.1),
    ("(* floor 2)", 2.2),
]


def test_function_heads(session):
    View("kitchensink").write([FUNC_ROW])
    exprs = [e for e, _ in FUNC_CASES]
    (row,) = View("kitchensink", exprs).read().all()
    assert row == tuple(v for _, v in FUNC_CASES)


@pytest.mark.parametrize("fields", [
    {"name": "(max name)"},   # alias shadows a column name
    {"max": "(max name)"},    # head position is shielded from env
])
def test_env_shielding(session, fields):
    (res,) = View("team", fields).read().all()
    assert res[0] == "Red"


def test_alias_in_filter_and_order(session):
    view = View("team", {"first_name": "name"})
    (res,) = view.read('(= first_name "Blue")',
                       order="first_name", limit=1).all()
    assert res[0] == "Blue"


@pytest.mark.parametrize("src, dst, expected_path", [
    ("team", "country", ["country"]),
    ("member", "country", ["team", "country"]),
])
def test_link(session, src, dst, expected_path):
    """Relation-graph BFS between tables (shortest FK path first)."""
    from tanker_spark import Table

    paths = Table.get(src).link(Table.get(dst))
    assert paths
    assert [c.name for c in paths[0]] == expected_path

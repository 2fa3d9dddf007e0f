"""Kitchensink type round-trip + function tests, ported from
/root/reference/tests/expression_test.py."""

import json
from datetime import date, datetime

from tanker_spark import View


def test_reserved_words(session):
    record = {
        "index": 1,
        "true": True,
        "false": False,
        "null": None,
        "integer": 1,
        "bigint": 10000000000,
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
    ks_view = View("kitchensink", list(record.keys()))
    ks_view.write([record])
    res = list(ks_view.read().dict())[0]
    for k, v in record.items():
        if k == "bytea":
            assert bytes(res[k]) == v
        elif k == "jsonb":
            assert res[k] == json.loads(v)
        elif k.endswith("array"):
            assert list(res[k]) == v
        else:
            assert res[k] == v

    # Filters round-trip on every scalar value
    for k, v in record.items():
        if isinstance(v, list):
            continue
        cond = "(is %s {})" if k == "null" else "(= %s {})"
        res = ks_view.read(cond % k, args=[v]).all()
        assert len(res) == 1

    # Write nulls over the row
    for k in record:
        if k == "index":
            continue
        record[k] = None
    ks_view.write([record])
    res = list(ks_view.read().dict())[0]
    for k, v in record.items():
        assert res[k] == v


def test_function(session):
    input_record = {
        "index": 1,
        "floor": 1.1,
        "epoch": datetime(1970, 1, 1),
        "year": datetime(1970, 1, 1),
    }
    output_record = {
        "(floor floor)": 1,
        "(extract (epoch) epoch)": 0,
        "(extract (year) year)": 1970,
        "floor": 1.1,
        "(* floor 2)": 2.2,
    }
    ks_view = View("kitchensink")
    ks_view.write([input_record])

    keys, values = zip(*list(output_record.items()))
    res = View("kitchensink", list(keys)).read().all()
    assert res[0] == values


def test_env(session):
    view = View("team", {"name": "(max name)"})
    (res,) = view.read().all()
    assert res[0] == "Red"

    # first member of an s-expression is shielded from env
    view = View("team", {"max": "(max name)"})
    (res,) = view.read().all()
    assert res[0] == "Red"

    # alias usable in filters and order
    view = View("team", {"first_name": "name"})
    fltr = '(= first_name "Blue")'
    (res,) = view.read(fltr, order="first_name", limit=1).all()
    assert res[0] == "Blue"


def test_link(session):
    """Relation-graph BFS (reference tests/base_test.py:199-227 style)."""
    from tanker_spark import Table

    team = Table.get("team")
    country = Table.get("country")
    paths = team.link(country)
    assert paths
    assert [c.name for c in paths[0]] == ["country"]

    member = Table.get("member")
    paths = member.link(country)
    assert [c.name for c in paths[0]] == ["team", "country"]

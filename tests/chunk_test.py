"""Param-placeholder expansion: ``{}`` positional, ``{name!r}`` repr
conversion, ``{name:>5}`` format-spec (semantic port of
/root/reference/tests/chunk_test.py, which asserted the rendered SQL
text '%s in (%s, %s)' with params ['ham', "'spam'", '  foo'] — here the
formatted literals flow into the plan, so we assert the matching rows)."""

from tanker_spark import View


def test_expand(session):
    view = View("country", ["name"])
    view.write([("ham",), ("'spam'",), ("  foo",)])

    rows = view.read(
        "(in name {spam!r} {foo:>5})",
        args={"spam": "spam", "foo": "foo"},
    ).all()
    assert sorted(rows) == [("  foo",), ("'spam'",)]

    # positional args expand in order
    rows = view.read(
        "(in name {} {})", args=["ham", "nope"]
    ).all()
    assert rows == [("ham",)]

# coding: utf-8
"""Non-ASCII strings must round-trip through writes, dict filters and
s-expression literals alike (behavior pinned against the reference's
encoding suite — same View calls, same expected values — as a
table-driven parametrization)."""

import pytest

from tanker_spark import View

NON_ASCII = ["日本", "Corée"]


@pytest.mark.parametrize("value", NON_ASCII)
def test_utf8_roundtrip(session, value):
    view = View("country", ["name"])
    view.write([(value,)])
    for cursor in (
        view.read(filters={"name": value}),
        view.read('(= name "%s")' % value),
        view.read("(= name {})", args=[value]),
    ):
        assert cursor.one()[0] == value

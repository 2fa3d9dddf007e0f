# coding: utf-8
"""UTF-8 round-trips through write + filters (port of
/root/reference/tests/encoding_test.py)."""

from tanker_spark import View


def test_str(session):
    japan = "日本"
    view = View("country", ["name"])
    view.write([(japan,)])

    row = view.read(filters={"name": japan}).one()
    assert row[0] == japan

    fltr = '(= name "%s")' % japan
    row = view.read(fltr).one()
    assert row[0] == japan


def test_unicode(session):
    korea = "Corée"
    view = View("country", ["name"])
    view.write([(korea,)])

    row = view.read(filters={"name": korea}).one()
    assert row[0] == korea

    fltr = '(= name "%s")' % korea
    row = view.read(fltr).one()
    assert row[0] == korea

"""Column defaults populate on insert (port of
/root/reference/tests/default_test.py: member.created_at has
``default: current_timestamp``)."""

from tanker_spark import View

from .conftest import members


def test_timestamp(session):
    view = View(
        "member",
        ["name", "team.country.name", "team.name", "registration_code"],
    )
    view.write(members)

    rows = View("member", ["created_at"]).read().all()
    assert rows and all(r[0] is not None for r in rows)


def test_default_not_clobbered(session):
    """Upserting through a view that omits the defaulted column must keep
    the stored value (partial update), not re-default it."""
    view = View("member", ["name", "registration_code"])
    view.write([("Bob", "001")])
    (before,) = View("member", ["created_at"]).read(
        filters={"registration_code": "001"}
    ).one()
    view.write([("Bobby", "001")])
    after_rows = View("member", ["name", "created_at"]).read(
        filters={"registration_code": "001"}
    ).all()
    assert after_rows == [("Bobby", before)]

"""Property-based check: random write/delete/purge sequences against an
in-python model of natural-key upsert semantics (beyond the reference's
test strategy — SURVEY §5 notes it has no property tests)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tanker_spark import View, connect, create_tables

SCHEMA = """
- table: item
  columns:
    sku: varchar
    qty: integer
    note: varchar
  key: [sku]
"""

SKUS = ["a", "b", "c", "d"]

op_st = st.one_of(
    st.tuples(
        st.just("write"),
        st.lists(
            st.tuples(
                st.sampled_from(SKUS),
                st.integers(0, 9),
                st.sampled_from(["x", "y", None]),
            ),
            min_size=1, max_size=3, unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(st.just("delete"), st.sampled_from(SKUS)),
    st.tuples(
        st.just("purge"),
        st.lists(
            st.tuples(
                st.sampled_from(SKUS),
                st.integers(0, 9),
                st.sampled_from(["x", "y", None]),
            ),
            min_size=1, max_size=2, unique_by=lambda t: t[0],
        ),
    ),
)


@pytest.mark.slow
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(ops=st.lists(op_st, min_size=1, max_size=5))
def test_upsert_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("prop"))
    model = {}
    with connect({"root": root, "schema": SCHEMA, "spark": spark}):
        create_tables()
        view = View("item", ["sku", "qty", "note"])
        for op in ops:
            if op[0] == "write":
                rows = op[1]
                view.write(list(rows))
                for sku, qty, note in rows:
                    model[sku] = (sku, qty, note)
            elif op[0] == "delete":
                sku = op[1]
                view.delete(filters="(= sku {})", args=[sku])
                model.pop(sku, None)
            else:  # purge: rows absent from input are deleted
                rows = op[1]
                view.write(list(rows), purge=True)
                model = {}
                for sku, qty, note in rows:
                    model[sku] = (sku, qty, note)
        res = sorted(view.read().all())
        assert res == sorted(model.values())

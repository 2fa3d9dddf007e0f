"""Schema evolution: adding a declared column over existing parquet
(reference: add_columns ALTER path, context.py:571-710 — here the managed
read projects the declared schema, so missing columns surface as NULLs
and the next write materializes them)."""

from tanker_spark import View, connect, create_tables, get_spark


SCHEMA_V1 = """
- table: gadget
  columns:
    name: varchar
    price: float
  key: [name]
"""

SCHEMA_V2 = """
- table: gadget
  columns:
    name: varchar
    price: float
    color: varchar
  key: [name]
"""


def test_add_column(spark, tmp_path):
    root = str(tmp_path / "db")
    with connect({"root": root, "schema": SCHEMA_V1, "spark": spark}):
        create_tables()
        View("gadget", ["name", "price"]).write([("a", 1.0), ("b", 2.0)])

    # reconnect with the extended schema: old rows read with NULL color
    with connect({"root": root, "schema": SCHEMA_V2, "spark": spark}):
        create_tables()  # persists the new catalog
        res = View("gadget", ["name", "price", "color"]).read(
            order="name"
        ).all()
        assert res == [("a", 1.0, None), ("b", 2.0, None)]

        # writes touch the new column; untouched rows keep NULL
        View("gadget", ["name", "color"]).write([("a", "red")])
        res = View("gadget", ["name", "price", "color"]).read(
            order="name"
        ).all()
        assert res == [("a", 1.0, "red"), ("b", 2.0, None)]

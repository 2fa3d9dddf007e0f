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


def test_time_travel_read(spark, tmp_path):
    """Snapshot versioning: read an older retained version by number,
    current pointer unaffected; horizon configurable via keep_versions."""
    import pytest

    from tanker_spark import View, connect, create_tables, ctx

    schema = """
    - table: item
      columns:
        sku: varchar
        qty: integer
      key: [sku]
    """
    cfg = {"root": str(tmp_path / "tt"), "schema": schema,
           "spark": spark, "keep_versions": 3}
    with connect(cfg):
        create_tables()
        v = View("item", ["sku", "qty"])
        v.write([("a", 1)])                      # v1
        v.write([("a", 2), ("b", 5)])            # v2
        v.write([("b", 9)])                      # v3
        versions = ctx.versions("item")
        assert len(versions) == 3
        v1, v2, v3 = versions
        assert sorted(v.read(version=v1).all()) == [("a", 1)]
        assert sorted(v.read(version=v2).all()) == [("a", 2), ("b", 5)]
        # current == latest
        assert sorted(v.read().all()) == [("a", 2), ("b", 9)]
        # filters compose with time travel
        assert v.read("(= sku {})", args=["a"], version=v2).one() == ("a", 2)
        # a GC'd / unknown version raises with the available list
        with pytest.raises(KeyError, match="no snapshot"):
            v.read(version=999).all()


def test_snapshot_diff(spark, tmp_path):
    """ctx.diff: snapshot CDC between retained versions — inserts,
    updates (new values), deletes (final old values), unchanged keys
    absent; until=None diffs against the current snapshot."""
    import pytest

    from tanker_spark import View, connect, create_tables, ctx

    schema = """
    - table: item
      columns:
        sku: varchar
        qty: integer
      key: [sku]
    """
    cfg = {"root": str(tmp_path / "cdc"), "schema": schema,
           "spark": spark, "keep_versions": 5}
    with connect(cfg):
        create_tables()
        v = View("item", ["sku", "qty"])
        v.write([("a", 1), ("b", 5), ("c", 7)])        # v1
        v.write([("a", 2), ("d", 9)])                  # v2: update + insert
        View("item", ["sku"]).delete(data=[["b"]])     # v3: delete b
        v1, v2, v3 = ctx.versions("item")[-3:]

        d12 = {(r.change, r.sku): r.qty
               for r in ctx.diff("item", v1, v2).collect()}
        assert d12 == {("update", "a"): 2, ("insert", "d"): 9}

        d23 = {(r.change, r.sku): r.qty
               for r in ctx.diff("item", v2, v3).collect()}
        assert d23 == {("delete", "b"): 5}

        # against current (until=None) — the composed change set;
        # unchanged c never appears
        d13 = {(r.change, r.sku): r.qty
               for r in ctx.diff("item", v1).collect()}
        assert d13 == {("update", "a"): 2, ("insert", "d"): 9,
                       ("delete", "b"): 5}

        # identical snapshots diff to nothing
        assert ctx.diff("item", v3, v3).count() == 0

        # unknown version raises with the retained list
        with pytest.raises(KeyError, match="no snapshot"):
            ctx.diff("item", 999).count()

        # NULL-key rows (possible via the low-level snapshot write,
        # which bypasses View.write's key validation) classify by the
        # presence markers, not key-column nullness (r8 ADVICE fix:
        # the eqNullSafe join matches NULL==NULL, so a NULL-key row
        # used to always read as 'insert')
        base = ctx.read("item")
        nullrow = spark.createDataFrame(
            [tuple(None if c == "sku" else (42 if c == "qty" else 999)
                   for c in base.columns)], schema=base.schema)
        ctx.write("item", base.unionByName(nullrow))   # v4: + NULL key
        v4 = ctx.versions("item")[-1]
        d34 = {(r.change, r.sku): r.qty
               for r in ctx.diff("item", v3, v4).collect()}
        assert d34 == {("insert", None): 42}
        assert ctx.diff("item", v4, v4).count() == 0   # unchanged
        ctx.write("item", base)                        # v5: NULL key gone
        v5 = ctx.versions("item")[-1]
        d45 = {(r.change, r.sku): r.qty
               for r in ctx.diff("item", v4, v5).collect()}
        assert d45 == {("delete", None): 42}

"""Engine context: SparkSession management, schema registry, DDL.

The reference keeps per-uri connection pools and a thread-local context
stack (``/root/reference/tanker/context.py``); here a context binds a
SparkSession + a storage root + a table registry. Contexts still stack
(thread-local) so nested ``connect()`` blocks and threaded workloads behave
like the reference's (tests/concurrent_test.py semantics).
"""

from __future__ import annotations

import io
import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import storage
from .table import Column, Table
from .utils import CTX_STACK, ctx, logger, yaml_load

__all__ = [
    "connect", "create_tables", "get_spark", "introspect_parquet",
    "register", "ctx", "TankerContext",
]

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name="tanker_spark", master=None, extra_conf=None):
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE on (runtime join-strategy switches + skew handling), UTC session
    timezone for deterministic timestamps, shuffle partitions sized from
    the environment (a real cluster would size these per-job).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or "local[%s]" % _DEFAULT_CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _DEFAULT_CPUS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        # PySpark 4's DataFrame debugging wraps EVERY DataFrame/Column
        # API call with a conf.get + PySparkCurrentOrigin.set/clear
        # (three py4j round trips) plus a Python stack walk, purely to
        # decorate error messages with user call sites — ~600 round
        # trips per compiled query here, ~1.5× the whole plan-building
        # wall on driver-bound workloads (measured; guide §1.2 — serial
        # driver time is overhead at ANY cluster size). The switch is
        # the documented opt-out; errors keep class + message, losing
        # only the "called from <file:line>" enrichment.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _parse_schema(schema):
    """YAML string / file path / already-parsed list → list of dicts."""
    if schema is None:
        return None
    if isinstance(schema, str):
        if os.path.exists(schema):
            with io.open(schema) as fh:
                return yaml_load(fh)
        return yaml_load(schema)
    return schema


def _build_registry(defs):
    registry = {}
    for tdef in defs:
        tdef = dict(tdef)
        name = tdef.pop("table")
        cols = [
            Column(cname, cdef) if isinstance(cdef, str)
            else Column(cname, cdef["type"], default=cdef.get("default"))
            for cname, cdef in tdef.pop("columns").items()
        ]
        # column-level defaults may also come as a 'defaults' mapping
        for cname, dflt in (tdef.pop("defaults", None) or {}).items():
            for c in cols:
                if c.name == cname:
                    c.default = dflt
        registry[name] = Table(
            name,
            cols,
            key=tdef.pop("key", None),
            unique=tdef.pop("unique", None),
            values=tdef.pop("values", None),
            use_index=tdef.pop("use-index", tdef.pop("use_index", None)),
            surrogate_id=tdef.pop("surrogate_id", True),
            partition_by=tdef.pop("partition_by", None),
            zorder_by=tdef.pop("zorder_by", None),
        )
    return registry


CATALOG_FILE = "_catalog.yaml"


def _ctype_from_arrow(t):
    """pyarrow type → tanker column type string."""
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _ctype_from_arrow(t.value_type) + "[]"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "varchar"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytea"
    return "varchar"


def introspect_parquet(root):
    """Derive table definitions for a foreign parquet directory from the
    file footers alone — the Spark analog of the reference's live-DB
    introspection (``introspect_db``, context.py:388-569). A footer read
    is a metadata operation (no Spark job, no data scan), so registering
    a 100 TB directory costs milliseconds.

    Tables are registered external/read-only (``surrogate_id: false``);
    parquet carries no FK or unique metadata, so the key defaults to
    ``id`` when present, else the first column (only writes need a real
    key, and writes are rejected on external tables). Declare a schema
    to get relations and write access."""
    import pyarrow.parquet as pq

    defs = []
    if not os.path.isdir(root):
        return defs
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if entry.startswith((".", "_")):
            continue
        if entry.endswith(".parquet") and os.path.isfile(path):
            name, sample = entry[: -len(".parquet")], path
        elif os.path.isdir(path):
            if os.path.exists(os.path.join(path, storage.CURRENT)):
                continue  # managed table: the catalog sidecar covers it
            files = [fn for fn in sorted(os.listdir(path))
                     if fn.endswith(".parquet")]
            if not files:
                continue
            name, sample = entry, os.path.join(path, files[0])
        else:
            continue
        try:
            schema = pq.read_schema(sample)
        except Exception:
            logger.info("introspect: cannot read footer of %s", sample)
            continue
        cols = {f.name: _ctype_from_arrow(f.type) for f in schema}
        if not cols:
            continue
        key = ["id"] if "id" in cols else [next(iter(cols))]
        defs.append({
            "table": name, "columns": cols, "key": key,
            "surrogate_id": False,
        })
    return defs


class TankerContext:
    """One engine context: spark + root + registry + user cfg."""

    flavor = "spark"

    def __init__(self, cfg):
        cfg = dict(cfg or {})
        root = cfg.pop("root", None) or cfg.pop("db_uri", None)
        if root is None:
            raise ValueError("cfg must provide a 'root' storage directory")
        if root.startswith("spark://"):
            root = root[len("spark://"):]
        self.root = root
        self.spark = cfg.pop("spark", None) or get_spark()
        self.cfg = cfg
        self.aliases = {"null": None}
        self.aliases.update(cfg.get("aliases", {}))
        schema = _parse_schema(cfg.pop("schema", None))
        if schema is None:
            schema = self._load_catalog()
        if schema is None and cfg.get("introspect", True):
            # no schema, no sidecar: a foreign parquet directory —
            # register its tables from the footers (read-only)
            schema = introspect_parquet(self.root)
        self.registry = _build_registry(schema or [])
        self._df_cache = {}

    # -- catalog persistence / introspection ----------------------------
    def _catalog_path(self):
        return os.path.join(self.root, CATALOG_FILE)

    def _load_catalog(self):
        path = self._catalog_path()
        if os.path.exists(path):
            with io.open(path) as fh:
                return yaml_load(fh)
        return None

    def save_catalog(self):
        import yaml

        defs = []
        for table in self.registry.values():
            cols = {}
            for c in table.columns:
                if c.name == "id" and table.surrogate_id:
                    continue
                cols[c.name] = c.ctype + (" %s" % c.fk if c.fk else "")
            d = {"table": table.name, "columns": cols, "key": list(table.key)}
            if table.unique:
                d["unique"] = table.unique
            if not table.surrogate_id:
                d["surrogate_id"] = False
            if table.partition_by:
                d["partition_by"] = list(table.partition_by)
            if table.zorder_by:
                d["zorder_by"] = list(table.zorder_by)
            if table.use_index != "BTREE":
                d["use-index"] = table.use_index
            defs.append(d)
        os.makedirs(self.root, exist_ok=True)
        with io.open(self._catalog_path(), "w") as fh:
            yaml.safe_dump(defs, fh, sort_keys=False)

    # -- table IO -------------------------------------------------------
    def read(self, table_name, version=None):
        """Load a registered table as a DataFrame.

        Managed tables read with their declared schema (stable types, and
        empty partitioned dirs can't infer one); external tables infer.
        ``version`` time-travels to a retained snapshot (see
        :func:`storage.read_table`)."""
        table = self.registry[table_name]
        schema = table.spark_schema() if table.surrogate_id else None
        return storage.read_table(self.spark, self.root, table_name,
                                  schema=schema, version=version)

    def versions(self, table_name):
        """Snapshot versions still on disk for a managed table."""
        return storage.list_versions(self.root, table_name)

    def write(self, table_name, df):
        table = self.registry[table_name]
        return storage.write_table(
            df, self.root, table_name, partition_by=table.partition_by,
            keep=self.cfg.get("keep_versions"),
            zorder_by=table.zorder_by,
        )

    def optimize(self, table_name, zorder_by=None):
        """Rewrite the current snapshot clustered — the Delta
        ``OPTIMIZE [ZORDER BY]`` analog. Lands as a NEW version (the
        snapshot store never rewrites in place), so readers of the old
        pointer are unaffected and time travel still reaches the
        unclustered snapshot. ``zorder_by`` overrides the schema's
        declared clustering; with neither this is a plain compaction
        (one co-located file per hive partition / a fresh
        size-targeted file set)."""
        table = self.registry[table_name]
        cols = zorder_by or table.zorder_by
        df = self.read(table_name)
        return storage.write_table(
            df, self.root, table_name, partition_by=table.partition_by,
            keep=self.cfg.get("keep_versions"),
            zorder_by=cols or None,
        )

    def diff(self, table_name, since, until=None):
        """Snapshot CDC: one row per natural-key change between two
        retained versions of a managed table — the time-travel
        counterpart of Delta's CHANGE DATA FEED, derived from the
        snapshots themselves (nothing extra is written at commit
        time; any pair of retained versions can be diffed after the
        fact).

        Returns ``change`` ∈ ('insert', 'update', 'delete') followed
        by the table's columns — NEW values for inserts/updates, the
        final OLD values for deletes. ``until=None`` diffs ``since``
        against the current snapshot. Unknown versions raise KeyError
        with the retained list (storage.version_path).

        Shape at 100 TB: two snapshot scans full-outer-joined on the
        natural key — ONE shuffle, both sides column-complete because
        the output carries every column — with change classification
        a null-safe column comparison in whole-stage codegen;
        unchanged keys are dropped inside the join task. When the
        table is hive-partitioned, scoping both reads by a partition
        filter before diffing prunes identically on both sides."""
        table = self.registry[table_name]
        key = list(table.key)
        old = self.read(table_name, version=since)
        new = self.read(table_name, version=until)
        cols = list(new.columns)
        # literal presence markers, NOT key-column null checks: the
        # join is eqNullSafe and the schema's key columns are nullable
        # (table.py builds every StructField nullable), so a row whose
        # first key value is NULL would otherwise always classify as
        # 'insert' — even when unchanged, updated, or deleted
        o = old.select([F.col(c).alias("__o_%s" % c) for c in cols]
                       + [F.lit(True).alias("__o_present")])
        n = new.select([F.col(c).alias("__n_%s" % c) for c in cols]
                       + [F.lit(True).alias("__n_present")])
        cond = None
        for k in key:
            c = F.col("__o_%s" % k).eqNullSafe(F.col("__n_%s" % k))
            cond = c if cond is None else cond & c
        in_old = F.col("__o_present").isNotNull()
        in_new = F.col("__n_present").isNotNull()
        changed = F.lit(False)
        for c in cols:
            if c in key:
                continue
            changed = changed | ~F.col("__o_%s" % c).eqNullSafe(
                F.col("__n_%s" % c)
            )
        change = (
            F.when(~in_old, "insert")
            .when(~in_new, "delete")
            .when(changed, "update")
        )
        out = [
            F.when(
                F.col("change") == "delete", F.col("__o_%s" % c)
            ).otherwise(F.col("__n_%s" % c)).alias(c)
            for c in cols
        ]
        return (
            o.join(n, cond, "full_outer")
            .withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select("change", *out)
        )

    def sql(self, query):
        """Escape hatch to full Spark SQL: every registered table is
        exposed as a temp view (registered fresh per call, so views
        always see the CURRENT snapshot), and ``query`` runs through
        ``spark.sql`` — window functions, CTEs, lateral views,
        anything the engine's s-expr surface doesn't model. Returns
        the DataFrame."""
        for name in self.registry:
            try:
                self.read(name).createOrReplaceTempView(name)
            except KeyError:
                pass  # registered but no data yet
        return self.spark.sql(query)

    def reset_cache(self, table=None):
        self._df_cache.clear()

    # -- lifecycle ------------------------------------------------------
    def enter(self):
        return self

    def leave(self, exc=None):
        from .view import release_all_pins

        release_all_pins()

    def clone(self):
        """Copy of self for another thread (reference
        context.py:329-339, where the clone shares the connection but
        gets its own cursor). Here the SparkSession, registry and
        aliases are shared references — all thread-safe / read-only —
        and the clone gets its OWN DataFrame cache, the one piece of
        per-context mutable state."""
        import copy

        new_ctx = copy.copy(self)
        new_ctx._df_cache = {}
        return new_ctx


class TankerThread(threading.Thread):
    """Thread that inherits the creating thread's active context
    (reference context.py:140-151): the context stack is thread-local,
    so a plain ``Thread`` sees no context — ``TankerThread`` captures a
    :meth:`TankerContext.clone` of the innermost active context at
    construction time and installs it as the new thread's stack."""

    def __init__(self, *args, **kwargs):
        try:
            self.stack = [CTX_STACK.active_context().clone()]
        except RuntimeError:
            self.stack = []
        super().__init__(*args, **kwargs)

    def run(self):
        CTX_STACK.reset(self.stack)
        super().run()


@contextmanager
def _connect_cm(cfg):
    new_ctx = TankerContext(cfg)
    CTX_STACK.push(new_ctx)
    try:
        yield new_ctx
    except Exception as exc:
        CTX_STACK.pop(exc)
        raise
    else:
        CTX_STACK.pop()


def connect(cfg=None, action=None):
    """``with connect({'root': ..., 'schema': ...}):`` — push a context.

    Manual mode (reference utils_test.py:63-66): ``connect(cfg,
    'enter')`` pushes and returns the context without a with-block;
    ``connect(cfg, 'leave')`` pops it — for REPL / long-lived-process
    use where a lexical scope doesn't fit."""
    if action is None:
        return _connect_cm(cfg)
    if action == "enter":
        new_ctx = TankerContext(cfg)
        CTX_STACK.push(new_ctx)
        return new_ctx
    if action == "leave":
        CTX_STACK.pop()
        return None
    raise ValueError('connect action must be "enter" or "leave"')


class Pool:
    """Name-level parity with the reference's connection pool
    (reference context.py:155-260: per-cfg psycopg2/sqlite pools with a
    class-level ``disconnect``/``clear`` used in test teardown). The
    Spark engine has ONE shared session instead of per-cfg connection
    pools, so ``disconnect`` stops the active SparkSession (the analog
    of closing every pooled connection — only call it when the process
    is done with Spark) and ``clear`` is a no-op."""

    @classmethod
    def disconnect(cls):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()

    @classmethod
    def clear(cls):
        pass


def execute(query, args=None):
    """Raw-SQL escape hatch at name-level parity with the reference
    (``tanker.execute``, reference context.py:118-130, which runs SQL
    on the DB connection and returns a cursor). Here the query runs
    through :meth:`TankerContext.sql` (every registered table exposed
    as a temp view over its CURRENT snapshot) and the result comes
    back as an iterator of row tuples — the same shape reference
    callers consume. ``args`` fills ``%s`` placeholders positionally
    (values are SQL-escaped literals, reference-style paramstyle).

    Only the exact ``%s`` token is a placeholder — a bare ``%`` in the
    SQL (``LIKE '%x%'``) passes through untouched, no ``%%`` doubling
    needed (python ``%``-interpolation would raise on it). A literal
    ``%s`` inside a string constant cannot be expressed when ``args``
    is given; pass it as a parameter instead."""
    if args:
        def _lit(v):
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, (int, float)):
                return repr(v)
            # Spark SQL string literals treat backslash as an escape
            # (escapedStringLiterals=false, the default) — escape it
            # FIRST, then the quote, or a trailing backslash turns the
            # doubled quote into literal-quote + open string.
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return "'%s'" % s

        parts = query.split("%s")
        if len(parts) - 1 != len(args):
            raise ValueError(
                "execute: query has %d %%s placeholders but %d args"
                % (len(parts) - 1, len(args))
            )
        query = parts[0] + "".join(
            _lit(a) + p for a, p in zip(args, parts[1:])
        )
    df = CTX_STACK.active_context().sql(query)
    return iter([tuple(r) for r in df.collect()])


def register(schema):
    """Add table definitions to the active context's registry."""
    defs = _parse_schema(schema)
    active = CTX_STACK.active_context()
    active.registry.update(_build_registry(defs))


def create_tables():
    """Create missing managed tables: empty parquet + seed ``values``.

    The reference's DDL path (context.py:571-710): CREATE TABLE + ALTER for
    missing columns + indexes. Here: write an empty versioned parquet with
    the declared schema, persist the catalog sidecar, then upsert seed rows
    (FK-by-key seeds like ``country.name`` supported through View.write).
    """
    from .view import View

    active = CTX_STACK.active_context()
    spark = active.spark
    for table in active.registry.values():
        if not table.surrogate_id and storage.external_path(
            active.root, table.name
        ):
            continue  # external read-only table
        if not storage.exists(active.root, table.name):
            empty = spark.createDataFrame([], table.spark_schema())
            active.write(table.name, empty)
            logger.info("created table %s", table.name)
    active.save_catalog()
    # Seed values (after all tables exist so FK seeds resolve)
    for table in active.registry.values():
        if table.values and storage.exists(active.root, table.name):
            df = active.read(table.name)
            if df.limit(1).count() == 0:
                rows = table.values
                fields = sorted({k for r in rows for k in r})
                View(table.name, fields).write(rows)

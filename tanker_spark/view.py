"""View: the central query/write object (reference: tanker/view.py).

A View = a base table + ordered fields (plain columns, dotted FK paths,
s-expressions, ``{alias}`` config refs). ``read`` compiles to a declarative
DataFrame plan (joins → filter → group/agg → sort → limit) so Catalyst
owns the physical strategy; ``write`` is a natural-key upsert implemented
as a full-outer merge join over the stored parquet (the Spark analog of the
reference's tmp-table + ON CONFLICT pipeline at view.py:301-500).

Scale notes (SURVEY.md §7 phase 3):
- surrogate ids are ``xxhash64(key_cols)`` → deterministic, distributed,
  no sequence bottleneck; FK resolution becomes a stateless equi-join
  (broadcast-able) instead of the reference's LRU cache (view.py:642-692).
- merge writes produce a new snapshot version (storage.py) — maps onto a
  Delta/Iceberg MERGE commit on a real cluster.
"""

from __future__ import annotations

import json
from collections import defaultdict
from contextlib import contextmanager

from pyspark.sql import functions as F

from .expression import (
    AndGroup,
    EnvContext,
    ExpressionCompiler,
    JoinPlanner,
    OrGroup,
    ScalarSub,
    SemiJoin,
    Subquery,
    _compile_filter_item,
    as_col,
)
from .table import Table
from .utils import ctx, logger, pandas

all_none = lambda xs: all(x is None for x in xs)

# Row-id pair frames (deep-correlated subquery lowerings) are eagerly
# persisted so their monotonically_increasing_id tags stay frozen across
# the self-join. They are registered here for release: the owning Cursor
# unpersists them after materialization, and context leave() drains any
# leftovers (frames the user took via .frame() and collected themselves)
# so long-lived sessions don't accumulate cached frames (ADVICE r3).
_PIN_LOG = []   # pins from the compile in progress (claimed by Cursor)
_ALL_PINS = []  # every live pin, drained on context leave


def _pin(df):
    df.persist()
    df.count()
    _PIN_LOG.append(df)
    _ALL_PINS.append(df)
    return df


def release_all_pins():
    """Unpersist every live row-id pair frame (called on context leave)."""
    del _PIN_LOG[:]
    while _ALL_PINS:
        try:
            _ALL_PINS.pop().unpersist(False)
        except Exception:  # session already stopped — nothing to free
            pass


@contextmanager
def _claim_pins():
    """Release the pins created inside the block when it exits.

    The write/delete paths pin pair frames (subquery write filters)
    but have no Cursor to claim them — without this, every filtered
    write in a long-lived session would leave a persisted frame in
    executor storage until context leave. Safe because those paths
    fully materialize their output (the parquet commit) before
    returning."""
    mark = len(_PIN_LOG)
    try:
        yield
    finally:
        claimed = _PIN_LOG[mark:]
        del _PIN_LOG[mark:]
        for p in claimed:
            try:
                p.unpersist(False)
            except Exception:
                pass
            try:
                _ALL_PINS.remove(p)
            except ValueError:
                pass


def _claims_pins(fn):
    """Method decorator form of :func:`_claim_pins`."""
    def wrapper(*a, **kw):
        with _claim_pins():
            return fn(*a, **kw)
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


def _and_maybe(*conds):
    """AND together the non-None conditions; None if all are None."""
    out = None
    for c in conds:
        if c is not None:
            out = c if out is None else (out & c)
    return out


def _bt(name):
    """Escape a column name (may contain dots) for F.col."""
    return "`%s`" % name.replace("`", "``")


class _ArrowFallback(Exception):
    """Internal: schema not eligible for the Arrow collect fast path."""


def _has_instant_ts(dt):
    from pyspark.sql import types as T

    if isinstance(dt, T.TimestampType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_instant_ts(dt.elementType)
    return False


def _os_tz_is_utc():
    """True when the OS timezone is UTC-equivalent. ``collect()``
    renders instant timestamps through ``datetime.fromtimestamp`` (the
    OS zone, NOT the session timezone) — the Arrow fast path only
    matches that on a UTC machine, so any other zone must fall back."""
    import time

    return time.timezone == 0 and time.daylight == 0


def _has_struct_or_map(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.StructType, T.MapType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_struct_or_map(dt.elementType)
    return False


def _naive_arrow_type(at):
    """Arrow type with tz-aware timestamps replaced by naive ones (at
    any list-nesting depth) — matches ``collect()``'s naive-datetime
    output under the pinned UTC session timezone. Returns the SAME
    object when nothing changes (identity-checked by the caller)."""
    import pyarrow as pa

    if pa.types.is_timestamp(at) and at.tz is not None:
        return pa.timestamp(at.unit)
    if pa.types.is_list(at):
        inner = _naive_arrow_type(at.value_type)
        if inner is not at.value_type:
            return pa.list_(inner)
    return at


# Stable substrings of the plan-embedded ``raise_error`` guards; used to
# convert Spark runtime exceptions back into the ValueError the reference
# raises (tanker surfaces DB constraint errors as python exceptions).
FK_UNKNOWN_NEEDLE = "are not known in table"
FK_BADID_NEEDLE = "Unknown id"
UNIQUE_NEEDLE = "Unique constraint violation"
NULLKEY_NEEDLE = "Null value in key column"
DUPKEY_NEEDLE = "Duplicate natural keys in input"
GUARD_NEEDLES = (FK_UNKNOWN_NEEDLE, FK_BADID_NEEDLE, UNIQUE_NEEDLE,
                 NULLKEY_NEEDLE, DUPKEY_NEEDLE)

# Staging-frame column carrying the first fk-resolution violation message
# (NULL when the row is valid). Violations are *recorded* as plain data so
# write-filter predicates can still push below the staging joins —
# ``raise_error`` blocks predicate pushdown, so the actual raising guard
# is only attached after the filter legs (View._attach_guards).
VIOL = "__viol"


def _reraise_guards(e, extra_needles=()):
    """Re-raise a plan-embedded guard failure as ValueError; otherwise
    re-raise ``e`` unchanged."""
    m = str(e)
    for needle in tuple(GUARD_NEEDLES) + tuple(extra_needles):
        if needle in m:
            raise ValueError(needle) from None
    raise e


def _pa_type(st):
    """Spark type → pyarrow type, for the typed driver-staging path."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(st, T.ArrayType):
        return pa.list_(_pa_type(st.elementType))
    return {
        T.StringType(): pa.string(),
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.FloatType(): pa.float32(),
        T.BooleanType(): pa.bool_(),
        T.DateType(): pa.date32(),
        T.TimestampNTZType(): pa.timestamp("us"),
        T.TimestampType(): pa.timestamp("us", tz="UTC"),
        T.BinaryType(): pa.binary(),
    }[st]


def _pa_norm(values, st, session_tz="UTC"):
    """Normalize python values for pyarrow: pa.array IGNORES tzinfo on
    aware datetimes (stores wall time), so tz-aware values must be
    shifted to UTC wall time first. NAIVE values are interpreted in the
    Spark session timezone (matching what the pandas/row fallback paths
    store — ADVICE round 1: the two staging paths only agreed because
    get_spark pins UTC). Recurses into array types."""
    from datetime import timezone as _tz

    from pyspark.sql import types as T

    if isinstance(st, T.TimestampType):
        if session_tz in ("UTC", "Etc/UTC", "GMT"):
            # UTC session: a naive value's wall time IS its UTC wall
            # time, which is exactly how pa.array stores it — no
            # datetime reconstruction needed (2× faster staging of
            # timestamp columns at 100k rows)
            return [
                v if v is None or getattr(v, "tzinfo", None) is None
                else v.astimezone(_tz.utc)
                for v in values
            ]
        from zoneinfo import ZoneInfo

        local = ZoneInfo(session_tz)  # raises → pandas fallback
        out = []
        for v in values:
            if v is None or getattr(v, "tzinfo", None) is not None:
                out.append(
                    None if v is None else v.astimezone(_tz.utc)
                )
            else:
                out.append(
                    v.replace(tzinfo=local).astimezone(_tz.utc)
                )
        return out
    if isinstance(st, T.ArrayType):
        inner = st.elementType
        if isinstance(inner, (T.TimestampType, T.ArrayType)):
            return [
                None if v is None
                else _pa_norm(v, inner, session_tz) for v in values
            ]
    return values


class ViewField:
    """One field of a view (reference: view.py:15-55)."""

    def __init__(self, name, desc, table):
        self.name = name
        self.desc = desc
        self.ref = None
        self.col = None

        if desc.startswith("("):
            ftype = ctype = "EXPRESSION"
        elif desc.startswith("{"):
            ftype = ctype = "ALIAS"
        elif desc in table:
            self.col = table.get_column(desc)
            ctype = self.col.ctype
            if ctype == "M2O":
                ctype = ftype = "BIGINT"
            else:
                ftype = ctype
        elif "." in desc:
            ftype = "BIGINT"
            planner = JoinPlanner(table)
            self.ref = planner.get_ref(desc)
            remote_col = self.ref.remote_table.get_column(
                self.ref.remote_field
            )
            ctype = remote_col.ctype
            self.col = table.get_column(desc.split(".")[0])
        else:
            raise ValueError('Unable to parse column "%s"' % name)
        self.ctype = ctype.upper()
        self.ftype = ftype.upper()

    def __repr__(self):
        if self.name != self.desc:
            return "<ViewField %s (%s)>" % (self.desc, self.name)
        return "<ViewField %s>" % self.desc


class Cursor:
    """Lazy result handle (reference: TankerCursor, context.py:713-808).

    Compilation + execution happen on first materialization, so
    ``view.read(fltr).args(x=1)`` works like the reference.
    """

    def __init__(self, view, spec, args=None):
        self.view = view
        self.spec = spec
        self._args = []
        self._kwargs = {}
        if isinstance(args, dict):
            self._kwargs = dict(args)
        elif args is not None:
            self._args = list(args)
        self._frame = None
        self._pins = []

    def pipe(self, fn, *args, **kwargs):
        """Feed the compiled frame through an operator: the uniform
        bridge from the View surface to the operator library —
        ``View("documents").read(fltr).pipe(dedup.dedup_exact, "text")``
        keeps filters/ACL/joins on the View side and the LLM-pipeline
        verbs composable on the DataFrame side."""
        return fn(self.frame(), *args, **kwargs)

    def args(self, *args, **kwargs):
        self._args.extend(args)
        self._kwargs.update(kwargs)
        self.release()
        return self

    # -- materialization -------------------------------------------------
    def frame(self):
        """The compiled Spark DataFrame (lazy, cached)."""
        if self._frame is None:
            mark = len(_PIN_LOG)
            env_ctx = EnvContext(self._args, self._kwargs)
            self._frame = self.view._compile_read(self.spec, env_ctx)
            # claim the pair frames this compile pinned (see _pin)
            self._pins = _PIN_LOG[mark:]
            del _PIN_LOG[mark:]
        return self._frame

    def release(self):
        """Unpersist pair frames pinned by this cursor's compile. Called
        automatically after each materialization when pins exist; the
        next use recompiles fresh (cheap, driver-side)."""
        for p in self._pins:
            try:
                p.unpersist(False)
            except Exception:  # session already stopped
                pass
            if p in _ALL_PINS:
                _ALL_PINS.remove(p)
        self._pins = []
        self._frame = None

    def _done(self):
        # only cursors that pinned pair frames pay the recompile; the
        # common path keeps its cached frame
        if self._pins:
            self.release()

    def explain(self, mode="formatted"):
        return self.frame().explain(mode)

    def _converters(self):
        convs = []
        for f in self.view.fields:
            if f.col is not None and f.ref is None and f.ctype == "JSONB":
                convs.append(lambda v: json.loads(v) if isinstance(v, str) else v)
            else:
                convs.append(None)
        return convs

    def _collect_tuples(self):
        """Materialize the frame as python tuples — via ONE Arrow batch
        transfer when the schema allows (~2× faster than row-based
        ``collect()`` at 100k rows: columnar wire format + C-level
        ``to_pylist``), with exact ``collect()`` value semantics:

        - tz-aware Arrow timestamps are cast to naive (UTC session AND
          UTC OS zone only — get_spark pins the session to UTC, but
          ``collect()`` renders through the OS zone, so a non-UTC
          machine or a rebound session timezone falls back);
        - struct/map columns fall back (``collect`` yields Row objects,
          Arrow would yield dicts).
        """
        frame = self.frame()
        try:
            import pyarrow as pa
            from pyspark.sql import types as T

            tz = ctx.spark.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "Etc/UTC", "GMT") or not _os_tz_is_utc():
                # only applies to instant timestamps; cheap to just
                # check once and bail to collect() (collect renders
                # them in the OS zone — see _os_tz_is_utc)
                if any(_has_instant_ts(f.dataType)
                       for f in frame.schema.fields):
                    raise _ArrowFallback
            if any(_has_struct_or_map(f.dataType)
                   for f in frame.schema.fields):
                raise _ArrowFallback
            tbl = frame.toArrow()
            cols = []
            for c in tbl.columns:
                naive = _naive_arrow_type(c.type)
                if naive is not c.type:
                    c = c.cast(naive)
                cols.append(c.to_pylist())
            self._done()
            return list(zip(*cols)) if tbl.num_rows else []
        except Exception:
            rows = frame.collect()
            self._done()
            return [tuple(r) for r in rows]

    def _rows(self):
        rows = self._collect_tuples()
        convs = self._converters()
        if any(c is not None for c in convs):
            out = []
            for row in rows:
                vals = tuple(
                    c(v) if c else v for c, v in zip(convs, row)
                )
                out.append(vals)
            return out
        return rows

    def __iter__(self):
        return iter(self._rows())

    def all(self):
        return self._rows()

    def one(self):
        rows = self.frame().limit(1).collect()
        self._done()
        if not rows:
            return None
        convs = self._converters()
        row = rows[0]
        return tuple(c(v) if c else v for c, v in zip(convs, row))

    def next(self):
        return self.one()

    def chain(self):
        for row in self._rows():
            for item in row:
                yield item

    def dict(self):
        names = [f.name for f in self.view.fields]
        for row in self._rows():
            yield dict(zip(names, row))

    def df(self):
        if pandas is None:  # pragma: no cover
            raise RuntimeError("pandas is not available")
        out = self.frame().toPandas()
        self._done()
        return out

    def arrow(self):
        """Materialize as a ``pyarrow.Table`` — the zero-copy handoff
        into Arrow-native tooling (duckdb, polars, dataset writers); no
        reference counterpart (tanker predates Arrow ubiquity), but the
        natural sink for a columnar engine."""
        out = self.frame().toArrow()
        self._done()
        return out


class View(object):
    def __init__(self, table, fields=None):
        self.ctx = ctx
        self.table = Table.get(table)
        if not fields:
            fields = list(self.table.default_fields())
        if isinstance(fields, str):
            fields = [(fields, fields)]
        elif isinstance(fields, dict):
            fields = list(fields.items())
        elif isinstance(fields, (list, tuple)) and fields and isinstance(
            fields[0], str
        ):
            fields = [(f, f) for f in fields]
        self.fields = [
            ViewField(name.strip(), desc, self.table)
            for name, desc in fields
        ]
        self.field_dict = {f.name: f for f in self.fields}
        self.upd_filter_cnt = 0
        self.ins_filter_cnt = 0

        # field_map: base Column → [ViewField], field_idx: positions
        self.field_map = defaultdict(list)
        self.field_idx = defaultdict(list)
        for idx, vf in enumerate(self.fields):
            if vf.col is None:
                continue
            if self.field_map[vf.col] and vf.col.ctype not in ("M2O", "O2M"):
                raise ValueError(
                    "Column %s is specified several time in view"
                    % vf.col.name
                )
            self.field_map[vf.col].append(vf)
            self.field_idx[vf.col].append(idx)

        self.key_fields = [
            f for f in self.fields
            if f.col and f.col.name in self.table.key
        ]
        if self.table.surrogate_id:
            id_col = self.table.get_column("id")
            self.key_cols = (
                ["id"] if id_col in self.field_map else list(self.table.key)
            )
        else:
            self.key_cols = list(self.table.key)

    def get_field(self, name):
        return self.field_dict.get(name)

    def base_env(self):
        env = {}
        for field in self.fields:
            if field.name in self.table._column_dict:
                continue  # don't mask real columns
            env[field.name] = field.desc
        return env

    # ------------------------------------------------------------------
    # READ
    # ------------------------------------------------------------------
    def read(
        self,
        filters=None,
        args=None,
        order=None,
        groupby=None,
        limit=None,
        distinct=False,
        offset=None,
        disable_acl=False,
        version=None,
        rollup=False,
        cube=False,
        qualify=None,
        having=None,
        grouping_sets=None,
    ):
        spec = {
            "filters": filters,
            "order": order,
            "groupby": groupby,
            "limit": limit,
            "distinct": distinct,
            "offset": offset,
            "disable_acl": disable_acl,
            "version": version,
            "rollup": rollup,
            "cube": cube,
            "qualify": qualify,
            "having": having,
            "grouping_sets": grouping_sets,
        }
        return Cursor(self, spec, args=args)

    def _compile_read(self, spec, env_ctx):
        table = self.table
        compiler = ExpressionCompiler(table, env=self.base_env())

        # 1. compile select fields (registers joins on the planner).
        # A field may BE a scalar subquery — ``(from orders (select
        # (count)) (where (= o_custkey _parent.c_custkey)))`` — or a
        # comparison against one; those compile to markers, carried in
        # ``field_scalar_pend`` and attached as per-row value columns
        # on the final frame (View._scalar_attach, same three
        # lowerings as filter-position scalars).
        field_cols, field_is_agg = [], []
        field_scalar_pend = {}
        for f in self.fields:
            if f.desc.startswith("("):
                node = compiler.parse(f.desc)
                field_is_agg.append(node.is_aggregate())
                col = compiler.compile(node, env_ctx)
                if isinstance(col, (Subquery, ScalarSub)):
                    field_scalar_pend[len(field_cols)] = col
                    col = F.lit(None)  # placeholder, replaced on attach
                field_cols.append(col)
            elif f.desc.startswith("{"):
                from .expression import Param

                field_is_agg.append(False)
                field_cols.append(
                    as_col(Param(f.desc[1:-1]).resolve(env_ctx))
                )
            else:
                field_is_agg.append(False)
                field_cols.append(compiler.planner.get_ref(f.desc).col())

        # 2. filters (+ per-table ACL read filter, reference view.py:144-146)
        acl_filters = None
        if not spec.get("disable_acl"):
            acl_filters = ctx.cfg.get("acl-read", {}).get(table.name)
        cond, _ = compiler.build_filter(
            spec.get("filters"), env_ctx, acl_filters
        )

        # 3. group by
        groupby = spec.get("groupby")
        if isinstance(groupby, str):
            groupby = [groupby]
        aggregated = any(field_is_agg)
        auto_group = aggregated and not groupby
        group_descs = []
        if auto_group:
            # scalar-subquery fields are attached AFTER aggregation
            # (they are per-group values, not grouping keys)
            group_descs = [
                f.desc
                for i, (f, agg) in enumerate(
                    zip(self.fields, field_is_agg))
                if not agg and i not in field_scalar_pend
            ]
        elif groupby:
            group_descs = list(groupby)
            aggregated = True
        group_cols = [
            compiler.compile(compiler.parse(d), env_ctx)
            if d.startswith("(")
            else compiler.compile_ref(d, env_ctx)
            for d in group_descs
        ]

        # 4. order spec (compiled later, against the right frame)
        order = spec.get("order")
        if order is not None and isinstance(order, (str, tuple)):
            order = [order]

        # 5. build the frame: base + joins. ``version`` time-travels
        # the view's MAIN table to a retained snapshot; joined
        # dimensions stay current (Delta's per-table VERSION AS OF
        # semantics — pin each table independently if needed)
        # 4b. QUALIFY: filter on a window expression (SQL forbids
        # windows in WHERE; DuckDB/Snowflake spell this QUALIFY). The
        # predicate is computed as a hidden column — Spark evaluates
        # the window in a Project — then filtered and dropped, so
        # top-per-group is one window exchange + filter. Compiled
        # BEFORE the frame build so a dotted path in the window spec
        # registers its join on the planner in time.
        qual = spec.get("qualify")
        qual_parts = []
        if qual is not None:
            res = _compile_filter_item(
                compiler, compiler.parse(qual), env_ctx
            )
            if isinstance(res, AndGroup):
                qual_parts = (
                    ([] if res.cond is None else [res.cond])
                    + list(res.scalars) + list(res.semis)
                    + list(res.ors)
                )
            else:
                qual_parts = [res]

        def apply_qual(frame):
            # plain conjuncts may contain window expressions (SQL
            # forbids windows in WHERE/filter — computed as a hidden
            # column, then filtered); subquery conjuncts reuse the
            # WHERE lowerings — QUALIFY runs pre-aggregation, so every
            # base column is still in scope for correlation
            for part in qual_parts:
                if isinstance(part, ScalarSub):
                    frame = self._apply_scalarsub(frame, part, reader)
                elif isinstance(part, OrGroup):
                    frame = self._apply_orgroup(frame, part, reader)
                elif isinstance(part, SemiJoin):
                    frame = self._apply_semijoin(frame, part, reader)
                else:
                    frame = (
                        frame.withColumn("__qual", as_col(part))
                        .filter(F.col("__qual"))
                        .drop("__qual")
                    )
            return frame

        # 4c. HAVING: predicate over aggregate expressions, evaluated
        # AFTER grouping (SQL HAVING). Each aggregate-valued predicate
        # is computed as a hidden boolean column INSIDE .agg() — it
        # rides the same partial-aggregation shuffle, so HAVING costs
        # zero extra passes — then filtered and dropped. Scalar
        # subqueries (TPC-H Q11's `having sum(..) > (select ...)`)
        # are hoisted: the aggregate side lands as a hidden agg column
        # and the comparison reuses the uncorrelated broadcast
        # cross-join lowering post-agg. Compiled before the frame
        # build so dotted paths register their joins in time.
        having = spec.get("having")
        hav_conds, hav_scalars, hav_semis = [], [], []
        if having is not None:
            if not aggregated:
                raise ValueError("having requires an aggregated read")
            items = [having] if isinstance(having, str) else list(having)
            for line in items:
                res = _compile_filter_item(
                    compiler, compiler.parse(line), env_ctx
                )
                for part in ([res] if not isinstance(res, AndGroup)
                             else ([] if res.cond is None else [res.cond])
                             + list(res.scalars)
                             + list(res.semis) + list(res.ors)):
                    if isinstance(part, ScalarSub):
                        hav_scalars.append(part)
                    elif isinstance(part, (SemiJoin, OrGroup)):
                        # EXISTS / IN / OR-of-subqueries in HAVING:
                        # lowered on the POST-aggregate frame (SQL
                        # semantics — the subquery may correlate on the
                        # group keys, which are re-exposed under their
                        # source names by ``outer_frame`` below)
                        hav_semis.append(part)
                    else:
                        hav_conds.append(as_col(part))

        active = ctx
        base_df = active.read(table.name, version=spec.get("version"))
        reader = lambda name: active.read(name)
        df = apply_qual(self._build_frame(compiler, base_df, reader, cond))

        # 6. aggregate / project
        hidden = []
        if aggregated:
            g_aliases = ["__g%d" % i for i in range(len(group_cols))]
            gb = [c.alias(a) for c, a in zip(group_cols, g_aliases)]
            # map group desc (env-expanded) → alias
            gmap = {}
            for d, a in zip(group_descs, g_aliases):
                gmap[d] = a
                expanded = compiler.expand_env(d)
                if expanded:
                    gmap[expanded] = a
            aggs, out_names = [], []
            for i, (f, c, is_agg) in enumerate(
                    zip(self.fields, field_cols, field_is_agg)):
                if i in field_scalar_pend:
                    out_names.append(None)  # attached post-agg below
                elif is_agg:
                    aggs.append(c.alias(f.name))
                    out_names.append(f.name)
                else:
                    alias = gmap.get(f.desc)
                    if alias is None:
                        raise ValueError(
                            'Field "%s" is neither aggregated nor in '
                            "groupby" % f.desc
                        )
                    out_names.append(alias)
            # order exprs on aggregated frames: group col, field, or agg
            order_cols = []
            if order:
                for i, item in enumerate(order):
                    d, how = (item if isinstance(item, (list, tuple))
                              else (item, None))
                    self._check_dir(how)
                    if d in gmap:
                        oc = F.col(gmap[d])
                    elif d in self.field_dict:
                        fidx = [f.name for f in self.fields].index(d)
                        if fidx in field_scalar_pend:
                            # scalar field: orderable only after the
                            # post-agg attach — resolved below
                            order_cols.append(("__scalar", fidx, how))
                            continue
                        if field_is_agg[fidx]:
                            oc = F.col(_bt(d))
                        else:
                            oc = F.col(gmap[self.field_dict[d].desc])
                    else:
                        node = compiler.parse(d) if d.startswith("(") else None
                        if node is not None and node.is_aggregate():
                            hname = "__ord%d" % i
                            aggs.append(
                                compiler.compile(node, env_ctx).alias(hname)
                            )
                            hidden.append(hname)
                            oc = F.col(hname)
                        else:
                            raise ValueError(
                                'Cannot order by "%s" on an aggregated '
                                "read" % d
                            )
                    order_cols.append(oc.desc() if how and how.upper() ==
                                      "DESC" else oc.asc())
            if not aggs:
                raise ValueError("Aggregated read needs aggregate fields")
            hav_names, hav_sc_pairs = [], []
            for i, c in enumerate(hav_conds):
                hn = "__hav%d" % i
                aggs.append(c.alias(hn))
                hav_names.append(hn)
            for i, s in enumerate(hav_scalars):
                if isinstance(s.other, Subquery):
                    # both operands are subqueries: nothing references
                    # the group — lowered wholesale post-agg
                    hav_sc_pairs.append((None, s))
                    continue
                hn = "__havs%d" % i
                aggs.append(as_col(s.other).alias(hn))
                hav_sc_pairs.append((hn, s))
            gsets = spec.get("grouping_sets")
            if spec.get("rollup") or spec.get("cube") or gsets:
                # super-aggregate rows (GROUP BY ROLLUP/CUBE/GROUPING
                # SETS): requires an explicit groupby — auto-groupby
                # has no sensible hierarchy to roll up
                if not spec.get("groupby"):
                    raise ValueError(
                        "rollup/cube/grouping_sets need an explicit "
                        "groupby"
                    )
                if gsets:
                    # both the sets and the grouping columns must be
                    # the RAW compiled expressions — an aliased twin
                    # fails Spark's semantic-equality match and nulls
                    # every output column. The grouping columns are
                    # renamed to the ``__gN`` aliases positionally
                    # afterwards (grouping cols lead the agg output).
                    desc2col = dict(zip(group_descs, group_cols))
                    sets = []
                    for s in gsets:
                        s = [s] if isinstance(s, str) else list(s)
                        missing = [d for d in s if d not in desc2col]
                        if missing:
                            raise ValueError(
                                "grouping_sets entries %s are not in "
                                "groupby" % missing
                            )
                        sets.append([desc2col[d] for d in s])
                    df = df.groupingSets(sets, *group_cols).agg(*aggs)
                    df = df.toDF(*g_aliases, *df.columns[len(gb):])
                else:
                    grouped = (
                        df.rollup(*gb) if spec.get("rollup")
                        else df.cube(*gb)
                    )
                    df = grouped.agg(*aggs)
            else:
                df = df.groupBy(*gb).agg(*aggs) if gb else df.agg(*aggs)
            for hn in hav_names:
                df = df.filter(F.col(hn))
            # Correlated HAVING subqueries and scalar fields reference
            # the outer query via ``F.col("<base_alias>.<col>")``; the
            # post-agg frame lost both the alias and the source column
            # names. Re-expose each plain-column group key under its
            # source name and re-alias the frame — correlation then
            # resolves against group keys exactly (SQL: HAVING may only
            # reference group keys and aggregates). The helper columns
            # are pruned by the final projection.
            def _corr(sub):
                return (sub.compiler._ext_depth
                        or (sub.where_entries
                            and any(e.depth for e in sub.where_entries)))

            needs_outer = hav_semis or field_scalar_pend or any(
                _corr(s.sub)
                or (isinstance(s.other, Subquery) and _corr(s.other))
                for _, s in hav_sc_pairs
            )
            hav_stash = {}
            if needs_outer:
                for d, a in zip(group_descs, g_aliases):
                    name = compiler.expand_env(d) or d
                    if "." not in name and name in table:
                        if name in df.columns:
                            # an aggregate output aliased to the same
                            # name as a group-key source column: stash
                            # it so the correlation helper (which per
                            # SQL resolves to the GROUP KEY) does not
                            # clobber it; the final projection maps it
                            # back
                            tmp = "__hv_keep_%d" % len(hav_stash)
                            df = df.withColumnRenamed(name, tmp)
                            hav_stash[name] = tmp
                        df = df.withColumn(name, F.col(a))
                df = df.alias(compiler.planner.base_alias)
            for hn, s in hav_sc_pairs:
                inner = (s if hn is None else
                         ScalarSub(s.op, F.col(hn), s.sub, s.sub_on_left))
                df = self._apply_scalarsub(df, inner, reader)
            for part in hav_semis:
                if isinstance(part, OrGroup):
                    df = self._apply_orgroup(df, part, reader)
                else:
                    df = self._apply_semijoin(df, part, reader)
            scalar_cols = {}
            for i, marker in field_scalar_pend.items():
                df, c = self._field_scalar(df, marker, reader)
                scalar_cols[i] = c
            if order_cols:
                resolved = []
                for oc in order_cols:
                    if isinstance(oc, tuple) and oc[0] == "__scalar":
                        _, fidx, how = oc
                        c = scalar_cols[fidx]
                        oc = (c.desc() if how and how.upper() == "DESC"
                              else c.asc())
                    resolved.append(oc)
                df = df.orderBy(*resolved)
            # final projection, renaming group aliases to field names
            final = []
            for i, (f, n) in enumerate(zip(self.fields, out_names)):
                if i in scalar_cols:
                    final.append(scalar_cols[i].alias(f.name))
                else:
                    final.append(
                        F.col(_bt(hav_stash.get(n, n))).alias(f.name)
                    )
            df = df.select(*final)
        else:
            select_cols = [
                c.alias(f.name) for c, f in zip(field_cols, self.fields)
            ]

            def attach_scalars(frame):
                # scalar-subquery fields: attach per-row value columns
                # on the frame actually selected from; the select
                # projection prunes the helper columns
                for i, marker in field_scalar_pend.items():
                    frame, c = self._field_scalar(frame, marker, reader)
                    select_cols[i] = c.alias(self.fields[i].name)
                return frame

            if spec.get("distinct"):
                df = attach_scalars(df)
                df = df.select(*select_cols).distinct()
                if order:
                    df = df.orderBy(*self._output_order(order))
            else:
                order_cols = []
                if order:
                    for i, item in enumerate(order):
                        d, how = (item if isinstance(item, (list, tuple))
                                  else (item, None))
                        self._check_dir(how)
                        oc = self._compile_order_expr(
                            compiler, d, env_ctx
                        )
                        hname = "__ord%d" % i
                        select_cols.append(oc.alias(hname))
                        hidden.append(hname)
                        order_cols.append(
                            F.col(hname).desc() if how and how.upper() ==
                            "DESC" else F.col(hname).asc()
                        )
                # a second planner pass may have added joins (order on a
                # not-yet-joined dotted path): re-apply any new joins
                # (and re-apply QUALIFY — it was filtered on the frame
                # this rebuild replaces)
                df = apply_qual(
                    self._build_frame(compiler, base_df, reader, cond)
                )
                df = attach_scalars(df)
                df = df.select(*select_cols)
                if order_cols:
                    df = df.orderBy(*order_cols)
                if hidden:
                    df = df.select(
                        *[F.col(_bt(f.name)) for f in self.fields]
                    )

        # 7. limit / offset
        offset = spec.get("offset")
        limit = spec.get("limit")
        if offset is not None:
            df = df.offset(int(offset))
        if limit is not None:
            df = df.limit(int(limit))
        return df

    @staticmethod
    def _check_dir(how):
        if how and how.upper() not in ("ASC", "DESC"):
            raise ValueError(
                'Unexpected value "%s" for sort direction' % how
            )

    def _output_order(self, order):
        cols = []
        for item in order:
            d, how = (item if isinstance(item, (list, tuple))
                      else (item, None))
            self._check_dir(how)
            name = d if d in self.field_dict else None
            if name is None:
                for f in self.fields:
                    if f.desc == d:
                        name = f.name
                        break
            if name is None:
                raise ValueError(
                    'Distinct read can only be ordered by its own '
                    'fields ("%s")' % d
                )
            c = F.col(_bt(name))
            cols.append(c.desc() if how and how.upper() == "DESC" else
                        c.asc())
        return cols

    def _compile_order_expr(self, compiler, desc, env_ctx):
        if desc.startswith("("):
            return compiler.compile(compiler.parse(desc), env_ctx)
        return compiler.compile_ref(desc, env_ctx)

    def _build_frame(self, compiler, base_df, reader, cond):
        """base + inferred joins + subquery semis/ors/scalars + filter."""
        df = compiler.planner.apply(base_df, reader)
        for semi in compiler.pending_semijoins:
            df = self._apply_semijoin(df, semi, reader)
        for og in compiler.pending_orgroups:
            df = self._apply_orgroup(df, og, reader)
        for sc in compiler.pending_scalarsubs:
            df = self._apply_scalarsub(df, sc, reader)
        if cond is not None:
            df = df.filter(cond)
        return df

    def _apply_semijoin(self, df, semi: SemiJoin, reader):
        sub = semi.sub
        sub_df, lifted, deferred = self._materialize_sub(sub, reader)
        cond = _and_maybe(sub.where_cond, semi.extra_cond, lifted)
        how = "left_anti" if semi.anti else "left_semi"
        if cond is None:
            cond = F.lit(True)
        if not deferred:
            return df.join(sub_df, cond, how)
        # Deep-correlated NOT EXISTS (``_parent._parent`` under negation,
        # reference expression.py:320-329): the anti-join's condition
        # references ancestor aliases only in scope HERE, so it cannot run
        # inside the subquery frame. Lowering: tag each left row with a
        # row id, build the (row, sub-row) pair frame where every alias is
        # visible, anti-join the deferred subqueries per pair, and map the
        # surviving pair set back through a semi/anti join on the row id.
        # The tag is frozen with an eager persist so the id is stable on
        # both sides of the self-join (monotonically_increasing_id is
        # plan-position-dependent). Scale note: this materializes the left
        # frame once — only queries in this rare shape pay for it. The pin
        # is released by the consuming Cursor / context leave.
        rid = self._next_rid()
        dfr = _pin(df.withColumn(rid, F.monotonically_increasing_id()))
        pairs = dfr.join(sub_df, cond, "inner")
        for m in deferred:
            if isinstance(m, OrGroup):
                pairs = self._apply_orgroup(pairs, m, reader, deep_ok=True)
            elif isinstance(m, ScalarSub):
                pairs = self._apply_scalarsub(pairs, m, reader)
            else:
                pairs = self._apply_semijoin(pairs, m, reader)
        keep = pairs.select(rid).distinct()
        return dfr.join(keep, rid, how).drop(rid)

    _rid_seq = iter(range(10**9))

    def _next_rid(self):
        return "__rid%d" % next(View._rid_seq)

    def _apply_scalarsub(self, df, sc: ScalarSub, reader):
        """Lower a scalar-subquery comparison ``(op x (from t (select
        (agg y)) (where ...)))`` (reference: any parenthesized SELECT is
        a valid SQL operand, /root/reference/tanker/expression.py:213-219).

        Both operands may be scalar subqueries, in any mix of
        correlated and uncorrelated: each side is attached as a per-row
        value column by :meth:`_scalar_attach` (the right/`other` side
        first), then the comparison is one filter. The heavy lifting —
        picking the cheapest of the three lowerings per subquery — is
        documented on ``_scalar_attach``.
        """
        from .expression import Subquery as _Subquery

        if isinstance(sc.other, _Subquery):
            out, oval = self._scalar_attach(df, sc.other, reader)
            inner = ScalarSub(sc.op, F.col(oval), sc.sub, sc.sub_on_left)
            return self._apply_scalarsub(out, inner, reader).drop(oval)
        out, val = self._scalar_attach(df, sc.sub, reader)
        return out.filter(sc.cond(F.col(val))).drop(val)

    def _field_scalar(self, df, marker, reader):
        """Lower a scalar subquery in FIELD position to ``(frame,
        value_column)``. A bare ``(from ...)`` field yields the scalar
        itself; a comparison field ``(> x (from ...))`` yields the
        boolean. Helper columns stay on the frame — the caller's
        projection prunes them."""
        if isinstance(marker, Subquery):
            out, val = self._scalar_attach(df, marker, reader)
            return out, F.col(val)
        # ScalarSub: comparison whose operand(s) are subqueries
        if isinstance(marker.other, Subquery):
            out, oval = self._scalar_attach(df, marker.other, reader)
            inner = ScalarSub(
                marker.op, F.col(oval), marker.sub, marker.sub_on_left
            )
            out, val = self._scalar_attach(out, inner.sub, reader)
            return out, inner.cond(F.col(val))
        out, val = self._scalar_attach(df, marker.sub, reader)
        return out, marker.cond(F.col(val))

    def _scalar_attach(self, df, sub, reader):
        """Attach a scalar subquery's per-row value to ``df`` as a
        fresh uniquely-named column; returns ``(frame, column_name)``
        with every helper column already dropped.

        Three shapes, cheapest plan that fits:

        - **uncorrelated** → the one-row aggregate frame is broadcast
          cross-joined (no driver collect: the scalar stays a lazy plan
          node, so the whole query remains one job);
        - **equality-correlated** (every ``_parent.``-touching conjunct
          is a simple ``(= local _parent.x)``) → classic decorrelation:
          groupBy the correlation keys on the subquery side, aggregate,
          LEFT equi-join back — one shuffle on the keys, the TPC-H Q17
          plan that survives 100× scale;
        - **anything else** (non-equi correlation) → row-id pair frame:
          tag left rows, left-outer join the subquery side on the full
          correlation condition, aggregate per row id, join back. One
          bounded materialization of the left frame (same machinery as
          deep-correlated NOT EXISTS).

        A no-match group yields NULL (SQL scalar-subquery semantics);
        ``count`` coalesces to 0. Non-aggregate selects take ONE
        arbitrary matching row on every path (SQL raises on >1 row;
        the uncorrelated ``limit(1)``, the decorrelated ``first()``
        and the pair-frame ``first(matched)`` make the same documented
        choice)."""
        sub_df, lifted, deferred = self._materialize_sub(sub, reader)
        (sel,) = sub.select_cols
        val = self._next_rid() + "_v"
        depth = sub.compiler._ext_depth
        if depth == 0 and lifted is None and not deferred:
            sdf = sub_df
            if sub.where_cond is not None:
                sdf = sdf.filter(sub.where_cond)
            if sub.select_is_agg:
                one = sdf.agg(sel.alias(val))
            else:
                sdf = sdf.select(sel.alias(val))
                if sub.distinct:
                    sdf = sdf.distinct()
                one = sdf.limit(1)
            return df.crossJoin(F.broadcast(one)), val
        entries = sub.where_entries
        equi_ok = (
            lifted is None
            and not deferred
            and entries
            and all(e.pair is not None for e in entries if e.depth)
            and any(e.depth for e in entries)
            and not sub.orgroups
        )
        if equi_ok:
            local = [e.cond for e in entries if not e.depth]
            pairs = [e.pair for e in entries if e.depth]
            sdf = sub_df
            for c in local:
                sdf = sdf.filter(c)
            kas = ["%s_k%d" % (val, i) for i in range(len(pairs))]
            agg_sel = sel if sub.select_is_agg else F.first(sel)
            gb = sdf.groupBy(
                *[loc.alias(ka) for (loc, _), ka in zip(pairs, kas)]
            ).agg(agg_sel.alias(val))
            on = None
            for (_, par), ka in zip(pairs, kas):
                c = par == gb[ka]
                on = c if on is None else (on & c)
            out = df.join(gb, on, "left")
            if sub.select_is_count:
                out = out.withColumn(
                    val, F.coalesce(gb[val], F.lit(0))
                )
            return out.drop(*kas), val
        # general correlation: row-id pair frame. Pairs are built with
        # an INNER join (no-match left rows rejoin as NULL below), so
        # deep-deferred markers from the scalar's own subqueries —
        # anti joins, OR groups, nested scalars with ``_parent._parent``
        # reach — can be applied directly on the pair frame, where
        # every ancestor alias is in scope.
        rid = self._next_rid()
        dfr = _pin(df.withColumn(rid, F.monotonically_increasing_id()))
        jc = _and_maybe(sub.where_cond, lifted)
        pframe = dfr.join(
            sub_df, jc if jc is not None else F.lit(True), "inner"
        )
        for m in deferred:
            if isinstance(m, OrGroup):
                pframe = self._apply_orgroup(
                    pframe, m, reader, deep_ok=True
                )
            elif isinstance(m, ScalarSub):
                pframe = self._apply_scalarsub(pframe, m, reader)
            else:
                pframe = self._apply_semijoin(pframe, m, reader)
        if sub.select_bare_count:
            agg_col = F.count(F.lit(1))
        elif sub.select_is_agg:
            agg_col = sel
        else:
            # arbitrary matching row (inner pairs: all rows matched)
            agg_col = F.first(sel)
        scal = pframe.groupBy(rid).agg(agg_col.alias(val))
        out = dfr.join(scal, rid, "left")
        if sub.select_is_count:
            out = out.withColumn(val, F.coalesce(F.col(val), F.lit(0)))
        return out.drop(rid), val

    def _materialize_sub(self, sub, reader):
        """Build a subquery's frame, applying its own nested subqueries.

        Returns ``(df, lifted_cond, deferred_antis)``. Nested subqueries
        whose correlation stays within this subquery (``reach() <= 1``)
        become semi/anti joins on the frame itself; deeper correlation
        (``_parent._parent``, reference expression.py:320-329) is
        flattened — the nested frame is joined in unconditionally and its
        full condition is lifted into the ancestor's join condition, where
        every referenced alias is in scope. Catalyst pushes the
        sub-local equalities of the lifted condition back down into this
        join, so the plan stays an equi-join tree, not a cartesian
        product (pinned by planner_test). Deep-correlated ANTI subqueries
        cannot be flattened conjunctively — they are returned in
        ``deferred_antis`` for the ancestor's pair-frame lowering
        (see ``_apply_semijoin``).
        """
        df = sub.compiler.planner.apply(
            reader(sub.compiler.table.name), reader
        )
        lifted = None
        deferred = []
        for scm in sub.nested_scalars:
            # a scalar comparison inside this subquery's WHERE (TPC-H
            # Q20 shape): its correlation targets THIS frame, where the
            # aliases are in scope — apply it here. Deeper correlation
            # (the scalar's subquery reaching past this frame,
            # ``_parent._parent``) is deferred to the ancestor pair
            # frame, where every referenced alias resolves — the same
            # deferral as deep ANTI subqueries.
            if scm.sub.compiler._ext_depth >= 2:
                deferred.append(scm)
                continue
            df = self._apply_scalarsub(df, scm, reader)
        for m in sub.nested_semis:
            if m.reach() <= 1:
                df = self._apply_semijoin(df, m, reader)
                continue
            if m.anti:
                deferred.append(m)
                continue
            ndf, nlifted, ndeferred = self._materialize_sub(m.sub, reader)
            df = df.join(ndf)
            lifted = _and_maybe(lifted, m.sub.where_cond, m.extra_cond,
                                nlifted)
            deferred.extend(ndeferred)
        for og in sub.orgroups:
            # an OR that references enclosing frames (its own _parent
            # conds, or disjunct semis correlated past this sub) cannot
            # run on this frame — defer it to the ancestor pair frame
            if og.owner_depth >= 1 or any(
                m.reach() >= 2 for d in og.disjuncts for m in d.semis
            ):
                deferred.append(og)
            else:
                df = self._apply_orgroup(df, og, reader)
        return df, lifted, deferred

    @staticmethod
    def _defers_anti(m: SemiJoin):
        """True if materializing ``m``'s subquery will bubble up a
        deep-correlated marker — anti OR deep scalar (mirrors
        ``_materialize_sub``'s deferral)."""
        for scm in m.sub.nested_scalars:
            if scm.sub.compiler._ext_depth >= 2:
                return True
        for n in m.sub.nested_semis:
            if n.reach() <= 1:
                continue
            if n.anti or View._defers_anti(n):
                return True
        return False

    def _apply_orgroup(self, df, og, reader, deep_ok=False):
        """Lower ``(or ... subquery ...)`` into a disjoint union of
        branches: rows matching an earlier disjunct are excluded from
        later branches, so no dedup (and no row-multiplication) is
        needed. Groups with multiple hard disjuncts (NOT-EXISTS /
        multi-EXISTS) fall back to the row-id union path.

        ``deep_ok=True`` marks application on an ancestor pair frame
        (see ``_materialize_sub`` deferral) where deep-correlated
        disjuncts resolve — every referenced alias is in scope there."""
        def hard(d):
            # a disjunct we cannot *exclude* with one anti/semi join:
            # multi-semi, anti, nested OR, scalar comparison, or deep
            # (_parent._parent) correlation — all of these go through the
            # rid union path (deep semis lower via _apply_semijoin's own
            # pair frame)
            return (len(d.semis) > 1 or any(m.anti for m in d.semis)
                    or any(self._defers_anti(m) for m in d.semis)
                    or bool(d.ors) or bool(d.scalars)
                    or any(m.reach() >= 2 for m in d.semis))

        disjuncts = sorted(og.disjuncts, key=hard)  # hard ones last
        if sum(1 for d in disjuncts if hard(d)) > 1:
            return self._orgroup_by_rid(df, disjuncts, reader)
        branches, excl = [], []
        for d in disjuncts:
            b = df
            for e in excl:
                b = self._exclude_disjunct(b, e, reader)
            if d.cond is not None:
                b = b.filter(d.cond)
            for m in d.semis:
                b = self._apply_semijoin(b, m, reader)
            for nog in d.ors:
                b = self._apply_orgroup(b, nog, reader, deep_ok=deep_ok)
            for scm in d.scalars:
                b = self._apply_scalarsub(b, scm, reader)
            branches.append(b)
            excl.append(d)
        out = branches[0]
        for b in branches[1:]:
            out = out.unionAll(b)
        return out

    def _orgroup_by_rid(self, df, disjuncts, reader):
        """General OR lowering: tag rows with an id, compute each
        disjunct's surviving id set independently (any mix of EXISTS /
        NOT-EXISTS / multi-semi branches), union the sets, and semi-join
        back. One materialization of the left frame + one distinct on a
        single-column id set — no row duplication, no per-branch
        exclusion chain."""
        rid = self._next_rid()
        # freeze ids before the self-join (see _apply_semijoin)
        dfr = _pin(df.withColumn(rid, F.monotonically_increasing_id()))
        keeps = []
        for d in disjuncts:
            b = dfr.filter(d.cond) if d.cond is not None else dfr
            for m in d.semis:
                b = self._apply_semijoin(b, m, reader)
            for nog in d.ors:
                b = self._apply_orgroup(b, nog, reader, deep_ok=True)
            for scm in d.scalars:
                b = self._apply_scalarsub(b, scm, reader)
            keeps.append(b.select(rid))
        keep = keeps[0]
        for k in keeps[1:]:
            keep = keep.unionAll(k)
        return dfr.join(keep.distinct(), rid, "left_semi").drop(rid)

    def _exclude_disjunct(self, df, d, reader):
        """Keep rows NOT satisfying disjunct ``d`` (cond ∧ all semis)."""
        if not d.semis:
            return df.filter(~F.coalesce(d.cond, F.lit(False)))
        (m,) = d.semis  # hard disjuncts are never excluded (sorted last)
        sub_df, lifted, _ = self._materialize_sub(m.sub, reader)
        # fold d.cond (left-side-only) into the anti-join condition:
        # dropped rows are exactly those where cond holds AND a match
        # exists — ¬(cond ∧ ∃) for everything else
        cond = _and_maybe(m.sub.where_cond, m.extra_cond, lifted, d.cond)
        return df.join(
            sub_df, cond if cond is not None else F.lit(True), "left_anti"
        )

    # ------------------------------------------------------------------
    # WRITE
    # ------------------------------------------------------------------
    def _normalize(self, data):
        """Input → per-field python value lists (reference view.py:398-415)."""
        if isinstance(data, list) and data and isinstance(data[0], dict):
            return [
                [record.get(f.name) for record in data] for f in self.fields
            ]
        if isinstance(data, dict):
            return [[data.get(f.name)] for f in self.fields]
        if pandas is not None and isinstance(data, pandas.DataFrame):
            return [data[f.name].values for f in self.fields]
        cols = list(zip(*data))
        if not cols:
            cols = [[] for _ in self.fields]
        return [list(c) for c in cols]

    def _stage(self, data):
        """Build the incoming DataFrame from driver-side python data:
        coerce types per column, then resolve FKs (:meth:`_resolve`)."""
        from pyspark.sql import types as T

        spark = ctx.spark
        out_cols = {}  # physical col name → python list
        fk_groups = []  # (col, fields, staged names)
        schema_fields = []

        fk_id_cols = []  # m2o written by raw id → validate existence
        for col, fields in self.field_map.items():
            idx = self.field_idx[col]
            if col.ctype == "M2O":
                if len(fields) == 1 and fields[0].ref is None:
                    # raw fk value: the referenced column's value (the
                    # surrogate id for `m2o t.id`, the natural value
                    # otherwise) — coerce with the referenced col's type
                    if col.foreign_col == "id":
                        values = col.format(data[idx[0]], astype="M2O")
                    else:
                        rcol = col.get_foreign_table().get_column(
                            col.foreign_col
                        )
                        values = rcol.format(data[idx[0]])
                    out_cols[col.name] = values
                    schema_fields.append(
                        T.StructField(col.name, col.spark_type())
                    )
                    fk_id_cols.append(col)
                else:
                    staged = []
                    for j, (f, i) in enumerate(zip(fields, idx)):
                        remote_col = f.ref.remote_table.get_column(
                            f.ref.remote_field
                        )
                        vals = remote_col.format(data[i])
                        nm = "__fk__%s__%d" % (col.name, j)
                        out_cols[nm] = vals
                        staged.append(nm)
                        schema_fields.append(
                            T.StructField(nm, remote_col.spark_type())
                        )
                    fk_groups.append((col, fields, staged))
            else:
                values = col.format(data[idx[0]])
                out_cols[col.name] = values
                schema_fields.append(
                    T.StructField(col.name, col.spark_type())
                )

        schema = T.StructType(schema_fields)
        inc = None
        try:
            # pyarrow-Table path: typed C-level conversion, ~5× faster
            # than object-dtype pandas → Arrow at 100k rows
            import pyarrow as pa

            session_tz = spark.conf.get("spark.sql.session.timeZone")
            inc = spark.createDataFrame(
                pa.table({
                    f.name: pa.array(
                        _pa_norm(list(out_cols[f.name]), f.dataType,
                                 session_tz),
                        type=_pa_type(f.dataType),
                    )
                    for f in schema_fields
                }),
                schema,
            )
        except Exception:
            inc = None
        if inc is None and pandas is not None:
            try:
                pdf = pandas.DataFrame(
                    {f.name: pandas.Series(out_cols[f.name], dtype=object)
                     for f in schema_fields}
                )
                inc = spark.createDataFrame(pdf, schema)
            except Exception:
                inc = None
        if inc is None:
            rows = list(zip(*[out_cols[f.name] for f in schema_fields]))
            inc = spark.createDataFrame(rows, schema)
        return self._resolve(inc, fk_groups, fk_id_cols)

    def _stage_spark(self, data):
        """Stage an already-distributed Spark DataFrame (the 100 TB ingest
        path — no driver round-trip). Columns are matched by view field
        NAME (dotted names allowed) and cast to the declared types."""
        sel = []
        fk_groups = []
        fk_id_cols = []
        for col, fields in self.field_map.items():
            if col.ctype == "M2O":
                if len(fields) == 1 and fields[0].ref is None:
                    sel.append(
                        F.col(_bt(fields[0].name))
                        .cast(col.spark_type()).alias(col.name)
                    )
                    fk_id_cols.append(col)
                else:
                    staged = []
                    for j, f in enumerate(fields):
                        remote_col = f.ref.remote_table.get_column(
                            f.ref.remote_field
                        )
                        nm = "__fk__%s__%d" % (col.name, j)
                        sel.append(
                            F.col(_bt(f.name))
                            .cast(remote_col.spark_type()).alias(nm)
                        )
                        staged.append(nm)
                    fk_groups.append((col, fields, staged))
            else:
                src = next(f.name for f in fields)
                sel.append(
                    F.col(_bt(src)).cast(col.spark_type()).alias(col.name)
                )
        return self._resolve(data.select(*sel), fk_groups, fk_id_cols)

    def _resolve(self, inc, fk_groups, fk_id_cols):
        """Resolve dotted-FK groups to surrogate ids via joins.

        The reference uses an LRU cache + paginated lookups
        (view.py:642-711); here each group is one left equi-join against
        the remote table's (key → id) projection — stateless, and left
        un-hinted so AQE picks broadcast vs shuffle from actual sizes (a
        billion-row dimension must not be force-broadcast).

        Unresolved-value / unknown-id validation is FUSED into the plan —
        no eager ``.first()`` pre-pass, which on the distributed-ingest
        path (``_stage_spark``) would cost one extra full scan per fk
        group. Violations are recorded in the ``__viol`` string column
        (plain data, so later write-filter predicates still push down);
        ``_attach_guards`` turns them into a ``raise_error`` riding the
        first key column after the filter legs. Rows removed before the
        guard (write filters, delete key-joins on fk-free keys) are NOT
        validated — validated-rows-only semantics, pinned by
        write_test.test_lazy_validation_scope."""
        for col, fields, staged in fk_groups:
            remote = col.get_foreign_table()
            remote_fields = [f.desc.split(".", 1)[1] for f in fields]
            # stored fk value = the REFERENCED column's value (surrogate
            # id for `m2o t.id`; the natural column itself otherwise)
            lk_names = ["__lk__%d" % j for j in range(len(remote_fields))]
            if col.foreign_col in remote_fields:
                lookup = View(remote.name, remote_fields).read(
                    disable_acl=True
                ).frame().toDF(*lk_names)
                lookup = lookup.withColumn(
                    "__lk__id",
                    F.col(lk_names[remote_fields.index(col.foreign_col)]),
                )
            else:
                lookup = View(
                    remote.name, remote_fields + [col.foreign_col]
                ).read(disable_acl=True).frame()
                lookup = lookup.toDF(*(lk_names + ["__lk__id"]))
            on = None
            for nm, lk in zip(staged, lk_names):
                c = F.col(_bt(nm)) == F.col(lk)
                on = c if on is None else (on & c)
            inc = inc.join(lookup, on, "left")
            # unresolved non-null values → error (reference view.py:700-711)
            not_all_null = None
            for nm in staged:
                c = F.col(_bt(nm)).isNotNull()
                not_all_null = c if not_all_null is None else (
                    not_all_null | c
                )
            err = F.concat(
                F.lit("Values ("),
                F.concat_ws(
                    ", ",
                    *[F.col(_bt(nm)).cast("string") for nm in staged]
                ),
                F.lit(') %s "%s"' % (FK_UNKNOWN_NEEDLE, remote.name)),
            )
            viol = F.when(
                F.col("__lk__id").isNull() & not_all_null, err
            )
            if VIOL in inc.columns:
                viol = F.coalesce(F.col(VIOL), viol)
            inc = (
                inc.withColumn(col.name, F.col("__lk__id"))
                .withColumn(VIOL, viol)
                .drop("__lk__id", *lk_names)
                .drop(*staged)
            )

        # Raw fk-id writes: check the ids exist in the remote table (the
        # reference relies on the DB's FOREIGN KEY constraint here —
        # tests/write_test.py:276-291 with bogus id 0). Same fused-guard
        # shape: left join a presence marker, raise on miss.
        for col in fk_id_cols:
            remote = col.get_foreign_table()
            rcol = col.foreign_col
            marker = "__rid__%s" % col.name
            remote_ids = ctx.read(remote.name).select(
                F.col(rcol).alias(marker)
            )
            inc = inc.join(
                remote_ids,
                F.col(_bt(col.name)) == F.col(marker),
                "left",
            )
            err = F.concat(
                F.lit('%s "' % FK_BADID_NEEDLE),
                F.col(_bt(col.name)).cast("string"),
                F.lit('" for foreign key "%s" (table "%s")'
                      % (col.name, remote.name)),
            )
            viol = F.when(
                F.col(_bt(col.name)).isNotNull()
                & F.col(marker).isNull(),
                err,
            )
            if VIOL in inc.columns:
                viol = F.coalesce(F.col(VIOL), viol)
            inc = inc.withColumn(VIOL, viol).drop(marker)
        return inc

    def _attach_guards(self, inc, key_checks=True):
        """Turn recorded violations into plan-embedded ``raise_error``
        guards riding the first key column (always evaluated by the
        merge join / delete key join), plus — for writes — the null-key
        and duplicate-key checks. Attached AFTER the write-filter legs,
        matching the reference order (its filter DELETEs on the tmp
        table ran before the ON CONFLICT upsert): a dup/null/unknown-fk
        row removed by a write filter is no violation. The dup-check
        window partitions by exactly the merge-join key, so it shares
        the join's shuffle instead of adding one. Nothing is committed
        on failure — the version pointer only flips after a successful
        write."""
        table = self.table
        k0 = self.key_cols[0]
        guard = None
        if VIOL in inc.columns:
            guard = F.when(
                F.col(VIOL).isNotNull(), F.raise_error(F.col(VIOL))
            )
        if key_checks:
            null_key_cond = None
            for k in self.key_cols:
                c = F.col(_bt(k)).isNull()
                kcol = table.get_column(k)
                if kcol.base_type == "VARCHAR" and not kcol.array_dim:
                    c = c | (F.col(_bt(k)) == "")
                null_key_cond = c if null_key_cond is None else (
                    null_key_cond | c
                )
            null_msg = '%s for table "%s"' % (NULLKEY_NEEDLE, table.name)
            dup_msg = (
                '%s for table "%s" — dedup first (e.g. '
                "operators.dedup.dedup_exact_rows)"
                % (DUPKEY_NEEDLE, table.name)
            )
            from pyspark.sql import Window as _Window

            kwin = _Window.partitionBy(
                *[F.col(_bt(k)) for k in self.key_cols]
            )
            nguard = F.when(null_key_cond, F.raise_error(null_msg)).when(
                F.count(F.lit(1)).over(kwin) > 1, F.raise_error(dup_msg)
            )
            guard = (
                nguard if guard is None
                else guard.when(null_key_cond, F.raise_error(null_msg))
                .when(F.count(F.lit(1)).over(kwin) > 1,
                      F.raise_error(dup_msg))
            )
        if guard is None:
            return inc.drop(VIOL) if VIOL in inc.columns else inc
        inc = inc.withColumn(k0, guard.otherwise(F.col(_bt(k0))))
        if VIOL in inc.columns:
            inc = inc.drop(VIOL)
        return inc

    def validate_key(self, columns):
        if self.table.surrogate_id and "id" in columns:
            return
        missing = [c for c in self.table.key if c not in columns]
        if missing:
            raise ValueError(
                "You must reference all the columns composing the table"
                ' key when you want to write, delete or reference rows'
                ' (or pass the id column).  Table is "%s", missing columns'
                " are: %s" % (self.table.name, ",".join(missing))
            )

    def _filter_legs(self, inc, filters, fresh_env):
        """Remove incoming rows failing write-filters (reference
        view.py:554-631), in ONE joined frame and ONE count action.

        The 'new' leg evaluates predicates against the *incoming* values
        (staged columns aliased to the incoming side); the 'old' leg
        against the *currently stored* values (only rows whose key
        already exists can fail it). The reference runs two DELETEs on
        the tmp table; round 1 ran 4 eager count actions (2 per leg) —
        here both legs share one ``inc LEFT JOIN existing`` frame and
        both filtered-counts come from a single aggregate (SURVEY §7
        hard-part 1: lazy counts)."""
        table = self.table
        existing = ctx.read(table.name)
        key = self.key_cols
        staged_names = {c.name for c in self.field_map}

        # 'new' leg: staged columns read the incoming side
        aliases = {n: "__tmp" for n in staged_names}
        new_c = ExpressionCompiler(
            table, env=self.base_env(), table_aliases=aliases
        )
        cond_new, _ = new_c.build_filter(filters, fresh_env())
        # 'old' leg: all columns read the stored side; shares the join-
        # alias counter so dotted-path join aliases stay globally unique
        old_planner = JoinPlanner(table, counter=new_c.planner.counter)
        old_c = ExpressionCompiler(
            table, planner=old_planner, env=self.base_env()
        )
        cond_old, _ = old_c.build_filter(filters, fresh_env())
        pend_new = (list(new_c.pending_semijoins)
                    + list(new_c.pending_orgroups)
                    + list(new_c.pending_scalarsubs))
        pend_old = (list(old_c.pending_semijoins)
                    + list(old_c.pending_orgroups)
                    + list(old_c.pending_scalarsubs))
        if cond_new is None and not pend_new:
            return inc, 0, 0

        ex = existing.withColumn("__ex_present", F.lit(True))
        frame = inc.alias("__tmp").join(
            ex.alias(table.name),
            self._key_cond("__tmp", table.name, key),
            "left",
        )
        frame = self._apply_extra_joins(frame, new_c.planner)
        frame = self._apply_extra_joins(frame, old_c.planner)

        # Subqueries in write filters (reference: ACL-write rules flow
        # through the same expression pipeline, view.py:351-365 with
        # expression.py:160): each leg's pending semi/or markers become a
        # per-row satisfied flag — tag rows with an id, run the read
        # path's semi-join lowering on the tagged frame, and left-join
        # the surviving id set back as the flag.
        if pend_new or pend_old:
            frame = _pin(frame.withColumn(
                "__fl_rid", F.monotonically_increasing_id()))
            for markers, flag in ((pend_new, "__subq_new"),
                                  (pend_old, "__subq_old")):
                if not markers:
                    continue
                b = frame
                for m in markers:
                    if isinstance(m, OrGroup):
                        b = self._apply_orgroup(b, m, ctx.read)
                    elif isinstance(m, ScalarSub):
                        b = self._apply_scalarsub(b, m, ctx.read)
                    else:
                        b = self._apply_semijoin(b, m, ctx.read)
                sat = b.select("__fl_rid").withColumn(flag, F.lit(True))
                frame = frame.join(sat, "__fl_rid", "left")

        matched = F.col("%s.__ex_present" % table.name).isNotNull()
        if cond_new is None:
            cond_new = F.lit(True)
            cond_old = F.lit(True)
        fail_new = ~(cond_new | cond_new.isNull())
        fail_old = matched & ~(cond_old | cond_old.isNull())
        if pend_new:
            fail_new = fail_new | F.col("__subq_new").isNull()
        if pend_old:
            fail_old = fail_old | (
                matched & F.col("__subq_old").isNull())

        # one aggregate action for both counts; leg order preserved (the
        # old leg counts only rows the new leg kept)
        stats = frame.agg(
            F.sum(F.when(fail_new, 1).otherwise(0)).alias("n"),
            F.sum(F.when(~fail_new & fail_old, 1).otherwise(0)).alias("o"),
        ).first()
        keep = frame.filter(~fail_new & ~fail_old).select(
            *[F.col("__tmp." + n).alias(n) for n in inc.columns]
        )
        return keep, int(stats["n"] or 0), int(stats["o"] or 0)

    def _apply_extra_joins(self, frame, planner):
        for (l_alias, r_table, l_col, r_col), alias in planner.joins.items():
            right = ctx.read(r_table).alias(alias)
            cond = F.col("%s.%s" % (l_alias, l_col)) == F.col(
                "%s.%s" % (alias, r_col)
            )
            frame = frame.join(right, cond, "left")
        return frame

    @staticmethod
    def _key_cond(l_alias, r_alias, key):
        cond = None
        for k in key:
            c = F.col("%s.%s" % (l_alias, k)) == F.col(
                "%s.%s" % (r_alias, k)
            )
            cond = c if cond is None else (cond & c)
        return cond

    def write(
        self,
        data,
        purge=False,
        insert=True,
        update=True,
        filters=None,
        disable_acl=False,
        args=None,
    ):
        """Natural-key upsert; returns ``{'filtered': n, 'deleted': m}``."""
        table = self.table
        if not table.surrogate_id:
            raise ValueError(
                'Table "%s" is external/read-only' % table.name
            )
        self.validate_key({c.name for c in self.field_map})
        if isinstance(filters, str):
            filters = [filters]
        # each filter leg compiles the predicates independently → fresh
        # positional-arg queue per leg (the reference re-renders params
        # per statement execution)
        fresh_env = lambda: EnvContext(
            args if not isinstance(args, dict) else None,
            args if isinstance(args, dict) else None,
        )

        from pyspark.sql import DataFrame as SparkDataFrame

        if isinstance(data, SparkDataFrame):
            inc = self._stage_spark(data)
        else:
            inc = self._stage(self._normalize(data))

        # NULL/empty key values rejected (reference enforces NOT NULL
        # DDL, context.py:589-596), duplicate natural keys in the input
        # rejected (the reference's ON CONFLICT upsert errors with
        # "cannot affect row a second time"; silent duplicates would
        # also collide the xxhash64 surrogate ids), unknown fk values
        # rejected — ALL fused into the merge plan via _attach_guards
        # (called in _write_exec after the filter legs).

        # write filters / ACL-write
        if not disable_acl:
            filters = (filters or []) + ctx.cfg.get("acl-write", {}).get(
                table.name, []
            )
        self.ins_filter_cnt = self.upd_filter_cnt = 0
        try:
            with _claim_pins():
                return self._write_exec(
                    inc, purge, insert, update, filters, disable_acl,
                    fresh_env,
                )
        except ValueError:
            raise
        except Exception as e:  # surface plan-embedded guards cleanly
            _reraise_guards(e)

    def _write_exec(self, inc, purge, insert, update, filters,
                    disable_acl, fresh_env):
        """Execute the write legs (validation guards are embedded in
        ``inc``'s plan and fire on the first action)."""
        table = self.table
        if filters:
            inc, self.ins_filter_cnt, self.upd_filter_cnt = (
                self._filter_legs(inc, filters, fresh_env)
            )
        inc = self._attach_guards(inc)

        # When the partition column is part of the natural key, a key can
        # only ever live in one partition — the merge join may then prune
        # the existing-side scan to the incoming partitions (incremental
        # upserts become O(touched partitions), not O(table)). Purge
        # needs the whole table (it deletes matching rows anywhere).
        from . import storage as _storage

        prune_parts = None
        pby = table.partition_by
        if (
            not purge
            and len(pby) == 1
            and pby[0] in self.key_cols
            and pby[0] in inc.columns
            and _storage.current_version_path(ctx.root, table.name)
        ):
            prune_parts = {
                tuple(r) for r in
                inc.select(pby[0]).distinct().collect()
            }

        rowcounts = {}
        merged = self._merge(
            inc, insert=insert, update=update, prune_parts=prune_parts
        )

        victims_parts = None
        if purge:
            deleted, merged, victims_parts = self._purge_leg(
                merged, inc, filters, disable_acl, fresh_env()
            )
            rowcounts["deleted"] = deleted

        merged = self._unique_guard(merged, prune_parts)
        self._commit(inc, merged, victims_parts, prune_parts=prune_parts)
        rowcounts["filtered"] = self.ins_filter_cnt + self.upd_filter_cnt
        ctx.reset_cache(table.name)
        if purge and rowcounts.get("deleted"):
            self._cascade_delete(table, self._purge_victims)
        return rowcounts

    def _commit(self, inc, merged, victims_parts=None, prune_parts=None):
        """Write the merge result: partition-scoped when possible.

        For single-column-partitioned tables the merge only rewrites the
        partitions the incoming rows (old+new location) or purge victims
        touch; everything else is hard-linked from the previous snapshot
        (storage.write_table_partial) — the 100 TB upsert path."""
        from . import storage

        table = self.table
        pby = table.partition_by
        if (
            len(pby) == 1
            and pby[0] in {c.name for c in table.physical_columns()}
            and pby[0] in inc.columns
            and storage.current_version_path(ctx.root, table.name)
        ):
            pcol = pby[0]
            existing = ctx.read(table.name)
            if prune_parts is not None:
                # partition col ∈ key: keys can't move, the incoming
                # partitions ARE the changed set
                changed = set(prune_parts) | set(victims_parts or ())
            else:
                inc_parts = {
                    tuple(r)
                    for r in inc.select(pcol).distinct().collect()
                }
                # rows whose key matches may MOVE partition: their old
                # partition must be rewritten too
                old_parts = {
                    tuple(r)
                    for r in existing.join(
                        inc.select(*self.key_cols), on=self.key_cols,
                        how="left_semi",
                    ).select(pcol).distinct().collect()
                }
                changed = inc_parts | old_parts | set(victims_parts or ())
            part_col = F.col(_bt(pcol))
            values = [v for (v,) in changed if v is not None]
            cond = part_col.isin(values) if values else F.lit(False)
            if any(v is None for (v,) in changed):
                cond = cond | part_col.isNull()
            storage.write_table_partial(
                merged.filter(cond), ctx.root, table.name, pby,
                sorted(changed, key=str),
                keep=ctx.cfg.get("keep_versions"),
                zorder_by=table.zorder_by,
            )
        else:
            ctx.write(table.name, merged)

    def _merge(self, inc, insert=True, update=True, prune_parts=None):
        """Full-outer merge on key_cols; only view columns are touched on
        matched rows (partial update, reference test write_test.py:85-111);
        surrogate id preserved for existing rows, ``xxhash64(key)`` for new
        ones. ``prune_parts``: restrict the existing-side scan to these
        partition values (valid only when the partition col is in the
        key — see write())."""
        table = self.table
        key = self.key_cols
        existing = ctx.read(table.name)
        if prune_parts is not None:
            pcol = F.col(_bt(table.partition_by[0]))
            vals = [v for (v,) in prune_parts if v is not None]
            cond = pcol.isin(vals) if vals else F.lit(False)
            if any(v is None for (v,) in prune_parts):
                cond = cond | pcol.isNull()
            existing = existing.filter(cond)
        staged = {c for c in inc.columns}

        inc_marked = inc.withColumn("__in_present", F.lit(True))
        renames = {
            c: "__in_" + c for c in inc.columns if c not in key
        }
        for old, new in renames.items():
            inc_marked = inc_marked.withColumnRenamed(old, new)
        ex_marked = existing.withColumn("__ex_present", F.lit(True))

        joined = ex_marked.join(inc_marked, on=key, how="full_outer")
        present_in = F.col("__in_present").isNotNull()
        present_ex = F.col("__ex_present").isNotNull()

        out_cols = []
        for col in table.physical_columns():
            name = col.name
            if name in key:
                out_cols.append(F.col(_bt(name)))
            elif name == "id":
                new_id = (
                    F.col("__in_id")
                    if "id" in staged and "id" not in key
                    else F.xxhash64(*[F.col(_bt(k)) for k in table.key])
                )
                out_cols.append(
                    F.coalesce(F.col("id") if "id" in existing.columns
                               else F.lit(None), new_id).alias("id")
                )
            elif name in staged:
                src_new = F.col("__in_" + name)
                src_old = F.col(_bt(name))
                if update and insert:
                    val = F.when(present_in, src_new).otherwise(src_old)
                elif update:  # update only
                    val = F.when(present_in & present_ex, src_new
                                 ).otherwise(src_old)
                else:  # insert only: existing rows untouched
                    val = F.when(~present_ex, src_new).otherwise(src_old)
                out_cols.append(val.alias(name))
            else:
                # column not in view: keep stored value; defaults on insert
                src = (F.col(_bt(name)) if name in existing.columns
                       else F.lit(None).cast(col.spark_type()))
                if col.default is not None:
                    dflt = self._default_col(col)
                    src = F.when(~present_ex, dflt).otherwise(src)
                out_cols.append(src.alias(name))

        merged = joined
        if not insert:
            merged = merged.filter(present_ex)
        merged = merged.select(*out_cols)
        # cast to declared schema for stability
        casted = [
            F.col(_bt(c.name)).cast(c.spark_type()).alias(c.name)
            for c in table.physical_columns()
        ]
        return merged.select(*casted)

    @staticmethod
    def _default_col(col):
        d = col.default
        if isinstance(d, str) and d.lower() in (
            "current_timestamp", "now()", "now"
        ):
            c = F.current_timestamp()
            if col.base_type == "TIMESTAMP":
                c = c.cast("timestamp_ntz")
            return c
        return F.lit(d)

    def _unique_guard(self, merged, prune_parts=None):
        """Enforce declared ``unique:`` groups on the merge output
        (reference creates unique DB indexes, context.py:655-677; round 1
        parsed them into the catalog and never enforced — VERDICT gap).

        Same fused shape as the key guards: a ``raise_error`` riding on
        the ``id`` column, with one window count per unique group (NULLs
        never conflict, matching SQL unique-index semantics). The window
        shuffle only exists when the table declares ``unique:``.

        For partition-pruned commits the merge output only covers the
        changed partitions, so each group is additionally checked against
        the UNTOUCHED partitions via a presence-marker left join (a
        distinct projection of the outside scan — the unavoidable price
        of a global constraint under partial rewrite; Delta pays the same
        on MERGE)."""
        table = self.table
        if not table.unique:
            return merged
        from pyspark.sql import Window as _Window

        guard = F.col("id")
        for gi, group in enumerate(table.unique):
            cols = [F.col(_bt(c)) for c in group]
            notnull = None
            for c in cols:
                nn = c.isNotNull()
                notnull = nn if notnull is None else (notnull & nn)
            msg = '%s for table "%s" on columns (%s)' % (
                UNIQUE_NEEDLE, table.name, ", ".join(group)
            )
            w = _Window.partitionBy(*cols)
            clash = F.count(F.lit(1)).over(w) > 1
            if prune_parts is not None:
                pcol = table.partition_by[0]
                part = F.col(_bt(pcol))
                vals = [v for (v,) in prune_parts if v is not None]
                inside = part.isin(vals) if vals else F.lit(False)
                if any(v is None for (v,) in prune_parts):
                    inside = inside | part.isNull()
                marker = "__uq__%d" % gi
                outside = (
                    ctx.read(table.name)
                    .filter(~F.coalesce(inside, F.lit(False)))
                    .select(*[F.col(_bt(c)).alias("__uo_%s" % c)
                              for c in group])
                    .distinct()
                    .withColumn(marker, F.lit(True))
                )
                on = None
                for c in group:
                    e = F.col(_bt(c)) == F.col("__uo_%s" % c)
                    on = e if on is None else (on & e)
                merged = merged.join(outside, on, "left")
                clash = clash | F.col(marker).isNotNull()
            guard = F.when(
                notnull & clash, F.raise_error(msg)
            ).otherwise(guard)
        merged = merged.withColumn("id", guard)
        if prune_parts is not None:
            drops = ["__uq__%d" % gi for gi in range(len(table.unique))]
            drops += ["__uo_%s" % c for g in table.unique for c in g]
            merged = merged.drop(*[d for d in drops
                                   if d in merged.columns])
        return merged

    def _purge_leg(self, merged, inc, filters, disable_acl, env_ctx):
        """Delete stored rows matching filters but absent from the input
        (reference view.py:554-631, what='purge')."""
        table = self.table
        key = self.key_cols
        acl_filters = None
        if not disable_acl:
            acl_filters = ctx.cfg.get("acl-write", {}).get(table.name)
        compiler = ExpressionCompiler(table, env=self.base_env())
        cond, _ = compiler.build_filter(filters, env_ctx, acl_filters)

        frame = merged.alias(table.name)
        frame = self._apply_extra_joins(frame, compiler.planner)
        absent = None
        inc_keys = inc.select(
            *[F.col(_bt(k)).alias("__k_" + k) for k in key]
        )
        on = None
        for k in key:
            c = F.col("%s.%s" % (table.name, k)) == F.col("__k_" + k)
            on = c if on is None else (on & c)
        victims = frame.join(inc_keys, on, "left_anti")
        for m in compiler.pending_semijoins:
            victims = self._apply_semijoin(victims, m, ctx.read)
        for og in compiler.pending_orgroups:
            victims = self._apply_orgroup(victims, og, ctx.read)
        for scm in compiler.pending_scalarsubs:
            victims = self._apply_scalarsub(victims, scm, ctx.read)
        if cond is not None:
            victims = victims.filter(cond)
        sel = [F.col("%s.%s" % (table.name, k)).alias(k) for k in key]
        pby = table.partition_by
        picked = set(key)
        if len(pby) == 1 and pby[0] not in key:
            sel.append(F.col("%s.%s" % (table.name, pby[0])).alias(pby[0]))
            picked.add(pby[0])
        # columns other tables' FKs reference (usually ``id``) ride
        # along so purge victims can seed the ON-DELETE-CASCADE walk
        refd = {
            col.foreign_col
            for child in ctx.registry.values() if child.surrogate_id
            for col in child.own_columns
            if col.ctype == "M2O" and col.foreign_table == table.name
        }
        for rc in sorted(refd - picked):
            sel.append(F.col("%s.%s" % (table.name, rc)).alias(rc))
        victims = victims.select(*sel).cache()
        victim_parts = None
        if len(pby) == 1:
            # one action: per-partition victim counts give both the
            # deleted total and the touched-partition set
            rows = victims.groupBy(F.col(_bt(pby[0]))).count().collect()
            deleted = sum(r["count"] for r in rows)
            victim_parts = {(r[pby[0]],) for r in rows}
        else:
            deleted = victims.count()
        kept = merged.join(
            victims.select(*key), on=key, how="left_anti"
        )
        self._purge_victims = victims
        return deleted, kept, victim_parts

    def _cascade_delete(self, parent_table, parent_victims):
        """ON DELETE CASCADE across the registry's relation graph.

        The reference declares every m2o FK ``ON DELETE CASCADE``
        (/root/reference/tanker/table.py:70-74), so the backend removes
        referencing rows transitively when a parent row dies. Here the
        relation graph is walked with a worklist; each rewritten child
        re-enters the list so grandchildren (and self-references) follow
        until a fixpoint. Driver work is one cheap existence probe per
        live child — bounded by the relation graph and the cascade
        depth, never by row count; the deletes themselves are
        distributed hash semi/anti joins.

        Two snapshot-safety rules make this correct under
        ``KEEP_VERSIONS=2`` retention:

        - **victim frames are spilled, never kept lazy**: a victims plan
          is bound to a concrete snapshot dir, and the cascade keeps
          writing new versions of the same tables — two writes GC the
          backing snapshot out from under an unevaluated plan
          (FileNotFoundException mid-cascade, cascade half-applied).
          Before any further write can flip versions, the columns
          downstream steps will read (the FK-referenced ones, distinct —
          metadata-scale, not table-scale) are written to a tmp parquet
          under the storage root. Durable, unlike ``cache()`` whose
          eviction would recompute against the deleted snapshot.
        - **one write per child per step**: all FK edges from a child to
          the same parent (e.g. ``match.home``/``match.away`` -> team)
          are combined — per-edge hash semi-joins unioned on the
          surrogate id (an OR join condition would force a nested-loop
          join) — so the child is read and rewritten at most once."""
        import os
        import shutil
        import uuid

        # edges grouped by parent; per parent, the set of its columns any
        # FK references (all a downstream cascade step reads of victims)
        edges, referenced = {}, {}
        for child in ctx.registry.values():
            if not child.surrogate_id:
                continue
            for col in child.own_columns:
                if col.ctype != "M2O":
                    continue
                edges.setdefault(col.foreign_table, []).append(
                    (child, col))
                referenced.setdefault(col.foreign_table, set()).add(
                    col.foreign_col)

        tmp_root = os.path.join(ctx.root, "_cascade", uuid.uuid4().hex)
        n_spills = 0

        def pin(tname, victims):
            nonlocal n_spills
            cols = sorted(referenced.get(tname, ()))
            if not cols or tname not in edges:
                return None  # leaf table: nothing cascades from it
            path = os.path.join(tmp_root, "%s_%d" % (tname, n_spills))
            n_spills += 1
            (victims.select(*[_bt(c) for c in cols]).distinct()
             .write.parquet(path))
            return ctx.spark.read.parquet(path)

        try:
            pending = []
            pinned = pin(parent_table.name, parent_victims)
            if pinned is not None:
                pending.append((parent_table, pinned))
            while pending:
                ptable, victims = pending.pop()
                by_child = {}
                for child, col in edges.get(ptable.name, ()):
                    by_child.setdefault(child.name, (child, []))[1] \
                        .append(col)
                for child, cols in by_child.values():
                    existing_c = ctx.read(child.name)
                    vict_ids = None
                    for col in cols:
                        pref = victims.select(
                            F.col(_bt(col.foreign_col)).alias("__pref")
                        ).distinct()
                        leg = existing_c.join(
                            pref,
                            existing_c[col.name] == F.col("__pref"),
                            "left_semi",
                        ).select(F.col("id").alias("__vid"))
                        vict_ids = (leg if vict_ids is None
                                    else vict_ids.unionByName(leg))
                    if len(cols) > 1:
                        vict_ids = vict_ids.distinct()
                    if not vict_ids.limit(1).count():
                        continue
                    on = existing_c["id"] == F.col("__vid")
                    cvict = existing_c.join(vict_ids, on, "left_semi")
                    # spill BEFORE the write below flips versions
                    pinned = pin(child.name, cvict)
                    kept = existing_c.join(vict_ids, on, "left_anti")
                    ctx.write(child.name, kept)
                    ctx.reset_cache(child.name)
                    if pinned is not None:
                        pending.append((child, pinned))
        finally:
            shutil.rmtree(tmp_root, ignore_errors=True)

    # ------------------------------------------------------------------
    # DELETE
    # ------------------------------------------------------------------
    @_claims_pins
    def delete(self, filters=None, data=None, args=None, swap=False):
        """Delete rows matching filters/data (or NOT matching if swap).

        Reference: view.py:246-299. Implemented as semi/anti joins on the
        surrogate id (filters) or the natural key (data)."""
        table = self.table
        if not table.surrogate_id:
            raise ValueError(
                'Table "%s" is external/read-only' % table.name
            )
        self.validate_key({c.name for c in self.field_map})
        existing = ctx.read(table.name)

        if not any((data is not None, filters)):
            # truncate: the count is the return value (the only reason
            # the old table is scanned at all)
            before = existing.count()
            empty = ctx.spark.createDataFrame([], existing.schema)
            ctx.write(table.name, empty)
            ctx.reset_cache(table.name)
            if before:
                self._cascade_delete(table, existing)
            return before
        if data is not None and filters:
            raise ValueError(
                "Deletion by both data and filter not supported"
            )

        if data is not None:
            from pyspark.sql import DataFrame as SparkDataFrame

            if isinstance(data, SparkDataFrame):
                inc = self._stage_spark(data)
            else:
                inc = self._stage(self._normalize(data))
            # fk-violation guard only fires when the fk is part of the
            # key (the only columns the delete join evaluates)
            inc = self._attach_guards(inc, key_checks=False)
            keys = inc.select(*self.key_cols)
            victims = existing.join(
                keys, on=self.key_cols,
                how="left_anti" if swap else "left_semi",
            )
            kept = existing.join(
                keys, on=self.key_cols,
                how="left_semi" if swap else "left_anti",
            )
        else:
            env_ctx = EnvContext(
                args if not isinstance(args, dict) else None,
                args if isinstance(args, dict) else None,
            )
            compiler = ExpressionCompiler(table, env=self.base_env())
            cond, _ = compiler.build_filter(filters, env_ctx)
            frame = compiler.planner.apply(existing, ctx.read)
            for semi in compiler.pending_semijoins:
                frame = self._apply_semijoin(frame, semi, ctx.read)
            for og in compiler.pending_orgroups:
                frame = self._apply_orgroup(frame, og, ctx.read)
            for scm in compiler.pending_scalarsubs:
                frame = self._apply_scalarsub(frame, scm, ctx.read)
            if cond is not None:
                frame = frame.filter(cond)
            ids = frame.select(F.col("%s.id" % table.name).alias("id"))
            victims = existing.join(
                ids, on="id", how="left_anti" if swap else "left_semi"
            )
            kept = existing.join(
                ids, on="id", how="left_semi" if swap else "left_anti"
            )

        from . import storage as _storage

        pby = table.partition_by
        try:
            if (
                len(pby) == 1
                and _storage.current_version_path(ctx.root, table.name)
            ):
                # partition-scoped delete (VERDICT round-1 weak spot:
                # delete always rewrote the full table): one action gives
                # per-partition victim counts; only partitions that lost
                # rows are rewritten, the rest are hard-linked.
                pcol = pby[0]
                rows = victims.groupBy(F.col(_bt(pcol))).count().collect()
                deleted = sum(r["count"] for r in rows)
                if deleted:
                    parts = {(r[pcol],) for r in rows}
                    vals = [v for (v,) in parts if v is not None]
                    cond = (F.col(_bt(pcol)).isin(vals) if vals
                            else F.lit(False))
                    if any(v is None for (v,) in parts):
                        cond = cond | F.col(_bt(pcol)).isNull()
                    _storage.write_table_partial(
                        kept.filter(cond), ctx.root, table.name, pby,
                        sorted(parts, key=str),
                        keep=ctx.cfg.get("keep_versions"),
                        zorder_by=table.zorder_by,
                    )
            else:
                deleted = victims.count()
                if deleted:
                    ctx.write(table.name, kept)
        except ValueError:
            raise
        except Exception as e:  # plan-embedded guards (fk in key cols)
            _reraise_guards(e)
        ctx.reset_cache(table.name)
        if deleted:
            # victims binds the pre-delete snapshot path (resolved at
            # frame build), so it stays readable after the pointer flip
            self._cascade_delete(table, victims)
        return deleted


def fetch(tablename, filter_by):
    """Single-record dict get (reference: view.py:714-721)."""
    columns = [c.name for c in Table.get(tablename).own_columns]
    view = View(tablename, ["id"] + columns)
    values = view.read(filters=filter_by).one()
    if values is None:
        return None
    keys = (f.name for f in view.fields)
    return dict(zip(keys, values))


def save(tablename, data):
    """Single-record dict put (reference: view.py:724-727)."""
    view = View(tablename, list(data.keys()))
    view.write([data])

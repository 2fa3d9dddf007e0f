"""s-expression query language → PySpark ``Column`` compiler.

The reference (``/root/reference/tanker/expression.py``) parses the same
grammar into SQL text; here the AST is compiled straight into a PySpark
logical plan: column references become ``F.col("alias.column")`` over a
set of inferred LEFT JOINs (the :class:`JoinPlanner`, the equivalent of the
reference's ``ReferenceSet`` at expression.py:24-124), and builtins become
``pyspark.sql.functions`` calls, so Catalyst gets a fully declarative plan
(predicate pushdown, join reordering, codegen — all free).

Grammar (reference: expression.py:127-284):
  ``(= country.name "Belgium")``, ``(and (> qty 1) (in status "a" "b"))``,
  ``(count)``, ``(cast created_at (date))``, params ``{}``/``{0}``/``{kw}``
  with ``{obj.attr}``/``{x!r}``/``{x:>5}`` support, subqueries
  ``(from tbl (select col) (where ...))`` with ``_parent.`` correlation.
"""

from __future__ import annotations

import shlex
from collections import OrderedDict
from string import Formatter

from pyspark.sql import functions as F

from .table import Table, spark_type
from .utils import ctx

_formatter = Formatter()

#: heads whose bare-token args are unit/type names, not columns
RAW_ARG_HEADS = {"cast", "extract", "date_trunc", "strftime", "->>"}

#: tanker cast targets → Spark SQL type names
CAST_TYPES = {
    "varchar": "string",
    "integer": "int",
    "bigint": "bigint",
    "float": "double",
    "bool": "boolean",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "date": "date",
    "jsonb": "string",
    "bytea": "binary",
}


def as_col(x):
    """Promote python literals to Column; pass Columns through."""
    from pyspark.sql import Column

    if isinstance(x, Column):
        return x
    return F.lit(x)


class Ref:
    """A resolved column reference: remote table/field + join alias."""

    __slots__ = ("remote_table", "remote_field", "join_alias", "column")

    def __init__(self, remote_table, remote_field, join_alias, column):
        self.remote_table = remote_table
        self.remote_field = remote_field
        self.join_alias = join_alias
        self.column = column

    def col(self):
        return F.col("%s.%s" % (self.join_alias, self.remote_field))

    def __repr__(self):
        return "<Ref %s.%s>" % (self.join_alias, self.remote_field)


class _AliasCounter:
    """Query-global join-alias counter (shared across subqueries)."""

    def __init__(self):
        self.n = 0

    def next(self, table_name):
        self.n += 1
        return "%s_%s" % (table_name, self.n)


class JoinPlanner:
    """Collects the LEFT JOINs implied by dotted column paths.

    Key dedup: identical ``(left_alias, right_table, left_col, right_col)``
    re-uses the same join alias (reference: expression.py:103-105), so
    ``a.b.c`` and ``a.b.d`` share one join.
    """

    def __init__(self, table, base_alias=None, table_aliases=None,
                 parent=None, counter=None):
        self.table = table
        self.base_alias = base_alias or table.name
        # per-column alias override (used by the write-filter 'new' leg,
        # reference: view.py:606-609)
        self.table_aliases = table_aliases
        self.joins = OrderedDict()  # key tuple -> alias
        self.parent = parent
        self.counter = counter or (parent.counter if parent else _AliasCounter())

    def alias_for(self, column_name=None):
        if self.table_aliases and column_name in self.table_aliases:
            return self.table_aliases[column_name]
        return self.base_alias

    def get_ref(self, desc, table=None, force_alias=None) -> Ref:
        table = table or self.table
        left_alias = force_alias
        if desc in table:
            col = table.get_column(desc)
            left_alias = left_alias or self.alias_for(col.name)
            return Ref(table, desc, left_alias, col)
        if "." not in desc:
            raise KeyError(
                'Column "%s" not found in table "%s"' % (desc, table.name)
            )
        head, tail = desc.split(".", 1)
        rel = table.get_column(head)
        foreign_table = rel.get_foreign_table()
        left_alias = left_alias or self.alias_for(head)
        right_table = foreign_table.name

        if rel.ctype == "M2O":
            left_col = head
            right_col = rel.foreign_col
        else:  # O2M: defined as other_table.fk — reversed join
            fk = rel.foreign_col
            left_col = foreign_table.get_column(fk).foreign_col
            right_col = fk

        key = (left_alias, right_table, left_col, right_col)
        if key in self.joins:
            foreign_alias = self.joins[key]
        else:
            foreign_alias = self.counter.next(right_table)
            self.joins[key] = foreign_alias
        return self.get_ref(tail, table=foreign_table,
                            force_alias=foreign_alias)

    def apply(self, base_df, reader):
        """Materialize base + collected joins into one DataFrame.

        ``reader(table_name)`` loads a table's DataFrame. Joins are LEFT
        equi-joins in insertion order; the alias strings make qualified
        column references (``F.col("alias.col")``) resolvable downstream.
        """
        df = base_df.alias(self.base_alias)
        for (l_alias, r_table, l_col, r_col), alias in self.joins.items():
            right = reader(r_table).alias(alias)
            cond = F.col("%s.%s" % (l_alias, l_col)) == F.col(
                "%s.%s" % (alias, r_col)
            )
            df = df.join(right, cond, "left")
        return df


# ---------------------------------------------------------------------------
# AST node types
# ---------------------------------------------------------------------------

class Symbol:
    """A bare token: column path, env alias, builtin, or _parent ref."""

    __slots__ = ("token", "first")

    def __init__(self, token, first=False):
        self.token = token
        self.first = first

    def __repr__(self):
        return "<Symbol %s>" % self.token


class Param:
    """``{...}`` placeholder (reference: expression.py:353-399)."""

    def __init__(self, token):
        self.fmt_spec = self.conversion = None
        if ":" in token:
            token, self.fmt_spec = token.split(":", 1)
        if "!" in token:
            token, self.conversion = token.split("!", 1)
        dotted = token.split(".")
        self.key, self.tail = dotted[0], dotted[1:]

    def resolve(self, env_ctx):
        key = self.key
        try:
            as_int = int(key)
        except ValueError:
            as_int = None
        if key == "":
            value = env_ctx.pop_positional()
        elif as_int is not None:
            value = env_ctx.args[as_int]
        elif key in env_ctx.kwargs:
            value = env_ctx.kwargs[key]
        else:
            value = env_ctx.global_lookup(key)
        for attr in self.tail:
            value = value[attr] if isinstance(value, dict) else getattr(
                value, attr
            )
        if self.fmt_spec:
            value = _formatter.format_field(value, self.fmt_spec)
        if self.conversion:
            value = _formatter.convert_field(value, self.conversion)
        return value


class Node:
    """A parenthesized expression ``(head arg1 arg2 ...)``."""

    __slots__ = ("items", "sub_table")

    def __init__(self, items, sub_table=None):
        self.items = items
        self.sub_table = sub_table  # set for (from tbl ...) nodes

    def head_token(self):
        if self.items and isinstance(self.items[0], Symbol):
            return self.items[0].token.lower()
        return None

    def is_aggregate(self):
        head = self.head_token()
        if head == "over":
            # window expressions are ROW-level: the aggregate inside
            # (over (sum x) ...) must not trigger auto-GROUP-BY
            return False
        if head == "from":
            # a subquery is its own aggregation scope: (from t (select
            # (count)) ...) in field position is a ROW-level scalar
            return False
        if head in AGGREGATES:
            return True
        return any(
            isinstance(it, Node) and it.is_aggregate() for it in self.items
        )

    def __repr__(self):
        return "<Node %s>" % (self.items,)


class NULL:
    """The ``null`` keyword."""


# markers -------------------------------------------------------------------

class AnyAll:
    """Result of ``(any arr)`` / ``(all arr)`` — resolved by the enclosing
    comparison into array_contains / forall (reference: expression.py:154-155
    emits PG ``any()/all()``)."""

    def __init__(self, col, mode):
        self.col = col
        self.mode = mode  # 'any' | 'all'


class Subquery:
    """Compiled ``(from tbl ...)``: child planner + select cols + where.

    ``nested_semis`` / ``orgroups`` carry subqueries found inside this
    subquery's own WHERE (reference supports arbitrary nesting,
    expression.py:320-329); the frame builder applies them recursively.

    ``where_entries`` (one :class:`WhereEntry` per plain WHERE conjunct)
    and the ``select_*`` flags feed the scalar-subquery lowering in the
    frame builder: an equality-correlated aggregate subquery decorrelates
    into a groupBy + equi-join, everything else falls back to the row-id
    pair frame.
    """

    def __init__(self, compiler, select_cols, where_cond, distinct=False,
                 nested_semis=None, orgroups=None, where_entries=None,
                 select_is_agg=False, select_is_count=False,
                 select_bare_count=False, nested_scalars=None):
        self.compiler = compiler  # child ExpressionCompiler
        self.select_cols = select_cols
        self.where_cond = where_cond
        self.distinct = distinct
        self.nested_semis = nested_semis or []
        self.orgroups = orgroups or []
        self.where_entries = where_entries or []
        self.select_is_agg = select_is_agg
        self.select_is_count = select_is_count
        self.select_bare_count = select_bare_count
        # scalar comparisons inside this subquery's own WHERE (TPC-H
        # Q20 shape); applied on the subquery frame by _materialize_sub
        self.nested_scalars = nested_scalars or []


class WhereEntry:
    """One plain WHERE conjunct of a subquery: its compiled condition,
    its ``_parent.``-reference depth, and — when it is a simple
    ``(= local _parent.x)`` equality — the (local, parent) column pair
    that lets a scalar subquery decorrelate into groupBy + equi-join."""

    def __init__(self, cond, depth, pair):
        self.cond = cond
        self.depth = depth
        self.pair = pair  # None | (local Column, parent Column)


class SemiJoin:
    """A pending left_semi / left_anti join produced by exists/in-subquery.

    ``owner_depth`` records how many ``_parent.`` levels the symbols of the
    enclosing filter item climb (0 = none): the frame builder uses it to
    decide whether this join is self-contained one level up or must be
    flattened into an ancestor's join condition.
    """

    def __init__(self, sub: Subquery, extra_cond=None, anti=False):
        self.sub = sub
        self.extra_cond = extra_cond
        self.anti = anti
        self.owner_depth = 0

    def reach(self):
        """Levels above ``sub`` referenced by the full join condition.

        1 means: only the immediate parent frame (the join's left side) —
        directly applicable. ≥2 means the condition mentions a grand-parent
        (``_parent._parent``) and the subquery frame must be flattened into
        the ancestor's semi-join right side instead.
        """
        r = self.owner_depth + 1
        r = max(r, self.sub.compiler._ext_depth)
        for m in self.sub.nested_semis:
            r = max(r, m.reach() - 1)
        for og in self.sub.orgroups:
            for d in og.disjuncts:
                for m in d.semis:
                    r = max(r, m.reach() - 1)
        return r


class ScalarSub:
    """Pending scalar-subquery comparison: ``(< x (from t (select (avg y))
    (where ...)))``. The reference gets scalar subqueries for free by
    emitting the parenthesized SELECT as SQL text in operand position
    (/root/reference/tanker/expression.py:213-219); here the marker is
    lowered by the frame builder (``View._apply_scalarsub``) into one of
    three shapes: uncorrelated → 1-row broadcast cross join;
    equality-correlated aggregate → decorrelated groupBy + equi-join
    (the 100 TB plan); anything else → row-id pair frame."""

    def __init__(self, op, other, sub, sub_on_left):
        self.op = op  # one of _OPS comparison callables
        self.other = other  # the non-subquery operand (Column / literal)
        self.sub = sub
        self.sub_on_left = sub_on_left
        self.owner_depth = 0

    def cond(self, vcol):
        """The comparison Column once the scalar is available as vcol."""
        a, b = (vcol, self.other) if self.sub_on_left else (self.other, vcol)
        return self.op(as_col(a), b)


class AndGroup:
    """A conjunction that carries lifted semi-joins: ``(and (exists ...)
    (= a b))`` splits into a plain condition + pending joins. ``ors``
    carries OR-disjunctions that themselves contain subqueries;
    ``scalars`` carries scalar-subquery comparisons."""

    def __init__(self, cond, semis, ors=None, scalars=None):
        self.cond = cond  # Column or None
        self.semis = semis
        self.ors = ors or []
        self.scalars = scalars or []


class OrGroup:
    """A disjunction with at least one subquery disjunct: ``(or (exists S)
    P)``. The frame builder lowers it into a disjoint union of branches —
    ``F.filter(P) ∪ F.filter(~P').semi(S)`` — so EXISTS/IN under OR never
    needs a boolean-valued subquery column (reference emits plain SQL,
    expression.py:137-138,160).

    ``owner_depth`` (stamped like SemiJoin's) records how many
    ``_parent.`` levels the disjuncts' own-scope symbols climb: an
    OrGroup inside a subquery that references enclosing frames cannot be
    applied on the subquery frame alone — the frame builder defers it to
    the ancestor pair frame where every alias is in scope."""

    def __init__(self, disjuncts):
        self.disjuncts = disjuncts  # list[AndGroup]
        self.owner_depth = 0


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def tokenize(text):
    lexer = shlex.shlex(text)
    lexer.wordchars += ".!=<>:{}-*"
    return list(lexer)


class ExpressionCompiler:
    """Parses and compiles s-expressions for one base table.

    One compiler per query; owns a JoinPlanner and an env of view-field
    aliases. Subqueries get child compilers sharing the alias counter so
    join aliases stay globally unique.
    """

    def __init__(self, table, planner=None, parent=None, table_aliases=None,
                 env=None):
        self.table = table
        self.parent = parent
        self.env = env or {}
        if planner is None:
            if parent is not None:
                base_alias = parent.planner.counter.next(table.name + "_sq")
                planner = JoinPlanner(
                    table, base_alias=base_alias,
                    counter=parent.planner.counter,
                    parent=parent.planner,
                )
            else:
                planner = JoinPlanner(table, table_aliases=table_aliases)
        self.planner = planner
        # collected by compile(): semi/anti joins to apply on the frame
        self.pending_semijoins = []
        # OR-disjunctions containing subqueries (lowered to frame unions)
        self.pending_orgroups = []
        # scalar-subquery comparisons (lowered by _apply_scalarsub)
        self.pending_scalarsubs = []
        # deepest `_parent.` chain compiled in THIS compiler's scope —
        # drives SemiJoin.reach() (correlation-depth analysis)
        self._ext_depth = 0

    # -- parse ----------------------------------------------------------
    def parse(self, text):
        tokens = tokenize(text)
        node = self._read(tokens)
        if tokens:
            raise ValueError('Unexpected tokens after ending ")"')
        return node

    def _read(self, tokens, first=False):
        if not tokens:
            raise SyntaxError("unexpected EOF while reading")
        token = tokens.pop(0)
        if token == "(":
            items = []
            sub_table = None
            if tokens and tokens[0].lower() == "from":
                tokens.pop(0)
                sub_table = tokens.pop(0)
                items.append(Symbol("from", first=True))
            first_pos = sub_table is None
            while tokens and tokens[0] != ")":
                items.append(self._read(tokens, first=first_pos))
                first_pos = False
            if not tokens:
                raise SyntaxError("missing )")
            tokens.pop(0)
            return Node(items, sub_table=sub_table)
        if token == ")":
            raise SyntaxError("unexpected )")
        return self._atom(token, first=first)

    def _atom(self, token, first=False):
        for q in ('"', "'"):
            if len(token) > 1 and token[0] == q and token[-1] == q:
                return token[1:-1]
        if len(token) > 1 and token[0] == "{" and token[-1] == "}":
            return Param(token[1:-1])
        if token in self.table:
            return Symbol(token, first=first)
        try:
            return int(token)
        except ValueError:
            pass
        try:
            return float(token)
        except ValueError:
            pass
        if token.lower() == "null":
            return NULL
        return Symbol(token, first=first)

    # -- env ------------------------------------------------------------
    def expand_env(self, token):
        """Field-name alias → its desc (reference: expression.py:251-254)."""
        if token in self.env and token not in self.table:
            return self.env[token]
        return None

    def compile_ref(self, desc, env_ctx):
        """Compile a bare field desc (column / dotted path / env alias)."""
        return self._compile_symbol(Symbol(desc), env_ctx)

    # -- compile --------------------------------------------------------
    def compile(self, node, env_ctx, raw=False):
        """AST → pyspark Column (or python value / marker)."""
        if isinstance(node, Symbol):
            return self._compile_symbol(node, env_ctx, raw=raw)
        if isinstance(node, Param):
            return node.resolve(env_ctx)
        if node is NULL:
            return None
        if isinstance(node, Node):
            return self._compile_node(node, env_ctx, raw=raw)
        return node  # literal

    def _compile_symbol(self, sym, env_ctx, raw=False):
        token = sym.token
        if token.startswith("_parent."):
            compiler = self
            tail = token
            levels = 0
            while tail.startswith("_parent."):
                _, tail = tail.split(".", 1)
                compiler = compiler.parent
                levels += 1
                if compiler is None:
                    raise ValueError("No parent query for %s" % token)
            self._ext_depth = max(self._ext_depth, levels)
            return compiler.planner.get_ref(tail).col()
        desc = self.expand_env(token)
        if desc is not None:
            if desc.startswith("("):
                return self.compile(self.parse(desc), env_ctx)
            if desc.startswith("{"):
                return as_col(Param(desc[1:-1]).resolve(env_ctx))
            return self.planner.get_ref(desc).col()
        try:
            return self.planner.get_ref(token).col()
        except KeyError:
            if raw:
                return token
            raise ValueError(
                'Unknown identifier "%s" on table "%s"'
                % (token, self.table.name)
            )

    def _compile_node(self, node, env_ctx, raw=False):
        if node.sub_table is not None:
            return self._compile_subquery(node, env_ctx)
        items = list(node.items)
        if not items:
            raise ValueError("Empty expression")
        head = items[0]
        if isinstance(head, Symbol):
            name = head.token.lower()
            if name == "over":
                return self._compile_over(items[1:], env_ctx)
            if name in BUILTINS or name in AGGREGATES:
                fn = BUILTINS.get(name) or AGGREGATES.get(name)
                arg_raw = name in RAW_ARG_HEADS
                args = [
                    self.compile(a, env_ctx, raw=arg_raw) for a in items[1:]
                ]
                return fn(self, args)
            # non-builtin zero-arg head → bare token string (the
            # `(varchar)` / `(epoch)` shielding rule — first-position
            # tokens never resolve to columns; reference expression.py:331)
            if len(items) == 1:
                return head.token
            # Spark-first extension: any other head passes through to
            # Spark SQL's function registry, so the whole built-in
            # library (substring, concat, greatest, datediff, ...) is
            # usable from s-expressions. The reference silently degrades
            # unknown heads to a bare string (expression.py:356-366 —
            # params evaluated then discarded); resolving is strictly
            # more useful, and a genuinely unknown name still fails fast
            # at analysis with Spark's UNRESOLVED_ROUTINE error.
            args = [self.compile(a, env_ctx) for a in items[1:]]
            return F.call_function(head.token, *[as_col(a) for a in args])
        # head is itself an expression or literal: evaluate it
        vals = [self.compile(a, env_ctx, raw=raw) for a in items]
        if len(vals) == 1:
            return vals[0]
        raise ValueError("Cannot evaluate expression %r" % node)

    def _compile_over(self, items, env_ctx):
        """Window functions (Spark-first extension; the reference's SQL
        passthrough would accept ``OVER`` text but tanker never exposes
        it): ``(over (sum x) (partition a b) (order c (desc d)))`` →
        ``F.sum(x).over(Window.partitionBy(a, b).orderBy(c, d.desc()))``.
        The function slot takes any aggregate head or the ranking/offset
        builtins (row_number/rank/dense_rank/lag/lead/ntile); partition
        and order are optional (order-less windows span the whole
        partition)."""
        from pyspark.sql import Window

        if not items:
            raise ValueError("(over ...) needs a function expression")
        func = self.compile(items[0], env_ctx)
        parts, orders = [], []
        for item in items[1:]:
            if not (isinstance(item, Node)
                    and item.head_token() in ("partition", "order")):
                raise ValueError(
                    "(over ...) clauses must be (partition ...) or "
                    "(order ...)"
                )
            for a in item.items[1:]:
                desc = (isinstance(a, Node)
                        and a.head_token() == "desc")
                col = as_col(self.compile(
                    a.items[1] if desc else a, env_ctx
                ))
                if item.head_token() == "partition":
                    parts.append(col)
                else:
                    orders.append(col.desc() if desc else col.asc())
        w = Window.partitionBy(*parts) if parts else Window.partitionBy()
        if orders:
            w = w.orderBy(*orders)
        return as_col(func).over(w)

    def _compile_subquery(self, node, env_ctx):
        child = ExpressionCompiler(
            Table.get(node.sub_table), parent=self
        )
        select_cols, where_cond = [], None
        distinct = False
        select_is_agg = select_is_count = select_bare_count = False
        semis, ors, scalars = [], [], []
        entries = []
        for item in node.items[1:]:
            if isinstance(item, Node):
                h = item.head_token()
                if h in ("select", "select-distinct"):
                    distinct = h == "select-distinct"
                    select_cols = [
                        child.compile(a, env_ctx) for a in item.items[1:]
                    ]
                    if len(item.items) == 2 and isinstance(
                            item.items[1], Node):
                        sel_node = item.items[1]
                        select_is_agg = sel_node.is_aggregate()
                        select_is_count = _count_headed(sel_node)
                        select_bare_count = (
                            sel_node.head_token() == "count"
                            and len(sel_node.items) == 1
                        )
                    continue
                if h == "where":
                    plains = []
                    for a in item.items[1:]:
                        c, depth = _compile_filter_item_d(child, a, env_ctx)
                        p, s, o, sc = _split_markers([c])
                        scalars.extend(sc)
                        if p is not None:
                            plains.append(p)
                            pair = None
                            if depth == 1:
                                pair = _corr_eq_pair(child, a, env_ctx)
                            entries.append(WhereEntry(p, depth, pair))
                        semis.extend(s)
                        ors.extend(o)
                    where_cond = _and_all(plains) if plains else None
                    continue
            raise ValueError("Unexpected subquery clause %r" % item)
        return Subquery(child, select_cols, where_cond, distinct,
                        nested_semis=semis, orgroups=ors,
                        where_entries=entries, select_is_agg=select_is_agg,
                        select_is_count=select_is_count,
                        select_bare_count=select_bare_count,
                        nested_scalars=scalars)

    # -- filter helpers -------------------------------------------------
    def build_filter(self, filters, env_ctx, acl_filters=None):
        """filters: str | list[str] | dict → one Column (AND) or None.

        Returns (condition, semijoins) — semijoins are pending left_semi /
        left_anti joins lifted out of ``exists`` / ``in (from ...)``;
        OR-disjunctions containing subqueries land in
        ``self.pending_orgroups``.
        """
        conds = []
        for fltr in (filters, acl_filters):
            if not fltr:
                continue
            if isinstance(fltr, dict):
                for key, val in fltr.items():
                    desc = self.expand_env(key)
                    target = desc if desc else key
                    col = self.planner.get_ref(target).col()
                    if val is None:
                        conds.append(col.isNull())
                    elif isinstance(val, (list, tuple, set)):
                        conds.append(col.isin(list(val)))
                    else:
                        conds.append(col == F.lit(val))
                continue
            if isinstance(fltr, str):
                fltr = [fltr]
            for line in fltr:
                conds.append(
                    _compile_filter_item(self, self.parse(line), env_ctx)
                )
        cond, semis, ors, scalars = _split_markers(conds)
        self.pending_semijoins.extend(semis)
        self.pending_orgroups.extend(ors)
        self.pending_scalarsubs.extend(scalars)
        return cond, semis


class EnvContext:
    """Runtime values for params: positional args, kwargs, ctx config."""

    def __init__(self, args=None, kwargs=None):
        self.args = list(args) if args else []
        self._queue = list(self.args)
        self.kwargs = dict(kwargs or {})

    def pop_positional(self):
        if not self._queue:
            raise ValueError("Missing positional argument for {} placeholder")
        return self._queue.pop(0)

    def global_lookup(self, key):
        try:
            aliases = ctx.aliases
            if key in aliases:
                return aliases[key]
        except Exception:
            pass
        try:
            cfg = ctx.cfg
            if key in cfg:
                return cfg[key]
        except Exception:
            pass
        raise KeyError('Unknown parameter "%s"' % key)


def _and_all(conds):
    conds = [as_col(c) for c in conds]
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _split_markers(conds):
    """Split compiled conditions into (plain AND-cond, semijoins,
    orgroups, scalar-subquery comparisons)."""
    plain, semis, ors, scalars = [], [], [], []
    for c in conds:
        if isinstance(c, SemiJoin):
            semis.append(c)
        elif isinstance(c, ScalarSub):
            scalars.append(c)
        elif isinstance(c, AndGroup):
            semis.extend(c.semis)
            ors.extend(c.ors)
            scalars.extend(c.scalars)
            if c.cond is not None:
                plain.append(c.cond)
        elif isinstance(c, OrGroup):
            ors.append(c)
        else:
            plain.append(as_col(c))
    return (_and_all(plain) if plain else None), semis, ors, scalars


def _compile_filter_item(compiler, node, env_ctx):
    """Compile one filter item, stamping the ``_parent.``-walk depth of its
    own-scope symbols onto any subquery markers it produces (feeds
    :meth:`SemiJoin.reach`)."""
    return _compile_filter_item_d(compiler, node, env_ctx)[0]


def _compile_filter_item_d(compiler, node, env_ctx):
    """Like :func:`_compile_filter_item` but also returns the item's own
    ``_parent.``-reference depth (0 = fully local)."""
    saved = compiler._ext_depth
    compiler._ext_depth = 0
    c = compiler.compile(node, env_ctx)
    item_depth = compiler._ext_depth
    compiler._ext_depth = max(saved, item_depth)
    if item_depth:
        _stamp_owner_depth(c, item_depth)
    return c, item_depth


def _count_headed(node):
    """True if the select expression bottoms out in ``(count ...)`` —
    possibly wrapped in scalar math like ``(* 0.2 (count x))`` — so the
    scalar-subquery lowering knows to coalesce a no-match NULL to 0
    (SQL: a scalar ``count`` over zero rows is 0, not NULL)."""
    if not isinstance(node, Node):
        return False
    if node.head_token() == "count":
        return True
    return any(_count_headed(it) for it in node.items)


def _has_param(node):
    if isinstance(node, Param):
        return True
    if isinstance(node, Node):
        return any(_has_param(it) for it in node.items)
    return False


def _corr_eq_pair(child, node, env_ctx):
    """If ``node`` is a simple correlation equality ``(= local _parent.x)``
    (either operand order), return the (local Column, parent Column)
    pair; else None. Re-compiling the two sides is cheap — the
    JoinPlanner dedups aliases — and keeps the main compile path
    untouched."""
    if (not isinstance(node, Node) or node.head_token() != "="
            or len(node.items) != 3):
        return None
    # the conjunct was already compiled once by _compile_filter_item_d;
    # re-compiling here must not consume positional {} params a second
    # time (that would corrupt the queue for every later filter item),
    # so snapshot and restore the arg queue around the side compiles.
    # A conjunct that itself CONTAINS params can't be re-compiled
    # faithfully (the queue has moved past its values) — skip the
    # equi fast path; the rid lowering uses the original where_cond.
    if _has_param(node):
        return None
    saved_queue = list(env_ctx._queue)
    sides = []
    for part in node.items[1:]:
        saved = child._ext_depth
        child._ext_depth = 0
        try:
            col = child.compile(part, env_ctx)
        except Exception:
            child._ext_depth = saved
            env_ctx._queue = saved_queue
            return None
        d = child._ext_depth
        child._ext_depth = max(saved, d)
        if isinstance(col, (SemiJoin, AndGroup, OrGroup, Subquery,
                            AnyAll, ScalarSub)):
            env_ctx._queue = saved_queue
            return None
        sides.append((col, d))
    env_ctx._queue = saved_queue
    (c0, d0), (c1, d1) = sides
    if d0 == 0 and d1 == 1:
        return (as_col(c0), as_col(c1))
    if d0 == 1 and d1 == 0:
        return (as_col(c1), as_col(c0))
    return None


def _stamp_owner_depth(c, depth):
    if isinstance(c, (SemiJoin, ScalarSub)):
        c.owner_depth = max(c.owner_depth, depth)
    elif isinstance(c, AndGroup):
        for s in c.semis:
            _stamp_owner_depth(s, depth)
        for og in c.ors:
            _stamp_owner_depth(og, depth)
        for sc in c.scalars:
            _stamp_owner_depth(sc, depth)
    elif isinstance(c, OrGroup):
        c.owner_depth = max(c.owner_depth, depth)
        for d in c.disjuncts:
            _stamp_owner_depth(d, depth)


# ---------------------------------------------------------------------------
# Builtins (reference: expression.py:130-182 — SQL text there, Columns here)
# ---------------------------------------------------------------------------

def _flatten_values(args):
    out = []
    for a in args:
        if isinstance(a, (list, tuple, set)):
            out.extend(a)
        else:
            out.append(a)
    return out


def _cmp(op):
    def fn(compiler, args):
        x, y = args
        if isinstance(x, Subquery) or isinstance(y, Subquery):
            if isinstance(x, Subquery) and isinstance(y, Subquery):
                # both sides scalar: the right one rides along in
                # `other`; the frame builder broadcasts both one-row
                # frames (uncorrelated only — correlation on either
                # side raises there)
                for s in (x, y):
                    if len(s.select_cols) != 1:
                        raise ValueError(
                            "scalar subquery must select exactly one "
                            "column"
                        )
                return ScalarSub(op, y, x, sub_on_left=True)
            sub_on_left = isinstance(x, Subquery)
            sub = x if sub_on_left else y
            other = y if sub_on_left else x
            if len(sub.select_cols) != 1:
                raise ValueError(
                    "scalar subquery must select exactly one column"
                )
            return ScalarSub(op, other, sub, sub_on_left)
        if isinstance(y, AnyAll):
            return _any_all_cmp(op, x, y)
        if isinstance(x, AnyAll):
            return _any_all_cmp(_flip(op), y, x)
        return op(as_col(x), y if not isinstance(y, AnyAll) else y)

    return fn


def _flip(op):
    flips = {
        "lt": "gt", "gt": "lt", "le": "ge", "ge": "le",
        "eq": "eq", "ne": "ne",
    }
    name = flips[op.__name__]
    return _OPS[name]


def _op_eq(a, b):
    return as_col(a) == b


def _op_ne(a, b):
    return as_col(a) != b


def _op_gt(a, b):
    return as_col(a) > b


def _op_lt(a, b):
    return as_col(a) < b


def _op_ge(a, b):
    return as_col(a) >= b


def _op_le(a, b):
    return as_col(a) <= b


_OPS = {"eq": _op_eq, "ne": _op_ne, "gt": _op_gt, "lt": _op_lt,
        "ge": _op_ge, "le": _op_le}
for _n, _f in _OPS.items():
    _f.__name__ = _n

#: logical negation of each comparison (for De-Morgan over ScalarSub)
_NEG_OP = {"eq": "ne", "ne": "eq", "lt": "ge", "ge": "lt",
           "gt": "le", "le": "gt"}


def _any_all_cmp(op, scalar, marker):
    """``(= x (any arr))`` → array_contains; ``(op x (all arr))`` →
    forall(arr, e -> op(x, e))."""
    arr = marker.col
    if marker.mode == "any":
        if op.__name__ == "eq":
            return F.array_contains(arr, scalar)
        return F.exists(arr, lambda e: op(as_col(scalar), e))
    return F.forall(arr, lambda e: op(as_col(scalar), e))


def _in_builtin(compiler, args, anti=False):
    target = args[0]
    rest = args[1:]
    if len(rest) == 1 and isinstance(rest[0], Subquery):
        sub = rest[0]
        if not sub.select_cols:
            raise ValueError("in-subquery needs a select clause")
        cond = as_col(target) == sub.select_cols[0]
        return SemiJoin(sub, extra_cond=cond, anti=anti)
    values = _flatten_values(rest)
    col = as_col(target).isin(values)
    return ~col if anti else col


def _variadic(fn_pair):
    sep, unary = fn_pair

    def fn(compiler, args):
        if len(args) == 1 and unary is not None:
            return unary(as_col(args[0]))
        out = as_col(args[0])
        for a in args[1:]:
            out = sep(out, a)
        return out

    return fn


def _b_extract(compiler, args):
    part, col = args
    part = str(part).lower()
    col = as_col(col)
    if part == "epoch":
        return F.unix_timestamp(col.cast("timestamp")).cast("double")
    if part == "dow":
        return (F.dayofweek(col) - 1).cast("bigint")  # PG: Sunday=0
    if part == "doy":
        return F.dayofyear(col).cast("bigint")
    return F.date_part(F.lit(part), col).cast("bigint")


def _b_cast(compiler, args):
    x, t = args
    t = str(t).lower()
    target = CAST_TYPES.get(t, t)
    if t == "timestamp" and isinstance(x, str):
        # string literal → parse
        return F.to_timestamp(F.lit(x)).cast("timestamp_ntz")
    return as_col(x).cast(target)


def _b_exists(compiler, args):
    (sub,) = args
    if not isinstance(sub, Subquery):
        raise ValueError("exists expects a (from ...) subquery")
    return SemiJoin(sub)


def _negate(compiler, x):
    """Recursive De Morgan over compiled filter markers: ``(not (and a
    b))`` → ``(or (not a) (not b))`` and dual, with EXISTS/IN flipping
    their anti flag. Sound under SQL three-valued logic (Kleene algebra:
    ¬ distributes over ∧/∨ with NULL preserved). The reference gets
    arbitrary ``not`` for free by emitting SQL text
    (/root/reference/tanker/expression.py:137-159); here the rewrite
    happens at the marker level before the join lowering."""
    if isinstance(x, SemiJoin):
        x.anti = not x.anti
        return x
    if isinstance(x, ScalarSub):
        # ¬(a op s) ≡ (a ¬op s) under 3VL: both sides are NULL exactly
        # when either operand is NULL, so filter semantics agree.
        x.op = _OPS[_NEG_OP[x.op.__name__]]
        return x
    if isinstance(x, AndGroup):
        parts = []
        if x.cond is not None:
            parts.append(~as_col(x.cond))
        parts.extend(_negate(compiler, s) for s in x.semis)
        parts.extend(_negate(compiler, og) for og in x.ors)
        parts.extend(_negate(compiler, sc) for sc in x.scalars)
        if len(parts) == 1:
            return parts[0]
        return _b_or(compiler, parts)
    if isinstance(x, OrGroup):
        return _b_and(compiler, [_negate(compiler, d) for d in x.disjuncts])
    return ~as_col(x)


def _b_not(compiler, args):
    (x,) = args
    return _negate(compiler, x)


def _b_json_get(compiler, args):
    x, key = args
    return F.get_json_object(as_col(x), "$.%s" % key)


def _b_and(compiler, args):
    cond, semis, ors, scalars = _split_markers(args)
    if semis or ors or scalars:
        return AndGroup(cond, semis, ors, scalars)
    return cond


def _b_or(compiler, args):
    if not any(isinstance(a, (SemiJoin, AndGroup, OrGroup, ScalarSub))
               for a in args):
        return _or_all(args)
    disjuncts, plains = [], []
    for a in args:
        if isinstance(a, SemiJoin):
            disjuncts.append(AndGroup(None, [a]))
        elif isinstance(a, ScalarSub):
            disjuncts.append(AndGroup(None, [], scalars=[a]))
        elif isinstance(a, AndGroup):
            # nested ors ride along on the disjunct; the frame builder
            # applies them per-branch (rid union path when hard)
            disjuncts.append(a)
        elif isinstance(a, OrGroup):
            disjuncts.extend(a.disjuncts)  # or-flattening
        else:
            plains.append(a)
    if plains:
        # all plain disjuncts collapse into one branch condition
        disjuncts.insert(0, AndGroup(_or_all(plains), []))
    return OrGroup(disjuncts)


BUILTINS = {
    "+": _variadic((lambda a, b: a + b, None)),
    "-": _variadic((lambda a, b: a - b, lambda x: -x)),
    "*": _variadic((lambda a, b: a * b, None)),
    "/": _variadic((lambda a, b: a / b, None)),
    "and": _b_and,
    "or": _b_or,
    "not": _b_not,
    ">=": _cmp(_OPS["ge"]),
    "<=": _cmp(_OPS["le"]),
    "=": _cmp(_OPS["eq"]),
    ">": _cmp(_OPS["gt"]),
    "<": _cmp(_OPS["lt"]),
    "!=": _cmp(_OPS["ne"]),
    "->>": _b_json_get,
    "like": lambda c, args: as_col(args[0]).like(args[1]),
    "ilike": lambda c, args: as_col(args[0]).ilike(args[1]),
    "in": lambda c, args: _in_builtin(c, args),
    "notin": lambda c, args: _in_builtin(c, args, anti=True),
    "any": lambda c, args: AnyAll(as_col(args[0]), "any"),
    "all": lambda c, args: AnyAll(as_col(args[0]), "all"),
    "unnest": lambda c, args: F.explode(as_col(args[0])),
    "is": lambda c, args: (
        as_col(args[0]).isNull()
        if args[1] is None
        else as_col(args[0]).eqNullSafe(args[1])
    ),
    "isnot": lambda c, args: (
        as_col(args[0]).isNotNull()
        if args[1] is None
        else ~as_col(args[0]).eqNullSafe(args[1])
    ),
    "exists": _b_exists,
    "cast": _b_cast,
    "date_trunc": lambda c, args: F.date_trunc(str(args[0]), as_col(args[1])),
    "extract": _b_extract,
    "floor": lambda c, args: F.floor(as_col(args[0])),
    "round": lambda c, args: F.round(
        as_col(args[0]), int(args[1]) if len(args) > 1 else 0
    ),
    "abs": lambda c, args: F.abs(as_col(args[0])),
    "coalesce": lambda c, args: F.coalesce(*[as_col(a) for a in args]),
    "length": lambda c, args: F.length(as_col(args[0])),
    "lower": lambda c, args: F.lower(as_col(args[0])),
    "upper": lambda c, args: F.upper(as_col(args[0])),
    "true": lambda c, args: F.lit(True),
    "false": lambda c, args: F.lit(False),
    "strftime": lambda c, args: F.date_format(
        as_col(args[1]), _strf_to_spark(str(args[0]))
    ),
    # ranking / offset window functions (used inside (over ...))
    "row_number": lambda c, args: F.row_number(),
    "rank": lambda c, args: F.rank(),
    "dense_rank": lambda c, args: F.dense_rank(),
    "ntile": lambda c, args: F.ntile(int(args[0])),
    "lag": lambda c, args: F.lag(
        as_col(args[0]), int(args[1]) if len(args) > 1 else 1
    ),
    "lead": lambda c, args: F.lead(
        as_col(args[0]), int(args[1]) if len(args) > 1 else 1
    ),
    # epoch-nanos long → timestamp (exact decimal division — double
    # arithmetic would round the microsecond for ns values > 2^53)
    "ns_to_ts": lambda c, args: F.timestamp_micros(
        F.floor(
            as_col(args[0]).cast("decimal(38,0)") / F.lit(1000)
        ).cast("long")
    ),
}

AGGREGATES = {
    "avg": lambda c, args: F.avg(as_col(args[0])),
    "count": lambda c, args: (
        F.count(F.lit(1)) if not args else F.count(as_col(args[0]))
    ),
    "max": lambda c, args: F.max(as_col(args[0])),
    "min": lambda c, args: F.min(as_col(args[0])),
    "sum": lambda c, args: F.sum(as_col(args[0])),
    "bool_and": lambda c, args: F.bool_and(as_col(args[0])),
    "bool_or": lambda c, args: F.bool_or(as_col(args[0])),
    "every": lambda c, args: F.every(as_col(args[0])),
    "count-distinct": lambda c, args: F.count_distinct(
        *[as_col(a) for a in args]
    ),
}


def _passthrough_agg(name):
    return lambda c, args: F.call_function(
        name, *[as_col(a) for a in args]
    )


# Spark-first extension beyond the reference's 8 aggregates: the common
# statistical aggregates route through the SQL function registry. They
# must be REGISTERED heads (not the generic unknown-head passthrough in
# _compile_node) so Node.is_aggregate sees them and the auto-GROUP-BY /
# aggregate-detection walk stays correct.
for _extra in (
    "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
    "var_samp", "median", "mode", "skewness", "kurtosis",
    "percentile", "percentile_approx", "approx_percentile",
    "approx_count_distinct", "corr", "covar_pop", "covar_samp",
    "max_by", "min_by", "any_value", "first_value", "last_value",
    "first", "last", "count_if", "collect_list", "collect_set",
    "array_agg", "listagg", "string_agg", "bit_and", "bit_or",
    "bit_xor", "try_sum", "try_avg", "histogram_numeric",
    "hll_sketch_agg",
):
    AGGREGATES[_extra] = _passthrough_agg(_extra)


def _or_all(conds):
    conds = [as_col(c) for c in conds]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


_STRF_MAP = [
    ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"), ("%H", "HH"),
    ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"), ("%y", "yy"),
]


def _strf_to_spark(fmt):
    for c_fmt, s_fmt in _STRF_MAP:
        fmt = fmt.replace(c_fmt, s_fmt)
    return fmt


def is_aggregate_desc(compiler, desc):
    """True if a field desc like ``(sum x)`` contains an aggregate head."""
    if not desc.startswith("("):
        return False
    node = compiler.parse(desc)
    return isinstance(node, Node) and node.is_aggregate()

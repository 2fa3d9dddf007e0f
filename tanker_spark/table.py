"""Table / Column catalog metadata.

Mirrors the reference data model (``/root/reference/tanker/table.py``):
declared columns, a mandatory natural key, M2O/O2M relation columns, an
implicit surrogate ``id``. The Spark twist: the surrogate id is a
deterministic ``xxhash64`` of the natural-key columns (SURVEY.md §7) so that
id generation and FK resolution are stateless, distributed joins instead of
sequences + caches.
"""

from __future__ import annotations

import json
from collections import defaultdict
from datetime import datetime
from itertools import chain

from pyspark.sql import types as T

from .utils import COLUMN_TYPE, ctx, pandas, to_date, to_datetime

#: tanker type → Spark type (SURVEY.md §1.3)
_SPARK_TYPES = {
    "BIGINT": T.LongType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
    "FLOAT": T.DoubleType(),
    "INTEGER": T.IntegerType(),
    "M2O": T.LongType(),  # fk column holds the remote surrogate id
    "TIMESTAMP": T.TimestampNTZType(),
    "TIMESTAMPTZ": T.TimestampType(),
    "VARCHAR": T.StringType(),
    "JSONB": T.StringType(),
    "BYTEA": T.BinaryType(),
}


def spark_type(base_type: str, array_dim: int = 0):
    st = _SPARK_TYPES[base_type]
    for _ in range(array_dim):
        st = T.ArrayType(st)
    return st


def _nullish(x):
    """pandas.isnull semantics with cheap fast paths: the full
    pandas.isnull costs ~1 µs per SCALAR, which dominated the 100k-row
    write leg's driver time (400k calls/write). str/int/bool can never
    be null-like; float null is exactly NaN; containers are passed
    through (matching the old isinstance exclusion)."""
    if isinstance(x, (str, int)):  # bool is an int subclass
        return False
    if isinstance(x, float):
        return x != x
    if isinstance(x, (list, tuple, dict, bytes)):
        return False
    return pandas is not None and bool(pandas.isnull(x))


_skip = lambda fn: (
    lambda x: None if x is None or _nullish(x) else fn(x)
)


class Column:
    """One declared column: ``name``, tanker ``ctype``, optional default.

    Relation syntax (reference: table.py:15-41): ``m2o other.col`` /
    ``o2m other.fk_col``; arrays via ``[]`` suffix (multi-dim allowed,
    forbidden on relations).
    """

    def __init__(self, name, ctype, default=None):
        if " " in ctype:
            full = ctype
            ctype, self.fk = ctype.split()
            if "." not in self.fk:
                raise ValueError(
                    'Malformed column definition "%s" for %s' % (full, name)
                )
            self.foreign_table, self.foreign_col = self.fk.split(".")
        else:
            self.fk = None
            self.foreign_table = self.foreign_col = None
        self.name = name
        self.default = default
        self.ctype = ctype.upper()
        self.base_type = self.ctype
        self.array_dim = 0
        while self.base_type.endswith("[]"):
            self.base_type = self.base_type[:-2]
            self.array_dim += 1
        if self.array_dim and self.base_type in ("O2M", "M2O"):
            raise ValueError(
                'Array type is not supported on "%s" (for column "%s")'
                % (self.base_type, name)
            )
        if self.base_type not in COLUMN_TYPE:
            raise ValueError(
                "Unexpected type %s for column %s" % (ctype, name)
            )
        self.table = None  # set by Table

    # -- catalog helpers ------------------------------------------------
    def get_foreign_table(self):
        if not self.foreign_table:
            raise ValueError(
                'The "%s" column of "%s" is not a foreign key'
                % (self.name, self.table.name)
            )
        return Table.get(self.foreign_table)

    def spark_type(self, _seen=None):
        if self.ctype == "O2M":
            return None  # virtual, no physical storage
        if self.ctype == "M2O":
            # The fk column physically holds the REFERENCED column's
            # value: the surrogate id (long) in the common ``m2o t.id``
            # case, the natural column's own type otherwise (external
            # tables / natural-column FKs). The reference hardcodes
            # INTEGER DDL here (table.py:70-74) because its FKs always
            # target integer ids.
            if self.foreign_col == "id":
                return T.LongType()
            key = (self.foreign_table, self.foreign_col)
            _seen = _seen or set()
            if key in _seen:
                return T.LongType()  # fk cycle: fall back to id typing
            _seen.add(key)
            try:
                remote = self.get_foreign_table().get_column(
                    self.foreign_col
                )
            except Exception:
                return T.LongType()  # outside a ctx / unknown: id typing
            return remote.spark_type(_seen)
        return spark_type(self.base_type, self.array_dim)

    def spark_field(self):
        st = self.spark_type()
        if st is None:
            return None
        return T.StructField(self.name, st, nullable=True)

    # -- input coercion (reference: table.py:100-178) -------------------
    def _coerce_scalar(self, astype):
        if astype == "TIMESTAMP":
            return _skip(lambda v: to_datetime(v, tz_aware=False))
        if astype == "TIMESTAMPTZ":
            return _skip(lambda v: to_datetime(v, tz_aware=True))
        if astype == "DATE":
            return _skip(to_date)
        if astype == "JSONB":
            return _skip(
                lambda v: v if isinstance(v, (str, bytes)) else json.dumps(v)
            )
        if astype in ("INTEGER", "BIGINT", "M2O"):
            return _skip(int)
        if astype == "FLOAT":
            return _skip(float)
        if astype == "BOOL":
            return _skip(bool)
        if astype == "BYTEA":
            return _skip(lambda v: bytes(v))
        if astype == "VARCHAR":
            return _skip(lambda v: v if isinstance(v, str) else str(v))
        return lambda v: v

    def format(self, values, astype=None, array_dim=None):
        """Sanitize a column of python values for this column's type.

        Returns a list (not a generator — we feed Spark createDataFrame).
        """
        astype = astype or self.base_type
        dim = self.array_dim if array_dim is None else array_dim
        if dim:
            scalar = self._coerce_scalar(astype)

            def conv(arr, d):
                if arr is None:
                    return None
                if d == 1:
                    return [scalar(v) for v in arr]
                return [conv(v, d - 1) for v in arr]

            return [conv(v, dim) for v in values]
        scalar = self._coerce_scalar(astype)
        if hasattr(values, "tolist") and astype not in (
            "TIMESTAMP", "TIMESTAMPTZ", "DATE"
        ):
            # plain numpy arrays → python scalars; temporal arrays are
            # iterated element-wise instead (ndarray[M8[ns]].tolist()
            # yields raw ints, np.datetime64 scalars convert properly)
            values = values.tolist()
        # per-type fast paths: a value already of the declared python
        # type (the overwhelmingly common case) skips the 3-call
        # _skip→_nullish→coerce chain — 400k scalar calls per
        # 100k-row write leg were pure python-call overhead (guide §4:
        # the driver-side boundary). Exact-type checks only: subclasses
        # (bool under int, pd.Timestamp under datetime, str subclasses)
        # fall through to the unchanged slow path, so coercion
        # semantics are bit-identical.
        if astype == "VARCHAR":
            return [v if type(v) is str else scalar(v) for v in values]
        if astype in ("INTEGER", "BIGINT", "M2O"):
            return [v if type(v) is int else scalar(v) for v in values]
        if astype == "FLOAT":
            # NaN (v != v) must coerce to None like pandas.isnull
            return [v if type(v) is float and v == v else scalar(v)
                    for v in values]
        if astype in ("TIMESTAMP", "TIMESTAMPTZ"):
            # to_datetime returns datetime instances unchanged
            return [v if type(v) is datetime else scalar(v)
                    for v in values]
        if astype == "BOOL":
            return [v if type(v) is bool else scalar(v) for v in values]
        return [scalar(v) for v in values]

    def __repr__(self):
        return "<Column %s %s>" % (self.name, self.ctype)


class Table:
    """Declared table: ordered columns + natural key + unique + seeds.

    Reference: table.py:184-286. ``surrogate_id=False`` marks external
    tables (e.g. read-only benchmark parquet) that carry no implicit id;
    their M2O relations must then point at natural columns.
    """

    def __init__(
        self,
        name,
        columns,
        key=None,
        unique=None,
        values=None,
        use_index=None,
        surrogate_id=True,
        partition_by=None,
        zorder_by=None,
    ):
        self.name = name
        self.columns = list(columns)
        self.unique = unique or []
        self.values = values
        self.surrogate_id = surrogate_id
        self.partition_by = partition_by or []
        self.zorder_by = zorder_by or []
        self.use_index = use_index.upper() if use_index else "BTREE"
        if self.use_index not in ("BRIN", "BTREE"):
            raise ValueError(
                'Value "%s" not supported for use-index' % use_index
            )

        # Implicit surrogate id column (reference: table.py:198-199)
        if surrogate_id and "id" not in [c.name for c in self.columns]:
            self.columns.insert(0, Column("id", "BIGINT"))
        self.own_columns = [
            c for c in self.columns if c.name != "id" and c.ctype != "O2M"
        ]
        for col in self.columns:
            col.table = self

        if key is None:
            non_id = [c.name for c in self.columns if c.name != "id"]
            if len(non_id) == 1:
                key = tuple(non_id)
            else:
                raise ValueError("No key defined on %s" % name)
        self.key = [key] if isinstance(key, str) else list(key)
        self._column_dict = {c.name: c for c in self.columns}
        for col in self.key:
            if col not in self._column_dict:
                raise ValueError('Key column "%s" does not exist' % col)

    def __contains__(self, column):
        return column in self._column_dict

    def get_column(self, name):
        try:
            return self._column_dict[name]
        except KeyError:
            raise KeyError(
                'Column "%s" not found in table "%s"' % (name, self.name)
            )

    @classmethod
    def get(cls, table_name):
        return ctx.registry[table_name]

    def __repr__(self):
        return "<Table %s>" % self.name

    # -- schema ---------------------------------------------------------
    def spark_schema(self) -> T.StructType:
        fields = []
        for col in self.columns:
            f = col.spark_field()
            if f is not None:
                fields.append(f)
        return T.StructType(fields)

    def physical_columns(self):
        return [c for c in self.columns if c.ctype != "O2M"]

    def default_fields(self):
        """Default view fields: FK columns expand to the remote key."""
        for col in self.own_columns:
            if col.ctype == "M2O":
                ft = col.get_foreign_table()
                for k in ft.key:
                    yield ".".join((col.name, k))
            else:
                yield col.name

    def link(self, dest):
        """BFS over the relation graph: every M2O/O2M path self→dest.

        Reference: table.py:256-286 (pure-python introspection helper).
        """
        wave = [self]
        paths = defaultdict(list)
        while True:
            new_wave = []
            for tbl in wave:
                visited = set(chain.from_iterable(paths[tbl]))
                for col in tbl.columns:
                    if col.ctype not in ("M2O", "O2M"):
                        continue
                    if col in visited:
                        continue
                    foreign_table = col.get_foreign_table()
                    if paths[tbl]:
                        foreign_paths = [p + [col] for p in paths[tbl]]
                        paths[foreign_table].extend(foreign_paths)
                    else:
                        paths[foreign_table] = [[col]]
                    new_wave.append(foreign_table)
            if not new_wave:
                break
            wave = new_wave
        return sorted(paths[dest], key=len)

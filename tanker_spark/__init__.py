"""tanker_spark — a PySpark-native engine with the tanker query surface.

Public API mirrors the reference (``/root/reference/tanker/__init__.py``):
``connect``, ``create_tables``, ``View``, ``Table``, ``fetch``, ``save``,
``ctx`` — backed by DataFrame plans over versioned Parquet instead of SQL
over SQLite/Postgres.
"""

from .context import (Pool, TankerContext, TankerThread, connect,
                      create_tables, execute, get_spark, register)
from .expression import ExpressionCompiler as Expression
from .table import Column, Table
from .utils import ctx, interleave, logger, paginate, yaml_load, __version__
from .view import Cursor, View, ViewField, fetch, save

__all__ = [
    "Column",
    "Cursor",
    "Expression",
    "Pool",
    "Table",
    "TankerContext",
    "TankerThread",
    "View",
    "ViewField",
    "__version__",
    "connect",
    "create_tables",
    "ctx",
    "execute",
    "fetch",
    "get_spark",
    "interleave",
    "logger",
    "paginate",
    "register",
    "save",
    "yaml_load",
]

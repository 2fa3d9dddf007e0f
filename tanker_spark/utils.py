"""Shared helpers: thread-local context stack, time parsing, yaml.

Semantics modeled on the reference (``/root/reference/tanker/utils.py``),
re-implemented for a Spark-backed engine: no LRU / pagination helpers are
needed (FK resolution is a broadcast join, see ``view.py``).
"""

from __future__ import annotations

import logging
import os
import threading
from datetime import date, datetime

try:
    import pandas
except ImportError:  # pragma: no cover
    pandas = None

__version__ = "0.1.0"

#: Closed set of declared column types (reference: tanker/utils.py:19-32).
COLUMN_TYPE = (
    "BIGINT",
    "BOOL",
    "DATE",
    "FLOAT",
    "INTEGER",
    "M2O",
    "O2M",
    "TIMESTAMP",
    "TIMESTAMPTZ",
    "VARCHAR",
    "JSONB",
    "BYTEA",
)

fmt = "%(levelname)s:%(asctime).19s: %(message)s"
logging.basicConfig(format=fmt)
logger = logging.getLogger("tanker_spark")
_lvl = os.environ.get("TK_LOG_LEVEL", "").upper()
if _lvl in ("CRITICAL", "ERROR", "WARNING", "INFO", "DEBUG", "NOTSET"):
    logger.setLevel(_lvl)


def require_local_fs(path, op):
    """Refuse non-local-filesystem paths for maintenance ops whose
    atomic swap is a POSIX ``os.rename`` double-flip
    (``ann_index_compact``, ``compact_side_table``). On an object
    store (s3://, gs://, abfs://…) directory rename is neither atomic
    nor cheap and local ``open()`` metadata IO does not exist — the
    versioned storage layer (``storage.py``) solves that class with
    copy-then-pointer-flip claim markers; port these ops to that
    scheme before pointing them at dumb storage. Raising loudly here
    turns a silent-corruption risk into a documented contract.

    Returns the path as a plain POSIX path: a ``file://`` URI is
    admitted but STRIPPED to its path component, so the guarded ops'
    ``os.rename``/``open`` calls never see the raw URI string (which
    they'd fail on with a confusing FileNotFoundError). Callers must
    use the return value."""
    path = str(path)
    if path.startswith("file://"):
        rest = path[len("file://"):]
        # file:///abs/path → netloc empty, keep the leading slash;
        # file://host/path with a real host is not a local contract.
        if rest.startswith("/"):
            return rest
        raise ValueError(
            "%s requires a local path; file:// URI with a non-empty "
            "host is not one (got %r)" % (op, path)
        )
    if "://" in path:
        raise ValueError(
            "%s swaps directories with os.rename and reads metadata "
            "with local open() — a single POSIX filesystem is "
            "required (got %r). On object stores, rebuild instead, "
            "or use the versioned storage layer's pointer-flip "
            "scheme." % (op, path)
        )
    return path


def yaml_load(stream):
    import yaml

    return yaml.safe_load(stream)


#: Accepted input string formats per temporal type
#: (reference: tanker/utils.py:94-98).
TIME_FMT = {
    "TIMESTAMP": ["%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S"],
    "TIMESTAMPTZ": ["%Y-%m-%d %H:%M:%S%z", "%Y-%m-%dT%H:%M:%S%z"],
    "DATE": ["%Y-%m-%d"],
}


def strptime(val: str, kind: str):
    """Parse a string into datetime/date following the closed format list."""
    for f in TIME_FMT[kind]:
        try:
            res = datetime.strptime(val, f)
        except ValueError:
            continue
        return res.date() if kind == "DATE" else res
    raise ValueError('Unable to parse "%s" as %s' % (val, kind.lower()))


def to_datetime(value, tz_aware: bool):
    """Coerce arbitrary input (datetime/date/np.datetime64/str) to datetime."""
    if value is None:
        return None
    if isinstance(value, datetime):
        return value
    if hasattr(value, "timetuple"):  # date
        return datetime(*value.timetuple()[:6])
    if hasattr(value, "tolist"):
        # numpy datetime64: tolist() → datetime for coarse units, but a
        # raw ns-since-epoch int for the ns unit
        raw = value.tolist()
        if raw is None:
            return None
        from datetime import timedelta, timezone

        if isinstance(raw, datetime):
            out = raw
        elif isinstance(raw, date):
            out = datetime(*raw.timetuple()[:6])
        else:
            out = datetime(1970, 1, 1) + timedelta(seconds=raw / 1e9)
        if tz_aware and out.tzinfo is None:
            out = out.replace(tzinfo=timezone.utc)
        return out
    if isinstance(value, (str, bytes)):
        if isinstance(value, bytes):
            value = value.decode()
        return strptime(value, "TIMESTAMPTZ" if tz_aware else "TIMESTAMP")
    raise ValueError('Unexpected value "%s" for timestamp' % (value,))


def interleave(value, items):
    """Like ``str.join`` but for iterables, flattening list/tuple items
    (reference utils.py:60-83): yields the elements of ``items`` with
    ``value`` between consecutive items; an item that is itself a
    list/tuple is chained element-wise."""
    if not items:
        return
    looping = False
    for head in items:
        if looping:
            yield value
        else:
            looping = True
        if isinstance(head, (list, tuple)):
            for i in head:
                yield i
        else:
            yield head


def paginate(iterators, size=1000):
    """Zip parallel column iterators into fixed-size pages of row
    tuples (reference utils.py:85-92, page size there defaults to its
    LRU constant — a driver-side convenience for feeding chunked
    writes; the distributed ingest paths never use it)."""
    from itertools import islice

    rows = zip(*iterators)
    while True:
        page = list(islice(rows, size))
        if not page:
            break
        yield page


def to_date(value):
    if value is None:
        return None
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    if hasattr(value, "tolist"):
        raw = value.tolist()
        if raw is None:
            return None
        from datetime import timedelta

        if isinstance(raw, datetime):
            return raw.date()
        if isinstance(raw, date):
            return raw
        return (datetime(1970, 1, 1) + timedelta(seconds=raw / 1e9)).date()
    if isinstance(value, (str, bytes)):
        if isinstance(value, bytes):
            value = value.decode()
        return strptime(value, "DATE")
    raise ValueError('Unexpected value "%s" for date' % (value,))


class ContextStack:
    """Thread-local stack of engine contexts (reference: utils.py:156-186)."""

    def __init__(self):
        self._local = threading.local()

    def _stack(self):
        if not hasattr(self._local, "contexts"):
            self._local.contexts = []
        return self._local.contexts

    def reset(self, contexts):
        self._local.contexts = contexts

    def push(self, new_ctx):
        self._stack().append(new_ctx)
        new_ctx.enter()
        return new_ctx

    def pop(self, exc=None):
        popped = self._stack().pop()
        popped.leave(exc)

    def active_context(self):
        stack = self._stack()
        if not stack:
            raise RuntimeError(
                "No active tanker_spark context — use `with connect(cfg):`"
            )
        return stack[-1]


class ShallowContext:
    """Proxy always pointing at the innermost active context."""

    def __getattr__(self, name):
        return getattr(CTX_STACK.active_context(), name)


CTX_STACK = ContextStack()
ctx = ShallowContext()
